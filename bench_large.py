"""Large-workload benchmark: cc-pVTZ water dimer (116 basis functions,
20 electrons), CR-CCSD(T)_spatial — the >=100-bf scaling run the 58-bf
reference fixtures cannot provide.

Integrals come from the native McMurchie-Davidson engine
(tools/make_dimer.py writes data/h2o-dimer-cc-pvtz/); this exercises the
TPU Fock path (nbasis >= 100), the panelized spatial triples, and makes
the MFU numbers meaningful at a size where the MXU is actually loaded.

Prints ONE JSON line with walls, energies, achieved TFLOP/s and
self-consistency checks.  Not the driver headline (that is bench.py) —
run manually or via `python bench_large.py`.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
FIXTURE = REPO / "data" / "h2o-dimer-cc-pvtz"


def main():
    if not ((FIXTURE / "eri.dat").exists() or (FIXTURE / "eri.npy").exists()):
        print(
            json.dumps(
                {
                    "metric": "h2o_dimer_ccpvtz_crccsd_t",
                    "value": None,
                    "unit": "s",
                    "error": "integrals not generated (run tools/make_dimer.py)",
                }
            )
        )
        return

    import io

    import jax

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from afesp_tpu import cachemeta

    cachemeta.check(cache_dir)

    from afesp_tpu import warmup
    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
    from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial

    # Establish the device session BEFORE any timed section: the axon
    # tunnel's first device op in a process pays a handshake measured
    # anywhere from seconds to ~9 minutes (load-dependent) — environment
    # cost, not algorithm cost, so it must not land in a stage wall.
    import jax.numpy as jnp
    import numpy as np

    float(np.asarray(jnp.zeros(8)[0]))

    t_all = time.perf_counter()
    cfg = read_els_in(FIXTURE)
    sys_, ints = dat.read_integrals(FIXTURE, cfg.restricted)
    warmup.start(sys_, cfg)
    rep = Reporter(stream=io.StringIO())

    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, FIXTURE)
    hf_wall_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, FIXTURE)
    mp2_wall_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    cc = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE)
    ccsd_wall = time.perf_counter() - t0
    # steady-state repeat: the first solve pays per-process lowering +
    # the server-side program load (12-200 s, tunnel-state-dependent);
    # the Fortran baseline's walls likewise exclude compilation
    t0 = time.perf_counter()
    cc = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE)
    ccsd_wall_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    t_wall = time.perf_counter() - t0
    # steady-state repeat: the first (T) call pays XLA compile /
    # executable-load for the triples program; the Fortran baseline's
    # walls likewise exclude compilation
    t0 = time.perf_counter()
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    t_wall_warm = time.perf_counter() - t0

    # steady-state HF/MP2: the first-pass walls above absorb the one-time
    # server-side program loads (measured: prelude load 13.8 s vs 1.3 s
    # steady HF) plus any warmup-thread contention on this 1-core host —
    # re-measure with everything resident, matching the Fortran baseline
    # which has no per-process load at all
    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, FIXTURE)
    hf_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, FIXTURE)
    mp2_wall = time.perf_counter() - t0

    # sorted-triples fused kernel: timed + gated here so every dimer
    # bench hardware-validates it (default flips once recorded ok)
    t_wall_fused = fused_ok = None
    try:
        do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep, precision="fused")
        t0 = time.perf_counter()
        trf = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep, precision="fused")
        if trf.precision_used == "fused":  # a VMEM fallback is not "fused"
            t_wall_fused = time.perf_counter() - t0
            fused_ok = bool(abs(trf.e_crccsd_tt - tr.e_crccsd_tt) < 1e-8)
    except Exception:
        pass

    e_hf_tot = hf.e_hf + ints.e_nuc
    # physical self-consistency: bound closed-shell dimer near its
    # equilibrium — HF total in a sane window, corr energies negative and
    # ordered, CR denominators > 1, T1 diagnostic single-reference-ish.
    # PLUS the independent host-f64 oracle (tools/host_oracle.py,
    # round-4 directive #3): the TPU HF/MP2 must land on a number this
    # package's device code never touched, at the 1e-8 contract.
    oracle_path = FIXTURE / "oracle.json"
    oracle = (
        json.loads(oracle_path.read_text()) if oracle_path.exists() else None
    )
    checks = {
        "hf_converged": hf.converged,
        "ccsd_converged": cc.converged,
        "hf_total_sane": -152.5 < e_hf_tot < -151.5,
        "oracle_e_hf": bool(
            oracle and abs(e_hf_tot - oracle["e_hf_total"]) < 1e-8
        ),
        "oracle_e_mp2": bool(
            oracle and abs(mp2.e_mp2 - oracle["e_mp2_corr"]) < 1e-8
        ),
        "corr_ordered": tr.e_ccsd_t < cc.e_ccsd < mp2.e_mp2 * 0.7 < 0,
        "denominators_gt_1": tr.D_T > 1.0 and tr.D_TT > 1.0,
        "t1_single_ref": cc.t1_diagnostic < 0.02,
        "cr_between": tr.e_crccsd_tt > tr.e_ccsd_tt,
    }

    o, v_ = sys_.nocc, sys_.nvirt  # spatial counts
    # triples GEMM flops (12 terms x (t3_D, m3) + z3/y smaller)
    fl_t = 2.0 * 12 * o**3 * v_**3 * (v_ + o) * 2
    # MXU-utilization dashboard (round-4 directive #6): executed FLOPs
    # against the ceilings the kernels actually run on — digit-GEMM CCSD
    # vs the measured bf16 rate, f32 triples panels vs the f32 rate
    from afesp_tpu.flops import (
        MEASURED_BF16,
        MEASURED_F32,
        spatial_ccsd_iteration_flops,
        spatial_triples_flops,
    )

    fl_ccsd_x = spatial_ccsd_iteration_flops(o, v_) * cc.iterations
    fl_t_strict = spatial_triples_flops(o, v_, doing_CR=True, strict=True)
    t_best = t_wall_fused if t_wall_fused else t_wall_warm
    print(
        json.dumps(
            {
                "metric": "h2o_dimer_ccpvtz_crccsd_t_wall",
                "value": round(ccsd_wall_warm + t_wall_warm, 3),
                "unit": "s",
                "nbasis": sys_.nbasis,
                "hf_wall": round(hf_wall, 3),
                "mp2_wall": round(mp2_wall, 3),
                "hf_wall_first": round(hf_wall_first, 3),
                "mp2_wall_first": round(mp2_wall_first, 3),
                "ccsd_wall": round(ccsd_wall, 3),
                "ccsd_wall_warm": round(ccsd_wall_warm, 3),
                "t_wall": round(t_wall, 3),
                "t_wall_warm": round(t_wall_warm, 3),
                "t_wall_fused": (
                    None if t_wall_fused is None else round(t_wall_fused, 3)
                ),
                "fused_ok": fused_ok,
                "t_precision": tr.precision_used,
                "total_wall": round(time.perf_counter() - t_all, 3),
                "total_wall_steady": round(
                    hf_wall + mp2_wall + ccsd_wall_warm + t_wall_warm, 3
                ),
                "ccsd_iters": cc.iterations,
                "e_hf": round(e_hf_tot, 10),
                "e_mp2_corr": round(mp2.e_mp2, 10),
                "e_ccsd_corr": round(cc.e_ccsd, 10),
                "e_crccsd_tt": round(tr.e_crccsd_tt, 10),
                "D_T": round(tr.D_T, 10),
                "D_TT": round(tr.D_TT, 10),
                "t1_diag": round(cc.t1_diagnostic, 8),
                "t_tflops": round(fl_t / t_wall_warm / 1e12, 3),
                "ccsd_digit_util_vs_bf16": round(
                    fl_ccsd_x / ccsd_wall_warm / MEASURED_BF16, 6
                ),
                "t_util_vs_f32_ceiling": round(
                    fl_t_strict / t_best / MEASURED_F32, 6
                ),
                # round-4 directive #2 gate (reported, not folded into the
                # physical "ok"): warm HF must be single-digit seconds
                "ok_hf_lt_8s": bool(hf_wall < 8.0),
                "ok": all(checks.values()),
                **{f"check_{k}": bool(x) for k, x in checks.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
