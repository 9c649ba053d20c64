"""XL-workload benchmark: cc-pVTZ water trimer (174 basis functions,
30 electrons, nvirt=159), CR-CCSD(T)_spatial — past the reference's hard
size cap (integrals.f90:10-21, bignum=5000 -> ~99 bf) AND past this
build's own fused-kernel cliff (nvirt > 128), so it exercises the
full streaming tier end to end on real hardware:

  packed-resident HF (gather-digitized J/K consts), sliced MO transform
  (no dense n^4 tensor ever), digit-limb v_vvvv CCSD solve, the CR
  chain's v_vvvv contraction taken straight from the digit limbs (round
  4: no f32 reconstruction — v_vvvv never exists dense at this tier),
  and the chunked "pallas" triples tier with pick_spatial_jlen at the
  sizes it exists for.

Integrals come from the native McMurchie-Davidson engine
(tools/make_trimer.py writes data/h2o-trimer-cc-pvtz/, eri.npy packed
binary format).  Prints ONE JSON line with walls, energies and
self-consistency checks.  Not the driver headline — run manually.
"""

import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
FIXTURE = REPO / "data" / "h2o-trimer-cc-pvtz"


def main():
    if not (FIXTURE / "eri.npy").exists():
        print(
            json.dumps(
                {
                    "metric": "h2o_trimer_ccpvtz_crccsd_t",
                    "value": None,
                    "unit": "s",
                    "error": "integrals not generated (run tools/make_trimer.py)",
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

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial

    # establish the device session outside any timed stage (tunnel
    # handshake is environment cost, seconds to minutes load-dependent)
    import jax.numpy as jnp
    import numpy as np

    float(np.asarray(jnp.zeros(8)[0]))

    t_all = time.perf_counter()
    cfg = read_els_in(FIXTURE)
    sys_, ints = dat.read_integrals(FIXTURE, cfg.restricted)
    rep = Reporter(stream=io.StringIO())

    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, FIXTURE)
    hf_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, FIXTURE)
    mp2_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    cc = do_ccsd_spatial(
        sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE,
        slices=mp2.slices, vvvv_B=mp2.vvvv_B,
    )
    ccsd_wall = time.perf_counter() - t0
    # steady-state repeat (first solve pays lowering + server program
    # load; the Fortran baseline's walls likewise exclude compilation).
    # Free the first result FIRST: its precomputed CR v_vvvv term
    # (o*v^3 f64) must not sit in HBM twice during the second solve.
    del cc
    t0 = time.perf_counter()
    cc = do_ccsd_spatial(
        sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE,
        slices=mp2.slices, vvvv_B=mp2.vvvv_B,
    )
    ccsd_wall_warm = time.perf_counter() - t0
    # the digit limbs are dead once the solve returns (the f32 copy for
    # the CR chain was reconstructed inside) — free 7.7 GB before triples
    mp2.vvvv_B = None
    mp2.slices = None

    t0 = time.perf_counter()
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    t_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    t_wall_warm = time.perf_counter() - t0

    e_hf_tot = hf.e_hf + ints.e_nuc
    # physical self-consistency: three bound waters near equilibrium.
    # PLUS the independent host-f64 oracle (tools/host_oracle.py,
    # round-4 directive #3) at the 1e-8 contract — the reference cannot
    # check this size at all (bignum cap ~99 bf, integrals.f90:10-21).
    oracle_path = FIXTURE / "oracle.json"
    oracle = (
        json.loads(oracle_path.read_text()) if oracle_path.exists() else None
    )
    checks = {
        "hf_converged": hf.converged,
        "ccsd_converged": cc.converged,
        "hf_total_sane": -229.5 < e_hf_tot < -227.5,
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

    o, v_ = sys_.nocc, sys_.nvirt
    fl_t = 2.0 * 12 * o**3 * v_**3 * (v_ + o) * 2
    # MXU-utilization dashboard (round-4 directive #6): the r5 tiled
    # Pallas tier executes the SORTED-triple grid (strict=True); the
    # hybrid fallback is the full grid
    from afesp_tpu.flops import (
        MEASURED_BF16,
        MEASURED_F32,
        spatial_ccsd_iteration_flops,
        spatial_triples_flops,
    )

    fl_ccsd_x = spatial_ccsd_iteration_flops(o, v_) * cc.iterations
    fl_t_x = spatial_triples_flops(
        o, v_, doing_CR=True, strict=tr.precision_used == "tiled"
    )
    print(
        json.dumps(
            {
                "metric": "h2o_trimer_ccpvtz_crccsd_t_wall",
                "value": round(ccsd_wall_warm + t_wall_warm, 3),
                "unit": "s",
                "nbasis": sys_.nbasis,
                "nvirt": v_,
                "hf_wall": round(hf_wall, 3),
                "mp2_wall": round(mp2_wall, 3),
                "ccsd_wall": round(ccsd_wall, 3),
                "ccsd_wall_warm": round(ccsd_wall_warm, 3),
                "t_wall": round(t_wall, 3),
                "t_wall_warm": round(t_wall_warm, 3),
                "total_wall": round(time.perf_counter() - t_all, 3),
                "ccsd_iters": cc.iterations,
                "t_precision": tr.precision_used,
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
                    fl_t_x / t_wall_warm / MEASURED_F32, 6
                ),
                "ok": all(checks.values()),
                **{f"check_{k}": bool(x) for k, x in checks.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
