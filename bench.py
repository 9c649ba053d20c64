"""Headline benchmark: H2O/cc-pVTZ CCSD(T), spin-orbital path (58 basis
functions, nocc=10, nvirt=106 spin orbitals) — the reference's flagship
workload (sample_data/h2o-cc-pvtz/2.00_104.45, els_cpu.out).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is the speedup over the reference's multithreaded-CPU
CCSD+(T) wall (47.33 s + 123.00 s = 170.33 s, BASELINE.md); > 1 is faster.

If the cc-pVTZ ERI file is unavailable (the committed one is a missing
large blob) and the native integral engine hasn't generated it yet, falls
back to the same pipeline stages on random tensors of identical shapes so
the kernel timing is still representative.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
FIXTURE = Path(
    os.environ.get(
        "AFESP_BENCH_FIXTURE",
        "/root/reference/sample_data/h2o-cc-pvtz/2.00_104.45",
    )
)
GENERATED_ERI = REPO / "data" / "h2o-cc-pvtz" / "eri.dat"

BASELINE_CCSD_T_WALL = 47.33 + 123.00  # s, els_cpu.out (OpenMP multithread)


def _force(x):
    """Force completion via host transfer (block_until_ready is unreliable
    under the axon tunnel)."""
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def bench_real(workdir: Path):
    import io
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat runs skip the ~60s XLA compiles
    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from afesp_tpu import cachemeta

    cachemeta.check(cache_dir)

    from afesp_tpu import warmup
    from afesp_tpu.config import read_els_in
    from afesp_tpu.flops import (
        MEASURED_BF16,
        MEASURED_F32,
        PEAK_BF16,
        spinorb_ccsd_iteration_flops,
        spinorb_triples_flops,
    )
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb
    from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb

    t_read0 = time.perf_counter()
    cfg = read_els_in(workdir)
    cfg.scf_read_guess = False
    cfg.scf_write_guess = False
    # hybrid split-f32 vvvv: ~25% faster iterations, converged energy
    # within ~2e-9 Ha of f64 (the accuracy gate below still enforces the
    # 1e-8 contract against the reference run)
    cfg.ccsd_precision = "hybrid"
    sys_, ints = dat.read_integrals(workdir, cfg.restricted)
    warmup.start(sys_, cfg)  # compile-ahead overlaps the HF/MP2 stages
    rep = Reporter(stream=io.StringIO())
    read_wall = time.perf_counter() - t_read0
    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, workdir)
    hf_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir)
    mp2_cold = time.perf_counter() - t0

    def run_stage():
        t0 = time.perf_counter()
        cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep)
        t1 = time.perf_counter()
        e_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep)
        t2 = time.perf_counter()
        return cc, e_t, t1 - t0, t2 - t1

    # pass 1 pays any compile/executable-load not hidden by the warmup
    # thread; pass 2 is the steady state the hardware sustains (the
    # Fortran baseline likewise excludes its compile time).
    cc, e_t, ccsd_cold, t_cold = run_stage()
    # steady-state HF/MP2: the first-pass walls above absorb the warmup
    # thread's compile contention on this 1-core host (measured: mp2_cold
    # 13-121 s vs ~1 s quiet) — re-measure with the warmup drained
    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, workdir)
    hf_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir)
    mp2_wall = time.perf_counter() - t0
    cc, e_t, ccsd_wall, t_wall = run_stage()
    wall = ccsd_wall + t_wall

    # alternate-kernel comparison walls (each variant warmed once before
    # its timed pass — a cold pass times XLA compiles, not the kernel).
    # The fully-fused VMEM kernel is the TPU default (hardware-validated
    # BENCH r2: 52.5 ms vs 79.8 ms "pallas" at identical 1e-8 accuracy),
    # so t_wall above already measures it; these keep the regression
    # comparison honest every run.
    alt = {}
    for prec in ("pallas", "hybrid"):
        try:
            do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep, precision=prec)
            t0 = time.perf_counter()
            e_alt = do_ccsd_t_spinorb(
                sys_, cc, cfg, hf.levels, rep, precision=prec
            )
            alt[f"t_wall_{prec}"] = time.perf_counter() - t0
            alt[f"{prec}_ok"] = bool(abs(e_alt - e_t) < 1e-8)
        except Exception:
            alt[f"t_wall_{prec}"] = None
            alt[f"{prec}_ok"] = None

    # tunnel readback round-trip floor: every synced stage wall above
    # includes one of these (~29 ms measured), so it is ALSO the floor
    # of any per-call stage metric through this tunnel
    x_t = jnp.ones((8, 128))
    tiny = jax.jit(lambda x: (x * 2.0).sum())
    _force(tiny(x_t))
    t0 = time.perf_counter()
    for _ in range(5):
        _force(tiny(x_t))
    rtt = (time.perf_counter() - t0) / 5

    # pipelined triples throughput: k calls enqueued back-to-back, one
    # sync — the device-side stage time a directly-attached TPU would
    # see (t_wall above = RTT + this)
    from afesp_tpu.methods.triples_spinorb import (
        _strict_plan_device,
        _triples_total_strict,
    )
    from afesp_tpu.ops.spin import spinorb_levels

    lv = spinorb_levels(jnp.asarray(hf.levels), sys_.nel // 2)
    no, nv_so = sys_.nocc, sys_.nvirt
    iid, jjd, kkd, clen = _strict_plan_device(no, nv_so, "fused")
    targs = (
        jnp.asarray(cc.t1), jnp.asarray(cc.t2),
        cc.slices.vovv, cc.slices.ovoo, cc.slices.oovv,
        lv[:no], lv[no:],
    )
    r = _triples_total_strict(*targs, iid, jjd, kkd, clen=clen, precision="fused")
    _force(r)
    t0 = time.perf_counter()
    k = 5
    for _ in range(k):
        r = _triples_total_strict(
            *targs, iid, jjd, kkd, clen=clen, precision="fused"
        )
    _force(r)
    t_pipelined = (time.perf_counter() - t0) / k

    # ---- one-sync chained stage (round-4 directive #5): init -> solve
    # -> triples enqueued back-to-back as device work with NO intermediate
    # host sync; ONE packed readback carries every scalar the host needs
    # (solve summary + histories + the triples energy).  This is the wall
    # a user sees from "CCSD starts" to "CCSD(T) energy on host" — the
    # separately-synced ccsd_wall/t_wall above keep the per-stage
    # attribution (each pays its own ~29 ms tunnel RTT).
    from afesp_tpu.methods.ccsd_spinorb import (
        get_spinorb_solver,
        spinorb_cc_init,
    )
    from afesp_tpu.ops.cc_step import init_cc_state, pack_solve_summary

    solver = get_spinorb_solver(paper_foo=False, vvvv_split=True)
    nerr, maxiter = cfg.ccsd_diis_n_errmat, cfg.ccsd_maxiter
    tol_e, tol_t = jnp.float64(cfg.ccsd_e_tol), jnp.float64(cfg.ccsd_t_tol)
    no_sp = sys_.nel // 2

    lv_spatial = jnp.asarray(hf.levels)

    def run_chained():
        import numpy as np

        t0 = time.perf_counter()
        v, D_ia, D_ijab, t1_0, t2_0, e0, r0, _sc = spinorb_cc_init(
            mp2.eri_mo, lv_spatial, nocc_spatial=no_sp,
            selfcheck=cfg.spinorb_selfcheck,
        )
        st = init_cc_state(t1_0, t2_0, nerr)
        st, n_iter, done, hist_e, hist_rms = solver(
            st, v, D_ia, D_ijab, v.oovv, e0, tol_e, tol_t,
            nerr=nerr, maxiter=maxiter,
        )
        e_t_dev = _triples_total_strict(
            st.t1_raw, st.t2_raw, v.vovv, v.ovoo, v.oovv,
            lv[:no], lv[no:], iid, jjd, kkd, clen=clen, precision="fused",
        )
        vec = np.asarray(
            pack_solve_summary(
                hist_e, hist_rms, (e0, r0, n_iter, done, e_t_dev),
                st.t1_raw, st.t1,
            )
        )
        wall = time.perf_counter() - t0
        it = int(vec[2])
        return wall, float(vec[7 + it - 1]), float(vec[4]), it, bool(vec[3])

    run_chained()  # warm any cache-state differences (none expected)
    chain_wall, chain_e_ccsd, chain_e_t, chain_it, chain_done = run_chained()
    # the raw strict kernel returns E(T) alone; do_ccsd_t_spinorb returns
    # e_ccsd + E(T) — compare like with like
    chain_ok = (
        chain_done
        and abs(chain_e_ccsd - cc.e_ccsd) < 1e-10
        and abs((chain_e_ccsd + chain_e_t) - e_t) < 1e-10
        and chain_it == cc.iterations
    )

    # accuracy gate vs the reference run (els_cpu.out): 1e-8 Ha contract
    ok_ccsd = abs(cc.e_ccsd - -0.399789132814) < 1e-8
    ok_t = abs(e_t - -0.434032756) < 1e-8

    # whole-pipeline headline (BASELINE target: "CCSD(T)/cc-pVTZ < 10 s"
    # is a CALCULATION, not a stage): RHF -> (T), steady and first-pass.
    # The reference bar: els_cpu.out total 171.89 s multithreaded.
    total_steady = hf_wall + mp2_wall + ccsd_wall + t_wall
    total_first = read_wall + hf_cold + mp2_cold + ccsd_cold + t_cold
    ok_total = total_steady < 10.0

    o, v = sys_.nocc, sys_.nvirt  # spin-orbital counts
    fl_ccsd = (
        spinorb_ccsd_iteration_flops(o, v, precision=cfg.ccsd_precision)
        * cc.iterations
    )
    fl_t = spinorb_triples_flops(o, v)          # algorithmic full-cube
    fl_t_x = spinorb_triples_flops(o, v, strict=True)  # as executed
    # headline = the one-sync chained CCSD->(T) wall when it reproduces
    # the per-stage results exactly (it is the same device work minus the
    # intermediate tunnel syncs); per-stage walls stay as attribution
    if chain_ok:
        wall = chain_wall
    return wall, {
        "chain_wall": chain_wall,
        "chain_ok": chain_ok,
        "chain_e_ccsd": chain_e_ccsd,
        "chain_e_t": chain_e_t,
        "chain_iters": chain_it,
        "e_ccsd": cc.e_ccsd,
        "e_ccsd_t": e_t,
        "hf_wall": hf_wall,
        "mp2_wall": mp2_wall,
        "hf_wall_first": hf_cold,
        "mp2_wall_first": mp2_cold,
        "ccsd_wall": ccsd_wall,
        "t_wall": t_wall,
        "t_wall_pipelined": t_pipelined,
        "tunnel_rtt": rtt,
        **alt,
        "total_wall": total_steady,
        "total_wall_first": total_first,
        # round-4 directive #4: with the warmup foreground gate the first
        # pass should stay bounded even on a loaded server; reported as
        # its own gate (not folded into "ok" — the decayed-server floor
        # is environment, not code; PERF.md records the measured floor)
        "ok_first_lt_60s": total_first < 60.0,
        "cold_wall": ccsd_cold + t_cold,
        "ccsd_iters": cc.iterations,
        "ccsd_tflops": fl_ccsd / ccsd_wall / 1e12,
        # effective throughput vs the algorithmic full-cube count (the
        # strict-triangle grid executes ~8.3x fewer FLOPs; this is the
        # apples-to-apples number against the reference's loop nest)
        "t_tflops_effective": fl_t / t_wall / 1e12,
        "t_tflops_executed": fl_t_x / t_wall / 1e12,
        "mfu_vs_bf16_peak": (fl_ccsd + fl_t_x) / wall / PEAK_BF16,
        # honest utilization: the CCSD iterations run as integer-digit
        # bf16 GEMMs, so their executed FLOPs are reported against the
        # MEASURED bf16 ceiling they actually run on (119 TF/s on this
        # chip); the triples panels run f32, reported against the f32
        # ceiling.  (r2's "util_vs_f64_ceiling" compared digit GEMMs to
        # the emulated-f64 ceiling they replaced and read >1 — honest in
        # context, misleading as a dashboard number.)
        "ccsd_digit_util_vs_bf16": fl_ccsd / ccsd_wall / MEASURED_BF16,
        "t_util_vs_f32_ceiling": fl_t_x / t_wall / MEASURED_F32,
        "ok": ok_ccsd and ok_t and ok_total,
        "ok_total_lt_10s": ok_total,
    }


def bench_synthetic():
    """Same CCSD-iteration + triples kernels at pVTZ spin-orbital shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from __graft_entry__ import _random_spin_problem
    from afesp_tpu.methods.ccsd_spinorb import ccsd_spinorb_iteration
    from afesp_tpu.methods.triples_spinorb import _triples_islice

    no, nv = 10, 106
    t1, t2, slices, D_ia, D_ijab, e_o, e_v = _random_spin_problem(no=no, nv=nv)
    e_o, e_v = jnp.asarray(e_o), jnp.asarray(e_v)

    # CCSD iteration x 19 (the reference took 19 iterations)
    t1n, t2n = ccsd_spinorb_iteration(t1, t2, slices, D_ia, D_ijab)
    _force(t1n)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(19):
        t1n, t2n = ccsd_spinorb_iteration(t1n, t2n, slices, D_ia, D_ijab)
    _force(t1n)
    ccsd_wall = time.perf_counter() - t0

    # triples over the full o^3 grid, per-(i, j-slab) static slices
    jlen = max(1, min(no, int(10e9 / (26 * 8 * no * nv**3) + 1)))
    args = (t1, t2, slices.vovv, slices.ovoo, slices.oovv, e_o, e_v)
    _force(_triples_islice(0, 0, *args, jlen=jlen, precision="hybrid"))  # compile
    t0 = time.perf_counter()
    tot = 0.0
    for i0 in range(no):
        for j0 in range(0, no, jlen):
            jl = min(jlen, no - j0)
            tot += _force(_triples_islice(i0, j0, *args, jlen=jl, precision="hybrid"))
    t_wall = time.perf_counter() - t0
    return ccsd_wall + t_wall, {"ccsd_wall": ccsd_wall, "t_wall": t_wall, "ok": None}


def main():
    mode = "real"
    workdir = None
    if (FIXTURE / "eri.dat").exists():
        workdir = FIXTURE
    elif GENERATED_ERI.exists():
        # stage generated eri.dat next to the committed s/t/v/geom files
        import shutil, tempfile

        workdir = Path(tempfile.mkdtemp())
        for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "els.in"):
            shutil.copy(FIXTURE / f, workdir / f)
        shutil.copy(GENERATED_ERI, workdir / "eri.dat")
    if workdir is not None:
        wall, extra = bench_real(workdir)
    else:
        mode = "synthetic"
        wall, extra = bench_synthetic()

    print(
        json.dumps(
            {
                "metric": f"h2o_ccpvtz_ccsd_t_wall_{mode}",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_CCSD_T_WALL / wall, 2),
                **{k: (round(v, 9) if isinstance(v, float) else v) for k, v in extra.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
