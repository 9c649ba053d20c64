"""AOT compile-probe for the streaming-tier CCSD solve at trimer shapes.

The 174-bf ext whole-solve is the one program whose HBM reservation
decides whether bench_xl.py fits one 16 GB v5e (r4 first attempt: OOM,
"Used 18.54G of 15.75G").  This tool lowers + compiles it against the
real TPU backend from ShapeDtypeStructs only — no fixture read, no
transform, no device buffers — so a memory-layout change can be
validated in ~2 min instead of a ~35 min pipeline re-run.

Usage:  python tools/compile_probe_ext.py [nbasis [nel]]   # default 174 30
Prints one JSON line {ok, wall, nbasis, ...}; on OOM the XLA message with
the allocation table goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 174
    nel = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.methods.ccsd_spatial import (
        Slices,
        ccsd_spatial_solver_ext,
        spatial_cc_init_slices,
    )
    from afesp_tpu.ops.cc_step import init_cc_state

    nocc = nel // 2
    nv = n - nocc
    f64 = jnp.float64
    sds = lambda *shape: jax.ShapeDtypeStruct(shape, f64)

    v_s = Slices(
        v_oovv=sds(nocc, nocc, nv, nv),
        v_ovov=sds(nocc, nv, nocc, nv),
        v_vvov=sds(nv, nv, nocc, nv),
        v_oovo=sds(nocc, nocc, nv, nocc),
        v_oooo=sds(nocc, nocc, nocc, nocc),
        v_vvvv=None,
    )
    # vvvv_B: prechunk_B_chunkscaled geometry for K = nv^2 at L=5
    K = nv * nv
    kc = max(d for d in range(1, min(K, 512) + 1) if K % d == 0)
    nc = K // kc
    vvvv_B = (
        [jax.ShapeDtypeStruct((nc, kc, K), jnp.bfloat16) for _ in range(5)],
        sds(nc, 1, K),
    )
    lv_s = sds(n)
    # match the trimer fixture's els.in (the production signature)
    nerr, maxiter = 6, 200

    t0 = time.perf_counter()
    D_ia_s, D_ijab_s, t1_s, t2_s, e0_s, _ = jax.eval_shape(
        partial(spatial_cc_init_slices, nocc=nocc), v_s, lv_s
    )
    state_s = jax.eval_shape(partial(init_cc_state, n_errmat=nerr), t1_s, t2_s)
    sc = sds()
    lowered = ccsd_spatial_solver_ext.lower(
        state_s, v_s, D_ia_s, D_ijab_s, v_s.v_oovv, e0_s, sc, sc, vvvv_B,
        nerr=nerr, maxiter=maxiter,
    )
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        compiled = lowered.compile()
        wall = time.perf_counter() - t0
        mem = None
        try:
            ma = compiled.memory_analysis()
            mem = {
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                "out_gb": round(ma.output_size_in_bytes / 2**30, 2),
                "alias_gb": round(ma.alias_size_in_bytes / 2**30, 2),
            }
        except Exception:
            pass
        print(json.dumps({
            "ok": True, "nbasis": n, "nvirt": nv,
            "lower_wall": round(t_lower, 1), "compile_wall": round(wall, 1),
            "mem": mem,
        }))
    except Exception as e:
        msg = str(e)
        print(msg[:3000], file=sys.stderr)
        print("...[elided]...", file=sys.stderr)
        print(msg[-9000:], file=sys.stderr)
        print(json.dumps({
            "ok": False, "nbasis": n, "nvirt": nv,
            "lower_wall": round(t_lower, 1),
            "compile_wall": round(time.perf_counter() - t0, 1),
            "error": str(e)[:300],
        }))


if __name__ == "__main__":
    main()
