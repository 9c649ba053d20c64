"""Decompose the first-run ("cold") wall on the remote axon TPU.

The headline bench's cold_wall regressed to ~235-250 s whenever the
server-side state decays; PERF.md established that only a first
*execution* of a program pays the big one-time cost, but not what that
cost IS (local XLA compile vs persistent-cache deserialisation vs
server-side compile/load) or whether concurrent first executions
overlap.  This tool measures each leg with FRESH program variants —
the production spin-orbital solver at pVTZ shapes with a never-used
static `maxiter`, so every probe is a never-seen program of production
size regardless of what the server currently has cached.

Usage (real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_coldstart.py [base_maxiter]

Pass a different base_maxiter on each invocation (default 150) so
variants never collide with previously-loaded programs.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.methods.ccsd_spinorb import (
        get_spinorb_solver,
        spinorb_cc_init,
    )
    from afesp_tpu.ops.cc_step import init_cc_state
    from afesp_tpu.warmup import _dummy_levels

    nbasis, nel, nerr = 58, 10, 8  # pVTZ headline dims
    no_sp = nel // 2
    solver = get_spinorb_solver(paper_foo=False, vvvv_split=True)

    eri = jnp.zeros((nbasis,) * 4)
    levels = jnp.asarray(_dummy_levels(nbasis, no_sp))
    v, D_ia, D_ijab, t1, t2, e0, _, _ = spinorb_cc_init(eri, levels, nocc_spatial=no_sp)
    state = init_cc_state(t1, t2, nerr)
    inf = jnp.float64(np.inf)

    def probe(maxiter, tag):
        r = {"tag": tag, "maxiter": maxiter}
        t0 = time.perf_counter()
        low = solver.lower(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf,
                           nerr=nerr, maxiter=maxiter)
        r["t_lower"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        comp = low.compile()
        r["t_compile"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = comp(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf)
        int(out[1])  # block
        r["t_exec1"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = comp(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf)
        int(out[1])
        r["t_exec2"] = time.perf_counter() - t0
        print(json.dumps(r), flush=True)
        return r

    # A: fresh program, fully cold everywhere
    probe(base, "fresh")
    # B: same program again in-process (jit cache warm) — via jit wrapper
    t0 = time.perf_counter()
    out = solver(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf,
                 nerr=nerr, maxiter=base)
    int(out[1])
    print(json.dumps({"tag": "warm_inproc", "t": time.perf_counter() - t0}),
          flush=True)

    # C: overlap test — two fresh variants, first executions concurrent
    res = {}

    def run_one(mi, key):
        t0 = time.perf_counter()
        low = solver.lower(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf,
                           nerr=nerr, maxiter=mi)
        comp = low.compile()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = comp(state, v, D_ia, D_ijab, v.oovv, e0, inf, inf)
        int(out[1])
        res[key] = {"t_lower_compile": tc, "t_exec1": time.perf_counter() - t0}

    t0 = time.perf_counter()
    th1 = threading.Thread(target=run_one, args=(base + 1, "a"))
    th2 = threading.Thread(target=run_one, args=(base + 2, "b"))
    th1.start(); th2.start(); th1.join(); th2.join()
    print(json.dumps({"tag": "overlap2", "wall": time.perf_counter() - t0,
                      **res}), flush=True)

    # D: tiny fresh program — fixed per-program cost floor
    @jax.jit
    def tiny(x):
        return (x @ x).sum() + base  # `base` baked in -> fresh program

    x = jnp.ones((257, 257))
    t0 = time.perf_counter()
    float(tiny(x))
    print(json.dumps({"tag": "tiny_fresh", "t": time.perf_counter() - t0}),
          flush=True)


if __name__ == "__main__":
    main()
