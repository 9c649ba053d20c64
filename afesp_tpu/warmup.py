"""Compile-ahead prefetch.

Under a remote TPU the one-time cost of compiling (or deserializing the
persistently-cached executables of) the big CC programs is seconds; the
pipeline stages before CCSD (integral read, SCF, MP2) are host/IO bound.
This module overlaps the two: as soon as the system dimensions are known
a daemon thread drives each production jit wrapper once on tiny-valued
dummy tensors of the REAL shapes, so the executables are resident in the
wrappers' in-process caches by the time the solver is called for real.

The dummy CC solve exits after one iteration (tolerances are traced
scalars, so +inf reuses the production executable); the dummy triples
pass runs on zeros.  Correctness is untouched — only cache state changes.
"""

from __future__ import annotations

import threading

import numpy as np

_THREADS: dict[str, threading.Thread] = {}


def _dummy_levels(nbasis: int, nocc_spatial: int) -> np.ndarray:
    """Levels with strictly negative occ / positive virt so every energy
    denominator is nonzero (no NaN/Inf in the dummy solve)."""
    no, nv = nocc_spatial, nbasis - nocc_spatial
    return np.concatenate([-np.arange(1, no + 1)[::-1] * 0.5, np.arange(1, nv + 1)])


def _prefetch_spinorb(
    nbasis: int,
    nel: int,
    nerr: int,
    maxiter: int,
    triples: bool,
    equations: str,
    precision: str,
):
    import jax.numpy as jnp

    from .methods.ccsd_spinorb import get_spinorb_solver, spinorb_cc_init
    from .ops.cc_step import init_cc_state

    no_sp = nel // 2
    eri = jnp.zeros((nbasis,) * 4)
    levels = jnp.asarray(_dummy_levels(nbasis, no_sp))
    v, D_ia, D_ijab, t1, t2, e0, _ = spinorb_cc_init(
        eri, levels, nocc_spatial=no_sp
    )
    state = init_cc_state(t1, t2, nerr)
    solver = get_spinorb_solver(
        paper_foo=equations == "paper", vvvv_split=precision == "hybrid"
    )
    st, n_iter, *_ = solver(
        state, v, D_ia, D_ijab, v.oovv, e0, np.inf, np.inf, nerr=nerr, maxiter=maxiter
    )
    int(n_iter)  # block until the executable is resident

    if triples:
        from .methods.triples_spinorb import _pick_jlen, _triples_total

        nocc, nvirt = nel, 2 * nbasis - nel
        jlen = _pick_jlen(nocc, nvirt, "hybrid")
        lv = jnp.concatenate([levels[:no_sp], levels[:no_sp], levels[no_sp:], levels[no_sp:]])
        e_t = _triples_total(
            t1,
            t2,
            v.vovv,
            v.ovoo,
            v.oovv,
            lv[:nocc],
            lv[nocc:],
            nocc=nocc,
            jlen=jlen,
            precision="hybrid",
        )
        float(e_t)


def _prefetch_spatial(nbasis: int, nel: int, nerr: int, maxiter: int):
    import jax.numpy as jnp

    from .methods.ccsd_spatial import ccsd_spatial_solver, spatial_cc_init
    from .ops.cc_step import init_cc_state

    nocc = nel // 2
    eri = jnp.zeros((nbasis,) * 4)
    levels = jnp.asarray(_dummy_levels(nbasis, nocc))
    v, D_ia, D_ijab, t1, t2, e0, _ = spatial_cc_init(eri, levels, nocc=nocc)
    state = init_cc_state(t1, t2, nerr)
    st, n_iter, *_ = ccsd_spatial_solver(
        state, v, D_ia, D_ijab, v.v_oovv, e0, np.inf, np.inf, nerr=nerr, maxiter=maxiter
    )
    int(n_iter)


def start(sys_, cfg) -> None:
    """Begin prefetching the CC executables for this system/config in a
    daemon thread.  Call right after the integral read; no-op if CCSD is
    not requested or a prefetch is already running."""
    if not cfg.wants_ccsd or "cc" in _THREADS:
        return

    def run():
        try:
            if cfg.restricted:
                _prefetch_spatial(
                    sys_.nbasis, sys_.nel, cfg.ccsd_diis_n_errmat, cfg.ccsd_maxiter
                )
            else:
                _prefetch_spinorb(
                    sys_.nbasis,
                    sys_.nel,
                    cfg.ccsd_diis_n_errmat,
                    cfg.ccsd_maxiter,
                    cfg.wants_triples,
                    cfg.ccsd_spinorb_equations,
                    cfg.ccsd_precision,
                )
        except Exception:  # best-effort: a failed prefetch only loses time
            pass

    t = threading.Thread(target=run, name="afesp-warmup", daemon=True)
    _THREADS["cc"] = t
    t.start()


def join() -> None:
    """Wait for any in-flight prefetch (called by the CC drivers before
    their first jitted call, so the two never compile concurrently)."""
    t = _THREADS.pop("cc", None)
    if t is not None:
        t.join()
