"""Fused device-side CC iteration step.

One XLA dispatch per CC iteration: amplitude update + energy/RMS +
the full DIIS machinery (ring buffers, Gram matrix, bordered solve,
extrapolation) all stay on device; only the two convergence scalars
cross to the host each iteration.  This replaces the reference's
per-iteration choreography of BLAS calls + LAPACK dsysv
(ccsd.f90:339-396, 617-676) with a single compiled program.

The DIIS linear system is solved at fixed size (n_errmat+1) with
inactive slots masked to identity rows, which is algebraically identical
to the reference's growing-size dsysv solve (hf.f90:216-233 semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CCState(NamedTuple):
    t1: jnp.ndarray  # current (extrapolated) amplitudes
    t2: jnp.ndarray
    t1_raw: jnp.ndarray  # last un-extrapolated update (returned on convergence)
    t2_raw: jnp.ndarray
    t1_in: jnp.ndarray  # amplitudes that fed the last iteration (the
    t2_in: jnp.ndarray  # "stale" pair the CR-CC intermediates consume)
    t2_old: jnp.ndarray  # for the RMS (ccsd.f90:1776)
    diis_T: jnp.ndarray  # (nerr, size) amplitude history
    diis_E: jnp.ndarray  # (nerr, size) error history
    gram: jnp.ndarray  # (nerr, nerr) E E^T, maintained incrementally
    slot: jnp.ndarray  # int32 ring position
    n_active: jnp.ndarray  # int32


@partial(jax.jit, static_argnames=("n_errmat",))
def init_cc_state(t1, t2, n_errmat: int) -> CCState:
    """One compiled program: the eager version's ~11 op-by-op dispatches
    cost ~100 ms of tunnel latency per solve."""
    size = t1.size + t2.size
    # distinct buffers per field (incl. t1/t2 themselves): the solvers
    # donate the state argument, so aliased fields would donate the same
    # buffer twice and the caller's own t1/t2 arrays must survive the
    # donation (jit outputs are distinct buffers; the .copy()s make the
    # traced values distinct so XLA cannot alias them away)
    return CCState(
        t1=t1.copy(),
        t2=t2.copy(),
        t1_raw=t1.copy(),
        t2_raw=t2.copy(),
        t1_in=t1.copy(),
        t2_in=t2.copy(),
        t2_old=t2.copy(),
        diis_T=jnp.zeros((n_errmat, size)),
        diis_E=jnp.zeros((n_errmat, size)),
        gram=jnp.zeros((n_errmat, n_errmat)),
        slot=jnp.int32(-1),
        n_active=jnp.int32(0),
    )


@jax.jit
def pack_solve_summary(hist_e, hist_rms, scalars, t1_final, t1_extrap):
    """Pack every host-read scalar of a finished whole-solve into ONE f64
    vector: [scalars..., sum(t1_final^2), sum(t1_extrap^2), hist_e,
    hist_rms].  Under the remote tunnel each separate readback costs a
    ~29 ms round trip and each eager op ~10 ms of dispatch latency; the
    reporting path's ~6 reads (e0, r0, n_iter, done, histories, T1-norm)
    were a measurable slice of the CCSD stage wall.  Callers slice the
    returned numpy vector."""
    head = jnp.stack(
        [jnp.asarray(x).astype(jnp.float64) for x in scalars]
        + [jnp.sum(t1_final * t1_final), jnp.sum(t1_extrap * t1_extrap)]
    )
    return jnp.concatenate([head, hist_e, hist_rms])


def gauss_solve(M, rhs):
    """f64 Gauss-Jordan solve with partial pivoting for the tiny DIIS
    system — TPU XLA implements LuDecomposition only for f32/c64, so
    jnp.linalg.solve cannot be used in f64 inside the fused step.

    Returns (x, ok): ok is False when a pivot is (near-)zero, i.e. the
    Gram matrix is singular to working precision.  Callers fall back to
    the unextrapolated amplitudes in that case, mirroring the host DIIS
    path's lstsq fallback — a ~0 pivot would otherwise inject inf/NaN
    into the extrapolation and silently poison subsequent iterations.

    The pivot loop is UNROLLED (n is static and tiny, nerr+1 = 9): as a
    lax.fori_loop the 9x(argmax + swap + eliminate) chain of ~10-element
    ops ran latency-bound at 4.6 ms/iteration on the remote TPU — ~19%
    of the whole pVTZ CCSD iteration (r5 perfetto profile, while.169) —
    because a device loop cannot overlap its tiny serial steps.
    Unrolled, the SAME arithmetic in the SAME order (bitwise-identical
    trajectory) schedules as one fused region."""
    n = M.shape[0]
    A = jnp.concatenate([M, rhs[:, None]], axis=1)

    def body(k, A):
        col = jnp.abs(A[:, k])
        col = jnp.where(jnp.arange(n) < k, -jnp.inf, col)
        p = jnp.argmax(col)
        rk, rp = A[k], A[p]
        A = A.at[k].set(rp).at[p].set(rk)
        piv = A[k, k]
        # guard the division; a tiny pivot flips `ok` below instead
        safe = jnp.where(jnp.abs(piv) > 0.0, piv, 1.0)
        factors = A[:, k] / safe
        factors = factors.at[k].set(0.0)
        return A - factors[:, None] * A[k][None, :]

    for k in range(n):
        A = body(k, A)
    diag = jnp.diagonal(A[:, :n])
    scale = jnp.max(jnp.abs(M))
    ok = jnp.min(jnp.abs(diag)) > n * jnp.finfo(M.dtype).eps * jnp.maximum(scale, 1e-300)
    safe_diag = jnp.where(jnp.abs(diag) > 0.0, diag, 1.0)
    return A[:, n] / safe_diag, ok


def _make_step_body(iteration_fn, energy_fn):
    """The un-jitted one-iteration body shared by the per-step and the
    whole-solve (while_loop) entry points."""

    def step(state: CCState, v, D_ia, D_ijab, oovv, *, nerr: int, consts=None):
        if consts is None:
            t1n, t2n = iteration_fn(state.t1, state.t2, v, D_ia, D_ijab)
        else:
            t1n, t2n = iteration_fn(state.t1, state.t2, v, D_ia, D_ijab, consts)
        e, rms2 = energy_fn(t1n, t2n, state.t2_old, oovv)

        # ---- DIIS update (ccsd.f90:617-676) ----
        flat = jnp.concatenate([t1n.ravel(), t2n.ravel()])
        snap = jnp.concatenate([state.t1.ravel(), state.t2.ravel()])
        err = flat - snap
        slot = (state.slot + 1) % nerr
        n = jnp.minimum(state.n_active + 1, nerr)
        T = state.diis_T.at[slot].set(flat)
        E = state.diis_E.at[slot].set(err)

        # Gram matrix maintained INCREMENTALLY (only the slot row/column
        # changes — the other E rows are untouched), and the new row as
        # an elementwise multiply-reduce rather than a dot: XLA's f64
        # dot emulation runs the skinny (nerr, size) E E^T at ~100x off
        # the bandwidth bound (measured 9.3 ms/iteration at pVTZ shapes
        # vs 0.4 ms for this form; same for the extrapolation below)
        row = jnp.sum(E * err[None, :], axis=1)
        gram = state.gram.at[slot, :].set(row).at[:, slot].set(row)
        active = jnp.arange(nerr) < n
        both = active[:, None] & active[None, :]
        M = jnp.zeros((nerr + 1, nerr + 1))
        M = M.at[:nerr, :nerr].set(
            jnp.where(both, gram, jnp.eye(nerr))
        )
        M = M.at[nerr, :nerr].set(jnp.where(active, -1.0, 0.0))
        M = M.at[:nerr, nerr].set(jnp.where(active, -1.0, 0.0))
        rhs = jnp.zeros(nerr + 1).at[nerr].set(-1.0)
        c, solve_ok = gauss_solve(M, rhs)
        extrap = jnp.sum(c[:nerr, None] * T, axis=0)

        use = (n >= 2) & solve_ok
        new_flat = jnp.where(use, extrap, flat)
        t1e = new_flat[: t1n.size].reshape(t1n.shape)
        t2e = new_flat[t1n.size :].reshape(t2n.shape)

        new_state = CCState(
            t1=t1e,
            t2=t2e,
            t1_raw=t1n,
            t2_raw=t2n,
            t1_in=state.t1,
            t2_in=state.t2,
            t2_old=t2n,
            diis_T=T,
            diis_E=E,
            gram=gram,
            slot=slot,
            n_active=n,
        )
        return new_state, e, rms2

    return step


def make_fused_cc_step(iteration_fn, energy_fn):
    """Build a jitted one-dispatch CC step.

    iteration_fn(t1, t2, v, D_ia, D_ijab) -> (t1_new, t2_new)
    energy_fn(t1, t2, t2_old, oovv)       -> (energy, rms2)
    """
    return partial(jax.jit, static_argnames=("nerr",))(
        _make_step_body(iteration_fn, energy_fn)
    )


def make_cc_solver(iteration_fn, energy_fn, precompute=None):
    """Build a jitted whole-solve: the complete DIIS-accelerated CC fixed
    point iteration as ONE compiled program (lax.while_loop), with the
    per-iteration convergence test on device.

    Rationale: under a remote-tunnel TPU every dispatch and every scalar
    readout costs ~50 ms of latency; the reference's loop structure
    (ccsd.f90:339-396) maps to one dispatch per *solve*, not per
    iteration.  The per-iteration (energy, rms) pairs are recorded into
    fixed-size history arrays so the host can print the reference's
    convergence table afterwards.

    Semantics identical to looping make_fused_cc_step on the host:
      converged when sqrt(rms2) < t_tol AND |e - e_old| < e_tol, checked
      after each iteration (e_old starts at the MP1 energy e0).

    solve(state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol,
          nerr=..., maxiter=...) ->
        (state, n_iter, converged, hist_e, hist_rms)
    where hist_e/hist_rms are (maxiter,) arrays valid for the first
    n_iter entries.

    precompute(v) -> consts: optional hook evaluated ONCE per solve,
    outside the while_loop; the loop body closes over the result.  Used
    to hoist loop-invariant derived operands (e.g. the hybrid path's
    pre-split f32 halves of the ERI slices) out of every iteration.
    """
    body_step = _make_step_body(iteration_fn, energy_fn)

    @partial(jax.jit, static_argnames=("nerr", "maxiter"))
    def solve(state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol, *, nerr, maxiter):
        consts = _pin(precompute(v)) if precompute is not None else None
        return _run_solve(
            body_step, state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol,
            consts, nerr, maxiter,
        )

    return solve


def make_cc_solver_pre(iteration_fn, energy_fn, precompute):
    """make_cc_solver variant whose solve takes an extra `pre` operand:
    loop-constant data built OUTSIDE the solve program (e.g. the
    streaming transform's digit-form v_vvvv, which only ever exists as
    bf16 limbs on the >=140-bf tier).  precompute(v, pre) -> consts runs
    once per solve inside the program, exactly like make_cc_solver's
    hook, with `pre` threaded through."""
    body_step = _make_step_body(iteration_fn, energy_fn)

    # state0 is donated: the returned CCState aliases its buffers, saving
    # ~1 GB of argument+output residency at 174-bf shapes (callers build
    # a fresh init_cc_state per solve)
    @partial(jax.jit, static_argnames=("nerr", "maxiter"), donate_argnums=(0,))
    def solve(
        state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol, pre, *, nerr, maxiter
    ):
        consts = _pin(precompute(v, pre))
        return _run_solve(
            body_step, state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol,
            consts, nerr, maxiter,
        )

    return solve


def _pin(consts):
    """optimization_barrier around the precompute hook's outputs.

    Without it XLA's while-loop code sinking REMATERIALISES the consts
    inside the loop body to cut peak HBM — i.e. the one-time ERI-slice
    digitization reruns every CC iteration (observed as `*.sunk` body
    clones in the compiled HLO; measured ~20 ms of the pVTZ iteration's
    ~50 ms wall, vs 27 ms for the same step executed outside the
    solve).  The barrier forces the consts to materialise once, before
    the loop."""
    return jax.lax.optimization_barrier(consts)


def _run_solve(
    body_step, state0, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol, consts,
    nerr, maxiter,
):
    """The shared while_loop core of both solver builders."""
    hist_e = jnp.zeros(maxiter)
    hist_rms = jnp.zeros(maxiter)

    def cond(carry):
        _, it, _, done, _, _ = carry
        return (it < maxiter) & ~done

    def body(carry):
        state, it, e_old, _, hist_e, hist_rms = carry
        state, e, rms2 = body_step(
            state, v, D_ia, D_ijab, oovv, nerr=nerr, consts=consts
        )
        done = (jnp.sqrt(rms2) < t_tol) & (jnp.abs(e - e_old) < e_tol)
        hist_e = hist_e.at[it].set(e)
        hist_rms = hist_rms.at[it].set(rms2)
        return state, it + 1, e, done, hist_e, hist_rms

    state, n_iter, _, done, hist_e, hist_rms = jax.lax.while_loop(
        cond, body, (state0, jnp.int32(0), e0, jnp.bool_(False), hist_e, hist_rms)
    )
    return state, n_iter, done, hist_e, hist_rms
