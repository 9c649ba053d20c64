"""Multi-chip CCSD via GSPMD sharding of the production fused solve.

The CCSD amplitude update is one big einsum program; the scalable axis is
the virtual index (the O(o^2 v^4) tau*W_vvvv contraction dominates).  We
annotate t2 / the v-heavy ERI slices with a NamedSharding over a virtual
axis and run the UNMODIFIED production solver (ops/cc_step.make_cc_solver
— the whole lax.while_loop fixed point with on-device DIIS) on the
sharded operands: XLA/GSPMD propagates the shardings through the loop
body and inserts the ICI collectives.  This is the TPU-native replacement
for the reference's threaded-BLAS parallelism (SURVEY.md §2, components
5-7; there is no distributed path upstream to mirror).

The DIIS ring buffers hold flattened amplitude vectors; they stay
replicated (GSPMD gathers the sharded amplitudes at the ravel) — the
contraction work, which is all of the FLOPs, is what shards.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..methods.ccsd_spatial import Slices
from ..methods.ccsd_spinorb import SpinSlices, ccsd_spinorb_iteration
from ..ops.cc_step import CCState

# per-slice axis (in the slice's own rank) carrying a virtual index to
# shard; None = replicated (occupied-only slices are tiny)
_SPINORB_AXES = SpinSlices(
    oooo=None, ooov=3, ovoo=1, oovo=2, oovv=3, ovvo=2, ovvv=3, vovv=3, vvvv=3
)
_SPATIAL_AXES = Slices(
    v_oovv=3, v_ovov=3, v_vvov=3, v_oovo=2, v_oooo=None, v_vvvv=3
)


def _on_axis(mesh: Mesh, pos: int, nd: int = 4) -> NamedSharding:
    spec = [None] * nd
    spec[pos] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def shard_ccsd_inputs(mesh: Mesh, t1, t2, v, D_ia, D_ijab):
    """Place the CCSD operands with last-virtual-axis shardings.  Accepts
    either SpinSlices or (spatial) Slices."""
    axes = _SPINORB_AXES if isinstance(v, SpinSlices) else _SPATIAL_AXES
    repl = NamedSharding(mesh, P())
    t1 = jax.device_put(t1, _on_axis(mesh, 1, 2))
    t2 = jax.device_put(t2, _on_axis(mesh, 3, 4))
    v = type(v)(
        *(
            jax.device_put(x, repl if pos is None else _on_axis(mesh, pos))
            for x, pos in zip(v, axes)
        )
    )
    D_ia = jax.device_put(D_ia, _on_axis(mesh, 1, 2))
    D_ijab = jax.device_put(D_ijab, _on_axis(mesh, 3, 4))
    return t1, t2, v, D_ia, D_ijab


def shard_cc_state(mesh: Mesh, state: CCState) -> CCState:
    """Shard the while_loop carry: amplitude fields on the virtual axis,
    DIIS ring buffers and counters replicated."""
    s1 = _on_axis(mesh, 1, 2)
    s2 = _on_axis(mesh, 3, 4)
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    return CCState(
        t1=put(state.t1, s1),
        t2=put(state.t2, s2),
        t1_raw=put(state.t1_raw, s1),
        t2_raw=put(state.t2_raw, s2),
        t1_in=put(state.t1_in, s1),
        t2_in=put(state.t2_in, s2),
        t2_old=put(state.t2_old, s2),
        diis_T=put(state.diis_T, repl),
        diis_E=put(state.diis_E, repl),
        gram=put(state.gram, repl),
        slot=put(state.slot, repl),
        n_active=put(state.n_active, repl),
    )


def _fitting_mesh(mesh: Mesh, nvirt: int) -> Mesh | None:
    """device_put rejects uneven shardings, so the solve uses the
    largest leading sub-mesh whose size divides the virtual dimension
    (e.g. 7 of 8 devices for N2's nvirt=21).  None = don't shard."""
    size = mesh.devices.size
    d = max(k for k in range(1, size + 1) if nvirt % k == 0)
    if d < 2:
        return None
    if d == size:
        return mesh
    return Mesh(mesh.devices.ravel()[:d], mesh.axis_names)


def ccsd_solve_sharded(
    mesh: Mesh, solver, state: CCState, v, D_ia, D_ijab, oovv,
    e0, e_tol, t_tol, *, nerr: int, maxiter: int
):
    """Run the PRODUCTION fused CC solve (while_loop + DIIS, one program)
    under GSPMD virtual-axis sharding.  `solver` is the memoized wrapper
    from get_spinorb_solver / get_spatial_solver; `oovv` is the energy
    slice (v.oovv spin-orbital, v.v_oovv spatial).  Returns the solver's
    (state, n_iter, converged, hist_e, hist_rms) with sharded amplitudes.
    """
    mesh = _fitting_mesh(mesh, state.t2.shape[3])
    if mesh is None:
        return solver(
            state, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol,
            nerr=nerr, maxiter=maxiter,
        )
    t1, t2, v, D_ia, D_ijab = shard_ccsd_inputs(
        mesh, state.t1, state.t2, v, D_ia, D_ijab
    )
    state = shard_cc_state(mesh, state._replace(t1=t1, t2=t2))
    oovv = jax.device_put(oovv, _on_axis(mesh, 3, 4))
    return solver(
        state, v, D_ia, D_ijab, oovv, e0, e_tol, t_tol,
        nerr=nerr, maxiter=maxiter,
    )


def _pad_chunk_axis(vvvv_B, mult: int):
    """Pad the digit-limb v_vvvv's chunk axis to a multiple of `mult`
    with all-zero chunks (scale 1).  Zero digits contribute exactly zero
    to every pair product, so the padded operand is numerically
    identical — this is what lets a prime chunk count (e.g. nc=53 at
    nvirt=159) shard evenly over any mesh."""
    import jax.numpy as jnp

    chunks, s = vvvv_B
    nc = chunks[0].shape[0]
    pad = (-nc) % mult
    if pad == 0:
        return vvvv_B
    chunks = [jnp.pad(c, ((0, pad), (0, 0), (0, 0))) for c in chunks]
    s = jnp.pad(s, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    return chunks, s


def shard_vvvv_limbs(mesh: Mesh, vvvv_B):
    """Pad + chunk-shard the digit-limb v_vvvv over the mesh's first
    axis.  Idempotent: device_put to the sharding an array already
    carries is a no-op, so callers may pre-shard (do_ccsd_spatial needs
    the SAME sharded copy for both the solve and the CR-term GEMM — a
    fresh unsharded copy there dispatched against sharded t1, the
    round-4 advisor's medium finding)."""
    vvvv_B = _pad_chunk_axis(vvvv_B, mesh.devices.size)
    ch = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    chunks, s = vvvv_B
    return [jax.device_put(c, ch) for c in chunks], jax.device_put(s, ch)


def ccsd_solve_sharded_ext(
    mesh: Mesh, solver, state: CCState, v, D_ia, D_ijab, oovv,
    e0, e_tol, t_tol, vvvv_B, *, nerr: int, maxiter: int
):
    """Memory-scaling multi-chip CCSD for the streaming tier: the digit-
    limb v_vvvv — the dominant operand, the only form in which v_vvvv
    exists at this scale — is sharded over its K-CHUNK axis, so an
    8-chip mesh holds 1/8 of the limbs per device (plus the virtual-axis
    sharding of the remaining slices/amplitudes); GSPMD partitions the
    per-chunk pair products and inserts the cross-chunk psum.  This is
    the path that admits a problem one chip's HBM cannot hold — the
    reference has no analogue at any scale (its packed store caps near
    99 bf, integrals.f90:10-21)."""
    sub = _fitting_mesh(mesh, state.t2.shape[3])
    if sub is None:
        sub = Mesh(mesh.devices.ravel()[:1], mesh.axis_names)
    t1, t2, vs, D_ia, D_ijab = _shard_spatial_ext(
        sub, state.t1, state.t2, v, D_ia, D_ijab
    )
    state = shard_cc_state(sub, state._replace(t1=t1, t2=t2))
    oovv = jax.device_put(oovv, _on_axis(sub, 3, 4))
    vvvv_B = shard_vvvv_limbs(mesh, vvvv_B)
    return solver(
        state, vs, D_ia, D_ijab, oovv, e0, e_tol, t_tol, vvvv_B,
        nerr=nerr, maxiter=maxiter,
    )


def _shard_spatial_ext(mesh: Mesh, t1, t2, v, D_ia, D_ijab):
    """shard_ccsd_inputs for an external Slices whose v_vvvv is None."""
    repl = NamedSharding(mesh, P())
    t1 = jax.device_put(t1, _on_axis(mesh, 1, 2))
    t2 = jax.device_put(t2, _on_axis(mesh, 3, 4))
    parts = []
    for x, pos in zip(v, _SPATIAL_AXES):
        if x is None:
            parts.append(None)
        else:
            parts.append(
                jax.device_put(x, repl if pos is None else _on_axis(mesh, pos))
            )
    D_ia = jax.device_put(D_ia, _on_axis(mesh, 1, 2))
    D_ijab = jax.device_put(D_ijab, _on_axis(mesh, 3, 4))
    return t1, t2, type(v)(*parts), D_ia, D_ijab


def ccsd_iteration_sharded(mesh: Mesh, t1, t2, v: SpinSlices, D_ia, D_ijab):
    """One sharded CCSD iteration; returns (t1', t2') with the same
    shardings (XLA/GSPMD chooses the internal collectives)."""
    t1, t2, v, D_ia, D_ijab = shard_ccsd_inputs(mesh, t1, t2, v, D_ia, D_ijab)
    return ccsd_spinorb_iteration(t1, t2, v, D_ia, D_ijab)
