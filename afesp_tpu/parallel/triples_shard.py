"""Multi-chip CCSD(T): shard the triples grid over the ICI mesh.

Replaces the reference's OpenACC offload of do_ccsd_t_spinorb_acc
(ccsd.f90:1924-2016), which is single-GPU.  The spin-orbital path shards
the PRODUCTION strict-triangle (i<j<k) chunk grid — the exact same
`_strict_chunk_energy` kernel the single-chip fused loop runs, including
the hybrid-f32 and Pallas-finale variants; the spatial path shards the
(i, j-slab) `_islice_terms` grid.  Each device runs its share in a local
fori_loop and psum-reduces the energies over the mesh.  Amplitudes and
ERI slices are replicated — a deliberate trade, not an omission:

- The mesh's MEMORY-scaling path covers every O(v^4) object: the CCSD
  solve shards the digit-limb v_vvvv over its chunk axis
  (ccsd_shard.ccsd_solve_sharded_ext), and the CR stage's single v_vvvv
  contraction (ccsd.f90:2513 analog) is computed from those same sharded
  limbs (ccsd_spatial._cr_vvvv_term_from_B) — so per-device bytes of the
  dominant operand shrink 1/n_dev through CCSD *and* the (T)/CR stage
  (asserted in tests/test_parallel
  .test_sharded_ext_solve_scales_memory_and_matches and
  .test_cr_vvvv_term_from_limbs_sharded_matches_dense).
- The triples operands are O(o v^3) (vovv / VvF / IvF), replicated in
  f32 under hybrid/pallas (downcast before placement — the kernels
  consume f32 anyway, so replication costs half).  Sharding them over
  the CONTRACTED axis would psum an O(v^3)-per-triple panel across the
  mesh every grid step — at 174 bf that is ~16 MB of ICI traffic per
  triple against ~1 ms of local GEMM, strictly worse than holding the
  0.25 GB f32 operand replicated; sharding over one free axis fails
  structurally: the twelve t3_D/M3 terms use the same physical axis in
  different index roles (a in one term, c in another — the joint
  P(i/jk)P(a/bc) permutation structure, ccsd.f90:2159-2173), so every
  device ends up needing every shard.  Replication + grid-sharding is
  the right point until operands reach multi-GB, which v_vvvv hits
  first — and both its consumers (CCSD, CR) now shard it.

`triples_chunk_energies`-based sharding (per-(i,j,k) gather batches) is
kept only as the full-cube oracle for the parity tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..methods.triples_spinorb import (
    _strict_chunk_energy,
    triples_chunk_energies,
)


def _padded_grid(total: int, ndev: int):
    """Pad a linear work-grid to a multiple of ndev; returns (idx, w)
    where w masks the padding entries to zero weight."""
    per = -(-total // ndev)
    idx = np.arange(per * ndev, dtype=np.int32)
    w = (idx < total).astype(np.float64)
    return np.where(idx < total, idx, 0).astype(np.int32), w


def triples_total_sharded(
    mesh: Mesh,
    t1,
    t2,
    vovv,
    ovoo,
    oovv,
    e_o,
    e_v,
    *,
    nocc: int,
    precision: str = "hybrid",
) -> float:
    """Spin-orbital E(T) over the PRODUCTION strict-triangle triple grid,
    sharded over the mesh axis — the multi-chip form of
    triples_spinorb._triples_total_strict (same chunk kernel, same
    precision modes, psum instead of a single-device accumulator).  The
    (0,0,0)-padded tail triples contribute exactly zero (strict_plan),
    so devices holding only padding still psum correctly."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    nvirt = e_v.shape[0]
    from ..methods.triples_spinorb import _pick_clen, strict_triple_list

    ii, jj, kk = strict_triple_list(nocc)
    total = len(ii)
    if total == 0:
        return 0.0
    # equal whole-chunk shares: per-device count is the chunk-rounded
    # ceiling of total/ndev, padded with zero-contribution (0,0,0)s
    per_raw = -(-total // ndev)
    clen = _pick_clen(nvirt, precision, per_raw)
    per = -(-per_raw // clen) * clen
    pad = np.zeros(per * ndev - total, dtype=np.int32)
    ii, jj, kk = (np.concatenate([x, pad]) for x in (ii, jj, kk))
    # inputs may arrive sharded over a different (sub-)mesh — e.g. the
    # CC solve's divisor-fitted mesh; replicate them onto this one.
    # Under hybrid/pallas the kernels consume f32 operands anyway —
    # downcast BEFORE replicating so every device holds half the bytes
    from jax.sharding import NamedSharding

    if precision in ("hybrid", "pallas"):
        f32 = jnp.float32
        t1, t2, vovv, ovoo, oovv = (
            x.astype(f32) for x in (t1, t2, vovv, ovoo, oovv)
        )
    repl = NamedSharding(mesh, P())
    t1, t2, vovv, ovoo, oovv, e_o, e_v = (
        jax.device_put(x, repl) for x in (t1, t2, vovv, ovoo, oovv, e_o, e_v)
    )

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),) * 3 + (P(),) * 7,
        out_specs=P(),
    )
    def worker(ii_l, jj_l, kk_l, t1, t2, vovv, ovoo, oovv, e_o, e_v):
        if precision in ("hybrid", "pallas"):
            f32 = jnp.float32
            t1, t2, vovv, ovoo, oovv = (
                x.astype(f32) for x in (t1, t2, vovv, ovoo, oovv)
            )
        nchunk = ii_l.shape[0] // clen
        iic = ii_l.reshape(nchunk, clen)
        jjc = jj_l.reshape(nchunk, clen)
        kkc = kk_l.reshape(nchunk, clen)

        def body(c, acc):
            return acc + _strict_chunk_energy(
                iic[c], jjc[c], kkc[c],
                t1, t2, vovv, ovoo, oovv, e_o, e_v, precision,
            )

        # the carry must be device-varying under shard_map's manual-axes
        # typing (each shard accumulates its own partial)
        acc0 = jax.lax.pcast(jnp.float64(0.0), (axis,), to="varying")
        acc = jax.lax.fori_loop(0, nchunk, body, acc0)
        return jax.lax.psum(acc, axis)

    return float(
        worker(
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            t1, t2, vovv, ovoo, oovv, e_o, e_v,
        )
    ) / 6.0


def triples_spatial_sharded(
    mesh: Mesh,
    t1,
    t2,
    v_vvov,
    v_oovo,
    v_oovv,
    e_o,
    e_v,
    I_vovv_pp,
    I_ooov_pp,
    *,
    nocc: int,
    jlen: int,
    doing_T: bool,
    doing_R: bool,
    doing_CR: bool,
    precision: str = "f64",
):
    """The spatial six-sum triples reductions (CCSD[T]/(T)/R/CR family)
    over the production (i, j-slab) grid, sharded over the mesh — the
    multi-chip form of triples_spatial._triples_total_spatial.  Returns
    the same tuple of six psum-reduced totals (ordered as _SUM_KEYS)."""
    from ..methods.triples_spatial import _SUM_KEYS, _islice_terms

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    assert nocc % jlen == 0
    nslab = nocc // jlen
    idx, w = _padded_grid(nocc * nslab, ndev)
    from jax.sharding import NamedSharding

    # hybrid/pallas kernels consume f32 operands — downcast BEFORE
    # replicating so each device holds half the replicated bytes (the
    # occupied-energy vectors stay f64: the D3 denominators are f64)
    if precision in ("hybrid", "pallas"):
        f32 = jnp.float32
        t1, t2, v_vvov, v_oovo, v_oovv, I_vovv_pp, I_ooov_pp = (
            x.astype(f32)
            for x in (t1, t2, v_vvov, v_oovo, v_oovv, I_vovv_pp, I_ooov_pp)
        )
    repl = NamedSharding(mesh, P())
    (t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v, I_vovv_pp, I_ooov_pp) = (
        jax.device_put(x, repl)
        for x in (t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v,
                  I_vovv_pp, I_ooov_pp)
    )

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(),) * 9,
        out_specs=tuple(P() for _ in _SUM_KEYS),
    )
    def worker(idx_l, w_l, t1, t2, vv, vo, voovv, e_o, e_v, Iv, Jo):
        args = (t1, t2, vv, vo, voovv, e_o, e_v, Iv, Jo)

        def body(k, sums):
            ind = idx_l[k]
            i0 = ind // nslab
            j0 = (ind % nslab) * jlen
            acc = _islice_terms(
                i0, j0, *args, jlen=jlen,
                doing_T=doing_T, doing_R=doing_R, doing_CR=doing_CR,
                precision=precision,
            )
            return tuple(
                s + w_l[k] * acc.get(key, jnp.float64(0.0))
                for s, key in zip(sums, _SUM_KEYS)
            )

        init = tuple(
            jax.lax.pcast(jnp.float64(0.0), (axis,), to="varying")
            for _ in _SUM_KEYS
        )
        sums = jax.lax.fori_loop(0, idx_l.shape[0], body, init)
        return tuple(jax.lax.psum(s, axis) for s in sums)

    return worker(
        jnp.asarray(idx), jnp.asarray(w),
        t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v, I_vovv_pp, I_ooov_pp,
    )


def triples_energy_sharded(
    mesh: Mesh,
    nocc: int,
    t1,
    t2,
    vovv,
    ovoo,
    oovv,
    e_o,
    e_v,
    inner_chunk: int = 0,
) -> float:
    """E(T) with the (i,j,k) grid sharded over mesh axis "p"."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size

    idx = np.arange(nocc)
    ii, jj, kk = (x.ravel() for x in np.meshgrid(idx, idx, idx, indexing="ij"))
    n = len(ii)
    per = -(-n // ndev)
    pad = per * ndev - n
    w = np.concatenate([np.ones(n), np.zeros(pad)])
    ii = np.concatenate([ii, np.zeros(pad, dtype=ii.dtype)])
    jj = np.concatenate([jj, np.zeros(pad, dtype=jj.dtype)])
    kk = np.concatenate([kk, np.zeros(pad, dtype=kk.dtype)])

    if inner_chunk <= 0:
        nvirt = e_v.shape[0]
        inner_chunk = max(1, min(per, int(1e9 / (3 * 8 * nvirt**3) + 1)))
    # pad each slab to a multiple of inner_chunk so lax.map sees a static grid
    per_pad = -(-per // inner_chunk) * inner_chunk
    extra = per_pad * ndev - len(ii)
    w = np.concatenate([w, np.zeros(extra)])
    ii = np.concatenate([ii, np.zeros(extra, dtype=ii.dtype)])
    jj = np.concatenate([jj, np.zeros(extra, dtype=jj.dtype)])
    kk = np.concatenate([kk, np.zeros(extra, dtype=kk.dtype)])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)) + (P(),) * 7,
        out_specs=P(),
    )
    def worker(ii_l, jj_l, kk_l, w_l, t1, t2, vovv, ovoo, oovv, e_o, e_v):
        def body(args):
            i_c, j_c, k_c, w_c = args
            e = triples_chunk_energies(
                i_c, j_c, k_c, t1, t2, vovv, ovoo, oovv, e_o, e_v
            )
            return jnp.dot(w_c, e)

        chunks = (
            ii_l.reshape(-1, inner_chunk),
            jj_l.reshape(-1, inner_chunk),
            kk_l.reshape(-1, inner_chunk),
            w_l.reshape(-1, inner_chunk),
        )
        partials = jax.lax.map(body, chunks)
        return jax.lax.psum(jnp.sum(partials), axis)

    f = jax.jit(worker)
    return float(
        f(
            jnp.asarray(ii),
            jnp.asarray(jj),
            jnp.asarray(kk),
            jnp.asarray(w),
            t1,
            t2,
            vovv,
            ovoo,
            oovv,
            e_o,
            e_v,
        )
    )
