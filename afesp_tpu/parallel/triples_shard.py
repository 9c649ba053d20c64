"""Multi-chip CCSD(T): shard the (i,j,k) triples grid over the ICI mesh.

Replaces the reference's OpenACC offload of do_ccsd_t_spinorb_acc
(ccsd.f90:1924-2016), which is single-GPU.  Each device receives an
equal slab of the o^3 triples (padded with zero-weight entries), computes
its per-triple energies with the same kernel as the single-chip path
(methods/triples_spinorb.triples_chunk_energies), and the scalar is
psum-reduced over the mesh.  Amplitudes and ERI slices are replicated —
at this problem scale they are tiny next to the o^3 v^3 work.
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

from ..methods.triples_spinorb import triples_chunk_energies


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
