"""Multi-chip CCSD iteration via GSPMD sharding.

The CCSD amplitude update is one big einsum program; the scalable axis is
the virtual index (the O(o^2 v^4) tau*W_vvvv contraction dominates).  We
annotate t2 / the v-heavy slices with a NamedSharding over the last
virtual axis and let XLA insert the ICI collectives — the TPU-native
replacement for the reference's threaded-BLAS parallelism
(SURVEY.md section 2, components 5-7; there is no distributed path
upstream to mirror).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..methods.ccsd_spinorb import SpinSlices, ccsd_spinorb_iteration


def shard_ccsd_inputs(mesh: Mesh, t1, t2, v: SpinSlices, D_ia, D_ijab):
    """Place the CCSD operands with virtual-axis shardings."""
    axis = mesh.axis_names[0]

    def on_axis(pos: int, nd: int = 4) -> NamedSharding:
        spec = [None] * nd
        spec[pos] = axis
        return NamedSharding(mesh, P(*spec))

    # shard each tensor over its *last virtual* axis (occupied axes are
    # tiny and stay replicated)
    blocks = SpinSlices(
        oooo=None, ooov=3, ovoo=1, oovo=2, oovv=3, ovvo=2, ovvv=3, vovv=3, vvvv=3
    )
    repl = NamedSharding(mesh, P())
    t1 = jax.device_put(t1, on_axis(1, 2))
    t2 = jax.device_put(t2, on_axis(3, 4))
    v = SpinSlices(
        *(
            jax.device_put(x, repl if pos is None else on_axis(pos))
            for x, pos in zip(v, blocks)
        )
    )
    D_ia = jax.device_put(D_ia, on_axis(1, 2))
    D_ijab = jax.device_put(D_ijab, on_axis(3, 4))
    return t1, t2, v, D_ia, D_ijab


def ccsd_iteration_sharded(mesh: Mesh, t1, t2, v: SpinSlices, D_ia, D_ijab):
    """One sharded CCSD iteration; returns (t1', t2') with the same
    shardings (XLA/GSPMD chooses the internal collectives)."""
    t1, t2, v, D_ia, D_ijab = shard_ccsd_inputs(mesh, t1, t2, v, D_ia, D_ijab)
    return ccsd_spinorb_iteration(t1, t2, v, D_ia, D_ijab)
