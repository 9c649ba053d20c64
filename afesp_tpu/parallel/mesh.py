"""Device-mesh helpers.

The reference is single-node OpenMP (SURVEY.md section 2: no MPI/NCCL);
its only scalable axis is the embarrassingly parallel (i,j,k) triples
loop and the big vvvv contraction.  On TPU those map onto a 1-D ICI mesh:

  * triples: shard the (i,j,k) grid over axis "p" (shard_map + psum)
  * CCSD einsums: GSPMD-shard the last virtual index of t2/slices

Both ride ICI; no DCN traffic at this problem scale.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def default_mesh(n_devices: int | None = None, axis: str = "p") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))
