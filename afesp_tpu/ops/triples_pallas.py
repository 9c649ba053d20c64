"""Pallas TPU kernel: the CCSD(T) triples "finale".

Fuses the P(a/bc) antisymmetrisation, the D_ijk^abc denominator, the
E(T) product and the panel reduction — five HBM-bound XLA passes over
O(v^3) panels — into one VMEM-resident kernel per (j,k) panel:

    e_jk = sum_abc  P(t3c) * (P(t3c) + P(t3d)) / D      (ccsd.f90:1897-1910)
    with P(x)[a,b,c] = x[a,b,c] - x[b,a,c] - x[c,b,a]

Mosaic TPU has no f64, so panels are f32 (matching the hybrid triples
path) and the kernel emits per-(j,k,a) partial sums; the f64 reduction
over those happens outside.  Per-plane f32 accumulation error is
~1e-12 Ha — far below the 1e-8 contract (see tests/test_triples_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _finale_kernel(eo_ref, t3c_ref, t3d_ref, ev_ref, out_ref):
    x = t3c_ref[0]  # (v, v, v) f32
    y = t3d_ref[0]
    xp = x - jnp.transpose(x, (1, 0, 2)) - jnp.transpose(x, (2, 1, 0))
    yp = y - jnp.transpose(y, (1, 0, 2)) - jnp.transpose(y, (2, 1, 0))
    ev = ev_ref[:]  # (v,)
    d = (
        eo_ref[0, 0]
        - ev[:, None, None]
        - ev[None, :, None]
        - ev[None, None, :]
    )
    prod = xp * (xp + yp) / d
    # per-a partial sums keep the f32 accumulation short (v^2 terms)
    out_ref[0] = jnp.sum(prod, axis=(1, 2))


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


@partial(jax.jit, static_argnames=("interpret",))
def triples_finale(t3c, t3d, eo_sum, e_v, *, interpret: bool | None = None):
    """t3c/t3d: (P, v, v, v) f32 panels (P = panel count, e.g. jlen*nocc);
    eo_sum: (P,) f32 of e_i+e_j+e_k per panel; e_v: (v,) f32.
    Returns the f64 sum of P(t3c)*(P(t3c)+P(t3d))/D over all panels."""
    P, v = t3c.shape[0], t3c.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    partials = pl.pallas_call(
        _finale_kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda p: (p, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, v, v, v), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, v, v), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v,), lambda p: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, v), lambda p: (p, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, v), jnp.float32),
        interpret=interpret,
    )(eo_sum.reshape(P, 1), t3c, t3d, e_v)
    return jnp.sum(partials, dtype=jnp.float64)
