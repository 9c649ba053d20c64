"""Pallas TPU kernel: the CCSD(T) triples "finale".

Fuses the P(a/bc) antisymmetrisation, the D_ijk^abc denominator, the
E(T) product and the panel reduction — the HBM-bound elementwise tail of
the triples evaluation (ccsd.f90:1897-1910) — into one VMEM-resident
pass per (j,k) panel:

    e_jk = sum_abc  P(t3c) * (P(t3c) + P(t3d)) / D
    with P(x)[a,b,c] = x[a,b,c] - x[b,a,c] - x[c,b,a]

Mosaic TPU has no f64, so panels are f32 (matching the hybrid triples
path); each grid step emits one per-panel f32 partial and the f64
reduction over panels happens outside.

Lowering constraints honoured (pallas_guide):
  * the per-panel scalar e_i+e_j+e_k rides in as a scalar-prefetch
    argument (SMEM blocks below (8,128) are not lowerable);
  * the output is a (ceil(P/8)*8, 128) f32 tile written row-per-panel
    with an (8,128) block revisited by 8 consecutive grid steps;
  * panel blocks are full-array in their last two dims.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _finale_kernel(eo_ref, ev_ref, x_ref, y_ref, dvv_ref, out_ref):
    p = pl.program_id(0)
    # keep all index arithmetic in i32: under jax_enable_x64 a bare `% 8`
    # promotes to i64, which Mosaic cannot lower
    row = jax.lax.rem(p, jnp.int32(8))

    @pl.when(row == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[0]  # (v, v, v) f32
    y = y_ref[0]
    xp = x - jnp.transpose(x, (1, 0, 2)) - jnp.transpose(x, (2, 1, 0))
    w = xp + (y - jnp.transpose(y, (1, 0, 2)) - jnp.transpose(y, (2, 1, 0)))
    dvv = dvv_ref[:]  # (v, v): ev[b] + ev[c] — Mosaic cannot lower the
    # leading-axis 1-D->3-D broadcast, so the denominator is applied one
    # a-plane at a time with pure 2-D vector ops
    eo = eo_ref[p]

    def scoped(xp_s, w_s):
        xp_s[:] = xp
        w_s[:] = w

        def body(a, acc):
            # dynamic a-plane reads must go through Refs (Mosaic has no
            # dynamic_slice on values)
            xpa = xp_s[pl.ds(a, 1)][0]
            wa = w_s[pl.ds(a, 1)][0]
            d_a = (eo - ev_ref[a]) - dvv
            return acc + jnp.sum(xpa * wa / d_a)

        # i32 loop bounds: under x64 plain ints make an i64 counter
        return jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(x.shape[0]), body, jnp.float32(0.0)
        )

    v = x.shape[0]
    partial_sum = pl.run_scoped(
        scoped,
        xp_s=pltpu.VMEM((v, v, v), jnp.float32),
        w_s=pltpu.VMEM((v, v, v), jnp.float32),
    )
    out_ref[pl.ds(row, 1), :] = jnp.full((1, 128), partial_sum, jnp.float32)


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
    rows = -(-P // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # eo_sum (P,), e_v (v,) — SMEM scalar tables
        grid=(P,),
        in_specs=[
            pl.BlockSpec(
                (1, v, v, v), lambda p, eo, ev: (p, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, v, v, v), lambda p, eo, ev: (p, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((v, v), lambda p, eo, ev: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda p, eo, ev: (p // 8, 0), memory_space=pltpu.VMEM
        ),
    )
    dvv = (e_v[:, None] + e_v[None, :]).astype(jnp.float32)
    # trace the pallas_call with x64 OFF: under jax_enable_x64 the grid /
    # index-map constants canonicalise to i64, which sends Mosaic's
    # convert-lowering into infinite recursion.  All operands here are
    # f32/i32 so the narrowed tracing context changes nothing else.
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _finale_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(eo_sum, e_v.astype(jnp.float32), t3c, t3d, dvv)
    return jnp.sum(partials[:P, 0], dtype=jnp.float64)
