"""Tiled Pallas spatial-triples tier for nvirt > 128.

The fully-fused sorted-triples kernel (ops/triples_pallas.
triples_fused_spatial) holds whole (vp, vp, vp) VMEM cubes, which caps
it at vp = 128 lanes; above that the r4 flagship (174-bf water trimer,
nvirt=159) fell back to the all-jnp slab finale at jlen=1 — 50.3 s warm
at 1.1 % utilisation (BENCH_XL_r04), 8x its own CCSD stage.  This
module removes the cliff by splitting the work the TPU-natural way:

* stage 1 (XLA): for a chunk of B sorted triples, the 24 numerator
  GEMMs (12 t3_D + 12 m3 joint permutations, ccsd.f90:2168-2173 /
  2188-2193 — the SAME static term tables the fused kernel uses,
  validated to 3e-13) run as batched (v, v) x (v, v^2) einsums on the
  MXU, materialising per-triple f32 cubes in HBM: t3_D, m3, the z3/y
  NUMERATOR cubes (rank-structured outer products, Piecuch Eq. 60/66),
  and each cube's b-leading "swap" layout transpose(0,2,1,3);

* stage 2 (Pallas): a kernel whose grid is (triple, a-panel) — the v^3
  window is tiled over 128-lane-safe PA-row panels of the leading
  virtual axis, so VMEM holds (PA, v, v) slabs, never cubes.  Per slab
  it divides by the S3-symmetric denominator, and accumulates the six
  sorted-triple sums

      s0 = t3_D . M(t3)   s1 = t3_D . M(z3)   s2 = y . M(t3)
      s3 = y . M(z3)      s4 = m3 . M(t3)     s5 = m3 . M(z3)

  with M = 8 I - 4 (T_ab + T_ac + T_bc) + 2 (C + C^2) (the conjugacy-
  class operator that turns full-cube xbar reductions into sorted-
  triple ones — see methods/triples_spatial.strict_spatial_plan).

The key identity that makes a-panel tiling exact: every twisted inner
product sum_abc G[abc] * F[sigma(a,b,c)] over the six sigma in S3 is
computable from a-slabs ALONE once both cube orientations are in VMEM,
using only last-two-axis transposes (no cross-panel reads):

    T_id = <G, F>            T_ab = <G, Fsw>
    T_bc = <G, T23 F>        T_c2 = <G, T23 Fsw>
    T_c1 = <T23 F, Gsw>      T_ac = <Gsw, T23 Fsw>

where Gsw/Fsw are the swap layouts' a-slabs and T23 transposes the last
two axes of a slab.  (Derivation: substitute Xsw[u,z,w] = X[z,u,w] and
relabel the bound indices; e.g. T_ac = sum G[abc] F[cba]
= sum_u Gsw[u,a,c] Fsw[u,c,a] = <Gsw, T23 Fsw> with u ranging over the
slab panel.)  So the kernel needs 8 fetched slabs (4 cubes x 2
orientations), 4 division scratches and 4 transposed scratches — ~64 MB
of VMEM at PA=16 at ANY nvirt, where the untiled finale needed five
whole cubes (191 MB at nvirt=159, the measured r4 failure).

Reference bar: the OpenACC batched-triples strategy this tier replaces
(ccsd.f90:1924-2016, 2018-2293) has no size cliff either.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .triples_pallas import (
    _ID,
    _SPATIAL_F_TERMS,
    _SPATIAL_M3M_TERMS,
    _SPATIAL_M_TERMS,
    _on_tpu,
)


def _chunk_cubes(t2f, VvF, VoL, t2M2, IvF, JoT, Wm, t1f, ii, jj, kk,
                 *, has_z: bool, has_y: bool, has_m: bool, npa: int):
    """Stage 1: per-triple f32 cubes for one chunk of B sorted triples.

    Returns a dict of (B, npa, v, v) arrays (leading virtual axis
    zero-padded to npa = n_panels * PA), each in BOTH orientations:
    'g' = [a, b, c], 's' = the swap transpose(0,2,1,3) = [b, a, c].
    """
    idx = (ii, jj, kk)
    v = t2f.shape[-1]

    def f_side(RHS):
        # RHS[x, f, b, c]; lhs t2[pair][a, f] -> raw[t, a, b, c]
        acc = None
        for (pa, pb), r, perm in _SPATIAL_F_TERMS:
            lhs = t2f[idx[pa], idx[pb]]        # (B, v, v)
            rhs = RHS[idx[r]]                  # (B, v, v, v)
            raw = jnp.einsum(
                "taf,tfbc->tabc", lhs, rhs,
                preferred_element_type=jnp.float32,
            )
            if perm != _ID:
                raw = jnp.transpose(raw, (0,) + tuple(q + 1 for q in perm))
            acc = raw if acc is None else acc + raw
        return acc

    def m_side(LHS, terms):
        # LHS[p, q, y, m]; rhs t2M2[x][m, b, a] -> raw[t, y, b, a]
        acc = None
        for (pa, pb), r, perm in terms:
            lhs = LHS[idx[pa], idx[pb]]        # (B, v, m)
            rhs = t2M2[idx[r]]                 # (B, m, v, v)
            raw = jnp.einsum(
                "tym,tmba->tyba", lhs, rhs,
                preferred_element_type=jnp.float32,
            )
            if perm != _ID:
                raw = jnp.transpose(raw, (0,) + tuple(q + 1 for q in perm))
            acc = raw if acc is None else acc + raw
        return acc

    out = {}

    def emit(name, cube):
        pad = ((0, 0), (0, npa - v), (0, 0), (0, 0))
        out[name + "g"] = jnp.pad(cube, pad)
        out[name + "s"] = jnp.pad(jnp.transpose(cube, (0, 2, 1, 3)), pad)

    emit("x", f_side(VvF) - m_side(VoL, _SPATIAL_M_TERMS))
    if has_m:
        emit("m", f_side(IvF) - m_side(JoT, _SPATIAL_M3M_TERMS))
    # z3 numerator (Piecuch Eq. 60; ccsd.f90:2178-2179):
    #   zn[a,b,c] = t1[i,a] W[j,k][b,c] + t1[j,b] W[i,k][a,c]
    #             + t1[k,c] W[i,j][a,b],  W = v_oovv
    t1i, t1j, t1k = (t1f[idx[q]] for q in range(3))   # (B, v) each
    Wjk = Wm[idx[1], idx[2]]
    Wik = Wm[idx[0], idx[2]]
    Wij = Wm[idx[0], idx[1]]
    if has_z:
        zn = (
            t1i[:, :, None, None] * Wjk[:, None, :, :]
            + t1j[:, None, :, None] * Wik[:, :, None, :]
            + t1k[:, None, None, :] * Wij[:, :, :, None]
        )
        emit("z", zn)
    if has_y:
        # y (Piecuch Eq. 66; ccsd.f90:2183-2184): same structure with
        # U[j,k] = outer(t1j, t1k) + t2[j,k], U[i,k] = t2[i,k], ...
        Ujk = t1j[:, :, None] * t1k[:, None, :] + t2f[idx[1], idx[2]]
        Uik = t2f[idx[0], idx[2]]
        Uij = t2f[idx[0], idx[1]]
        yn = (
            t1i[:, :, None, None] * Ujk[:, None, :, :]
            + t1j[:, None, :, None] * Uik[:, :, None, :]
            + t1k[:, None, None, :] * Uij[:, :, :, None]
        )
        emit("y", yn)
    return out


def _tiled_kernel(v: int, PA: int, NP: int,
                  has_z: bool, has_y: bool, has_m: bool):
    """Kernel body: one (triple, a-panel) step of the tiled M-finale."""
    f32 = jnp.float32
    n_in = 2 * (1 + has_m + has_z + has_y)

    def kernel(*refs):
        eo_ref = refs[0]
        ins = refs[1 : 1 + n_in]
        pos = 1 + n_in
        evc = refs[pos]; pos += 1
        dvv = refs[pos]; pos += 1
        out_ref = refs[pos]; pos += 1
        # scratch: divisions (t3, t3s[, z3, z3s]) then T23 buffers
        n_div = 2 * (1 + has_z)
        divs = refs[pos : pos + n_div]; pos += n_div
        t23s = refs[pos : pos + n_div]; pos += n_div
        acc_s = refs[pos]; pos += 1
        acc_c = refs[pos]; pos += 1

        it = iter(ins)
        xg, xs = next(it), next(it)
        mg, ms = (next(it), next(it)) if has_m else (None, None)
        zg, zs = (next(it), next(it)) if has_z else (None, None)
        yg, ys = (next(it), next(it)) if has_y else (None, None)
        jt = iter(divs)
        t3, t3s = next(jt), next(jt)
        z3, z3s = (next(jt), next(jt)) if has_z else (None, None)
        kt = iter(t23s)
        tF, tFs = next(kt), next(kt)
        tZ, tZs = (next(kt), next(kt)) if has_z else (None, None)

        t = pl.program_id(0)
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            acc_s[:] = jnp.zeros_like(acc_s)
            acc_c[:] = jnp.zeros_like(acc_c)

        eo = eo_ref[t]
        dvv3 = dvv[:][None]  # (1, v, v): ev[b] + ev[c]

        # ---- divisions by the S3-symmetric denominator, 8-row blocks.
        # Association (eo - ev[a]) - dvv matches the validated kernels;
        # the swap layouts divide by the SAME formula (D is symmetric,
        # the panel axis just carries the b role there).  Padded panel
        # rows carry ev = 1e3 (finite D) and zero numerators.
        def div(dst, src):
            def body(b, c):
                sl = pl.ds(b * 8, 8)
                evb = evc[sl, :].reshape(8, 1, 1)
                dst[sl] = src[0, sl] / ((eo - evb) - dvv3)
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(PA // 8), body,
                              jnp.int32(0))

        div(t3, xg)
        div(t3s, xs)
        if has_z:
            div(z3, zg)
            div(z3s, zs)

        # ---- last-two-axis transposes of the F family (shared by all
        # G rows of the product table)
        tF[:] = jnp.transpose(t3[:], (0, 2, 1))
        tFs[:] = jnp.transpose(t3s[:], (0, 2, 1))
        if has_z:
            tZ[:] = jnp.transpose(z3[:], (0, 2, 1))
            tZs[:] = jnp.transpose(z3s[:], (0, 2, 1))

        # ---- the 36 twisted products, 8-row blocks, reduced over the
        # b axis into (8, v) lane grids.  Coefficients are M's class
        # sums (8, -4, 2) — integers, exact in f32.
        # (G, Gsw, F, Fsw, T23F, T23Fsw, active) per sum slot:
        pairs = (
            (xg, xs, t3, t3s, tF, tFs, True),
            (xg, xs, z3, z3s, tZ, tZs, has_z),
            (yg, ys, t3, t3s, tF, tFs, has_y),
            (yg, ys, z3, z3s, tZ, tZs, has_y and has_z),
            (mg, ms, t3, t3s, tF, tFs, has_m),
            (mg, ms, z3, z3s, tZ, tZs, has_m and has_z),
        )

        def blocks(b, grids):
            sl = pl.ds(b * 8, 8)
            out = []
            for (G, Gs, F, Fs, TF, TFs, on), grid in zip(pairs, grids):
                if not on:
                    out.append(grid)
                    continue
                g = G[0, sl]       # fetched input blocks are (1, PA, v, v)
                gs = Gs[0, sl]
                f = F[sl]          # scratch slabs are (PA, v, v)
                fs = Fs[sl]
                tf = TF[sl]
                tfs = TFs[sl]
                term = jnp.float32(8.0) * jnp.sum(g * f, axis=1)
                term += jnp.float32(-4.0) * jnp.sum(g * tf, axis=1)   # T_bc
                term += jnp.float32(-4.0) * jnp.sum(g * fs, axis=1)   # T_ab
                term += jnp.float32(-4.0) * jnp.sum(gs * tfs, axis=1)  # T_ac
                term += jnp.float32(2.0) * jnp.sum(g * tfs, axis=1)   # T_c2
                term += jnp.float32(2.0) * jnp.sum(tf * gs, axis=1)   # T_c1
                out.append(grid + term)
            return tuple(out)

        z8 = jnp.zeros((8, v), f32)
        grids = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(PA // 8), blocks, (z8,) * 6
        )

        # ---- Kahan-accumulate the per-slab grids across a-panels (the
        # compensation rides in scratch; see triples_pallas._ksum)
        for s, grid in enumerate(grids):
            y_ = grid - acc_c[s]
            t_ = acc_s[s] + y_
            acc_c[s] = (t_ - acc_s[s]) - y_
            acc_s[s] = t_

        @pl.when(p == NP - 1)
        def _():
            for s in range(6):
                out_ref[0, s] = acc_s[s] + acc_c[s]

    return kernel


def _pallas_partials(cubes: dict, eo_sum, evp_col, dvv, *, v: int, PA: int,
                     has_z: bool, has_y: bool, has_m: bool,
                     interpret: bool):
    """Stage 2 dispatch: (B, 6, 8, v) f32 per-triple partial grids."""
    B = eo_sum.shape[0]
    npa = evp_col.shape[0]
    NP = npa // PA

    names = ["x"]
    if has_m:
        names.append("m")
    if has_z:
        names.append("z")
    if has_y:
        names.append("y")
    inputs = []
    in_specs = []
    slab = lambda: pl.BlockSpec(
        (1, PA, v, v), lambda t, p, *_: (t, p, 0, 0),
        memory_space=pltpu.VMEM,
    )
    for n in names:
        inputs += [cubes[n + "g"], cubes[n + "s"]]
        in_specs += [slab(), slab()]
    in_specs.append(
        pl.BlockSpec((PA, 1), lambda t, p, *_: (p, 0),
                     memory_space=pltpu.VMEM)
    )
    inputs.append(evp_col)
    in_specs.append(
        pl.BlockSpec((v, v), lambda t, p, *_: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    inputs.append(dvv)

    n_div = 2 * (1 + has_z)
    scratch = (
        [pltpu.VMEM((PA, v, v), jnp.float32)] * (2 * n_div)
        + [pltpu.VMEM((6, 8, v), jnp.float32)] * 2
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # eo_sum (B,)
        grid=(B, NP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 6, 8, v), lambda t, p, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            _tiled_kernel(v, PA, NP, has_z, has_y, has_m),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, 6, 8, v), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(eo_sum, *inputs)


@partial(
    jax.jit,
    static_argnames=(
        "nocc", "doing_T", "doing_R", "doing_CR", "B", "PA", "interpret"
    ),
)
def triples_tiled_spatial(
    t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v, Iv, Jo, ii, jj, kk, w,
    *, nocc: int, doing_T: bool, doing_R: bool, doing_CR: bool,
    B: int = 8, PA: int = 16, interpret: bool | None = None,
):
    """All six sorted-triple reductions as ONE compiled program: a
    lax.scan over chunks of B sorted triples, each chunk = batched XLA
    numerator GEMMs (stage 1) + the tiled Pallas M-finale (stage 2).

    (ii, jj, kk, w): the sorted-triple plan (strict_spatial_plan),
    padded to a multiple of B with zero-weight entries by the caller.
    Returns the six f64 totals in _SUM_KEYS order."""
    if interpret is None:
        interpret = not _on_tpu()
    has_z, has_y, has_m = doing_T, (doing_R or doing_CR), doing_CR
    o, v = t1.shape
    f32 = jnp.float32
    PA = min(PA, -(-v // 8) * 8)
    npa = -(-v // PA) * PA

    # chunk-invariant f32 operand tables (the fused kernel's layouts,
    # minus the 128-lane padding it needed for layout-free reshapes —
    # the batched einsums here have no such constraint)
    t2f = t2.astype(f32)
    VvF = jnp.transpose(v_vvov.astype(f32), (2, 3, 1, 0))   # [k, f, b, c]
    VoL = v_oovo.astype(f32)                                # [p, q, y, m]
    t2M2 = jnp.transpose(t2f, (1, 0, 3, 2))                 # [x, m, b, a]
    Wm = v_oovv.astype(f32)
    t1f = t1.astype(f32)
    IvF = jnp.transpose(Iv.astype(f32), (1, 0, 2, 3)) if has_m else t2f
    JoT = jnp.transpose(Jo.astype(f32), (0, 1, 3, 2)) if has_m else VoL

    evp = jnp.pad(e_v.astype(f32), (0, npa - v), constant_values=1e3)
    evp_col = evp.reshape(npa, 1)
    dvv = (e_v[:, None] + e_v[None, :]).astype(f32)

    ntrip = ii.shape[0]
    assert ntrip % B == 0, "caller pads the plan to a B multiple"
    nchunk = ntrip // B
    eo = e_o.astype(jnp.float64)

    def body(carry, chunk):
        ci, cj, ck, cw = chunk
        cubes = _chunk_cubes(
            t2f, VvF, VoL, t2M2, IvF, JoT, Wm, t1f, ci, cj, ck,
            has_z=has_z, has_y=has_y, has_m=has_m, npa=npa,
        )
        eo_sum = (eo[ci] + eo[cj] + eo[ck]).astype(f32)
        parts = _pallas_partials(
            cubes, eo_sum, evp_col, dvv, v=v, PA=PA,
            has_z=has_z, has_y=has_y, has_m=has_m, interpret=interpret,
        )
        # (B, 6, 8, v) f32 grids -> f64 per-triple sums -> orbit weights.
        # Grid slots are ~1e-5-scale f32 partials (ulp ~1e-12): the f64
        # grid sum is exact at the contract scale (see the fused
        # kernel's export comment).
        sums = jnp.sum(parts.astype(jnp.float64), axis=(2, 3))  # (B, 6)
        contrib = jnp.sum(sums * cw[:, None], axis=0)           # (6,)
        return carry + contrib, None

    init = jnp.zeros((6,), jnp.float64)
    chunks = tuple(
        x.reshape(nchunk, B)
        for x in (
            ii.astype(jnp.int32), jj.astype(jnp.int32),
            kk.astype(jnp.int32), jnp.asarray(w),
        )
    )
    totals, _ = jax.lax.scan(body, init, chunks)
    return tuple(totals[s] for s in range(6))
