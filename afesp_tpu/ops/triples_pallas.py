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


def _ksum(acc, term):
    """Kahan compensated add: acc = (sum, compensation).  The per-plane
    partial sums are same-signed, so a plain sequential f32 accumulation
    over the a-loop grows error ~linearly in v (measured 2.5e-8 on the
    stretched-N2 spatial golden); compensation brings it back to
    per-plane rounding (~1e-9).  XLA does not reassociate f32 adds, so
    the (t - s) - y cancellation survives compilation."""
    s, c = acc
    y = term - c
    t = s + y
    return t, (t - s) - y


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
            return _ksum(acc, jnp.sum(xpa * wa / d_a))

        # i32 loop bounds: under x64 plain ints make an i64 counter
        z = jnp.float32(0.0)
        s, c = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(x.shape[0]), body, (z, z)
        )
        return s + c

    v = x.shape[0]
    partial_sum = pl.run_scoped(
        scoped,
        xp_s=pltpu.VMEM((v, v, v), jnp.float32),
        w_s=pltpu.VMEM((v, v, v), jnp.float32),
    )
    out_ref[pl.ds(row, 1), :] = jnp.full((1, 128), partial_sum, jnp.float32)


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _make_spatial_kernel(has_z: bool, has_y: bool, has_m: bool):
    """Spatial-triples finale kernel body (see triples_finale_spatial)."""

    def kernel(eo_ref, t1i_ref, ev_ref, x_ref, *rest):
        if has_m:
            m_ref, mats_ref, vecs_ref, dvv_ref, out_ref = rest
        else:
            m_ref = None
            mats_ref, vecs_ref, dvv_ref, out_ref = rest
        p = pl.program_id(0)
        row = jax.lax.rem(p, jnp.int32(8))

        @pl.when(row == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dvv = dvv_ref[:]  # (v, v): ev[b] + ev[c]
        eo = eo_ref[p]  # e_i + e_j + e_k for this panel
        v = x_ref.shape[1]

        t1j = vecs_ref[0, 0:1, :]  # (1, v)
        t1k = vecs_ref[0, 1:2, :]  # (1, v)
        t1j_c = jnp.transpose(t1j, (1, 0))  # (v, 1)

        def xbar(t):
            # make_x_bar (ccsd.f90:2313-2318) on a (v,v,v) value:
            # 4/3 t[abc] - 2 t[acb] + 2/3 t[bca].  Computed as the exact
            # integer-coefficient numerator 4t - 6t' + 2t''; the common
            # 1/3 is applied to the six (bilinear-in-one-barred-factor)
            # sums in f64 OUTSIDE the kernel — f32(4/3)/f32(2/3) would
            # bias every t_bar element coherently by ~3e-8 relative,
            # which was the dominant error of the first version
            return (
                jnp.float32(4.0) * t
                - jnp.float32(6.0) * jnp.transpose(t, (0, 2, 1))
                + jnp.float32(2.0) * jnp.transpose(t, (2, 0, 1))
            )

        def scoped(t3_s, tb_s, zb_s):
            # t3 = t3_D / D, one a-plane at a time (Mosaic cannot lower
            # the leading-axis 1-D->3-D broadcast of the denominator)
            def bt3(a, c):
                d_a = (eo - ev_ref[a]) - dvv
                t3_s[pl.ds(a, 1)] = x_ref[0, pl.ds(a, 1)] / d_a[None]
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(v), bt3, jnp.int32(0))
            tb_s[:] = xbar(t3_s[:])

            if has_z:
                # z3 = P-sum of t1 (x) oovv outer products / D
                # (Piecuch Eq. 60; ccsd.f90:2178-2179), built in VMEM from
                # the (v,v) panels — never materialised in HBM
                def bz3(a, c):
                    d_a = (eo - ev_ref[a]) - dvv
                    wjk = mats_ref[0, 0]  # v_oovv[j,k]      (v,v) [b,c]
                    wik_a = mats_ref[0, 1, pl.ds(a, 1), :]  # (1,v) [c]
                    wij_a = mats_ref[0, 2, pl.ds(a, 1), :]  # (1,v) [b]
                    plane = (
                        t1i_ref[a] * wjk
                        + t1j_c * wik_a
                        + jnp.transpose(wij_a, (1, 0)) * t1k
                    )
                    t3_s[pl.ds(a, 1)] = (plane / d_a)[None]
                    return c

                jax.lax.fori_loop(jnp.int32(0), jnp.int32(v), bz3, jnp.int32(0))
                zb_s[:] = xbar(t3_s[:])

            jk_outer = t1j_c * t1k  # (v,v): t1[j,b] t1[k,c]

            def accb(a, sums):
                s0, s1, s2, s3, s4, s5 = sums
                xa = x_ref[0, pl.ds(a, 1)][0]  # (v,v)
                tba = tb_s[pl.ds(a, 1)][0]
                s0 = _ksum(s0, jnp.sum(tba * xa))
                zba = None
                if has_z:
                    zba = zb_s[pl.ds(a, 1)][0]
                    s1 = _ksum(s1, jnp.sum(zba * xa))
                if has_y:
                    # y plane (Piecuch Eq. 66; ccsd.f90:2183-2184)
                    ujk = mats_ref[0, 3]  # t2[j,k]   (v,v) [b,c]
                    uik_a = mats_ref[0, 4, pl.ds(a, 1), :]  # t2[i,k][a,:] (1,v)
                    uij_a = mats_ref[0, 5, pl.ds(a, 1), :]  # t2[i,j][a,:] (1,v)
                    ya = (
                        t1i_ref[a] * (jk_outer + ujk)
                        + t1j_c * uik_a
                        + jnp.transpose(uij_a, (1, 0)) * t1k
                    )
                    s2 = _ksum(s2, jnp.sum(tba * ya))
                    if has_z:
                        s3 = _ksum(s3, jnp.sum(zba * ya))
                if has_m:
                    ma = m_ref[0, pl.ds(a, 1)][0]
                    s4 = _ksum(s4, jnp.sum(tba * ma))
                    if has_z:
                        s5 = _ksum(s5, jnp.sum(zba * ma))
                return (s0, s1, s2, s3, s4, s5)

            z = jnp.float32(0.0)
            pairs = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(v), accb, ((z, z),) * 6
            )
            return tuple(s + c for s, c in pairs)

        scratch = dict(
            t3_s=pltpu.VMEM((v, v, v), jnp.float32),
            tb_s=pltpu.VMEM((v, v, v), jnp.float32),
            zb_s=pltpu.VMEM((v, v, v) if has_z else (8, 8, 128), jnp.float32),
        )
        sums = pl.run_scoped(scoped, **scratch)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rowv = jnp.zeros((1, 128), jnp.float32)
        for idx, s in enumerate(sums):
            rowv = jnp.where(lane == jnp.int32(idx), s, rowv)
        out_ref[pl.ds(row, 1), :] = rowv

    return kernel


@partial(
    jax.jit, static_argnames=("doing_T", "doing_Y", "doing_CR", "interpret")
)
def triples_finale_spatial(
    t3_D,
    m3,
    mats,
    vecs,
    eo_sum,
    t1_i,
    e_v,
    *,
    doing_T: bool,
    doing_Y: bool,
    doing_CR: bool,
    interpret: bool | None = None,
):
    """Fused spatial-triples tail (ccsd.f90:2151-2237 per-(i,j,k) loop):
    t3 = t3_D/D, t_bar = xbar(t3), z3/z3_bar and y built in VMEM from
    their (v,v)/(v,) factors, and the six reductions

        s0 = sum t_bar*t3_D   s1 = sum z3_bar*t3_D
        s2 = sum t_bar*y      s3 = sum z3_bar*y
        s4 = sum t_bar*m3     s5 = sum z3_bar*m3

    in one VMEM pass per (j,k) panel — nothing but the GEMM outputs
    (t3_D, m3) ever touches HBM.

    t3_D/m3: (P, v, v, v) f32 (m3 ignored unless doing_CR);
    mats: (P, 6, v, v) f32 rows [v_oovv[j,k], v_oovv[i,k], v_oovv[i,j],
    t2[j,k], t2[i,k], t2[i,j]]; vecs: (P, 2, v) f32 rows [t1[j], t1[k]];
    eo_sum: (P,) f32 e_i+e_j+e_k; t1_i, e_v: (v,) f32.
    Returns six f64 sums (zeros for disabled variants)."""
    P, v = t3_D.shape[0], t3_D.shape[1]
    if interpret is None:
        interpret = not _on_tpu()
    rows = -(-P // 8) * 8
    has_z, has_y, has_m = doing_T, doing_Y, doing_CR

    panel_spec = pl.BlockSpec(
        (1, v, v, v), lambda p, *_: (p, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [panel_spec]
    inputs = [t3_D]
    if has_m:
        in_specs.append(panel_spec)
        inputs.append(m3)
    in_specs += [
        pl.BlockSpec(
            (1, 6, v, v), lambda p, *_: (p, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, 2, v), lambda p, *_: (p, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((v, v), lambda p, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [mats, vecs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # eo_sum (P,), t1_i (v,), e_v (v,)
        grid=(P,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, 128), lambda p, *_: (p // 8, 0), memory_space=pltpu.VMEM
        ),
    )
    dvv = (e_v[:, None] + e_v[None, :]).astype(jnp.float32)
    # x64 OFF for tracing (see triples_finale)
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _make_spatial_kernel(has_z, has_y, has_m),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            eo_sum,
            t1_i.astype(jnp.float32),
            e_v.astype(jnp.float32),
            *inputs,
            dvv,
        )
    # each sum is bilinear with exactly one xbar'd factor: fold the
    # deferred 1/3 back in here, in f64
    return tuple(
        jnp.sum(partials[:P, i], dtype=jnp.float64) / 3.0 for i in range(6)
    )


def _fused_kernel(o: int, v: int, vp: int, mp: int):
    """Kernel body for triples_fused (closure over the static dims).

    r3 rework (VERDICT #5 — amortise per-triple issue cost): the
    disconnected t3d is ONE K=3 MXU dot (t1 columns x W rows) instead of
    a v-iteration per-plane VPU loop, and the energy reduction runs as
    whole-array VMEM passes against a PRECOMPUTED denominator cube
    (d3_s[a,b,c] = ev[a]+ev[b]+ev[c], built once at p==0) instead of a
    second v-iteration loop — per-plane (1,128,128) ops use 1/8 of the
    sublanes and pay per-op issue ~106x per triple.  The h-combination
    reuses two scratch buffers (h_s, tmp_s) instead of materialising
    all four permutations, freeing the VMEM the denominator cube needs."""
    f32 = jnp.float32

    def kernel(
        ii_ref, jj_ref, kk_ref, eo_ref, ev_ref, t1_ref,  # scalar prefetch
        t2a_jk, t2a_ik, t2a_ji,
        ovA_jk, ovA_ik, ovA_ji,
        vFM_i, vFM_j, vFM_k,
        W_jk, W_ik, W_ij,
        t1v_ref,
        dvv_ref,
        out_ref,
        t3_s, s_s, h_s, tmp_s, d3_s,
    ):
        p = pl.program_id(0)
        row = jax.lax.rem(p, jnp.int32(8))

        @pl.when(row == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(p == 0)
        def _():
            # denominator cube: ev[a] + ev[b] + ev[c].  Padded planes
            # carry ev=1e3 so every padded denominator is finite; and
            # x (= t3c) is exactly zero there, so they contribute 0.
            def dbody(a, c):
                d3_s[pl.ds(a, 1)] = (ev_ref[a] + dvv_ref[:])[None]
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(vp), dbody, jnp.int32(0))

        def dot2(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        # ---- the connected-numerator GEMMs, VMEM-resident ----
        # x[a, b*vp+c] = t3c[a,b,c] (P(i/jk) rows, ccsd.f90:1883-1890).
        # The f-sum (K=v) and m-sum (K=o) contractions pair the SAME
        # (occ-pair, third-index) combinations, so each pair fuses into
        # one K-concatenated MXU dot: rhs rows [vovv[f,x,b,c]; t2[m,x,b,c]]
        # (vFM, built host-side), lhs cols [t2[p,q,a,f] | ovoo->(a,m)].
        # Signs ride on the small lhs operands so every statement is a
        # pure accumulation (read-modify-write `s - dot` chains ablated
        # ~7 ms slower).  The (vp, vp^2) -> (vp, vp, vp) reshape is
        # layout-free because vp is a multiple of the 128-lane tile.
        # m-sums enter with flipped sign via t2 antisymmetry in (b,c):
        # sum_m t2[m,i,c,b] <ma||jk> = -sum_m t2[m,i,b,c] <ma||jk>
        lhs_jk = jnp.concatenate([t2a_jk[0, 0], ovA_jk[0, 0]], axis=1)
        lhs_ik = jnp.concatenate([t2a_ik[0, 0], ovA_ik[0, 0]], axis=1)
        lhs_ji = jnp.concatenate([t2a_ji[0, 0], ovA_ji[0, 0]], axis=1)
        t3_s[:] = dot2(lhs_jk, vFM_i[0]).reshape(vp, vp, vp)
        t3_s[:] += dot2(-lhs_ik, vFM_j[0]).reshape(vp, vp, vp)
        t3_s[:] += dot2(-lhs_ji, vFM_k[0]).reshape(vp, vp, vp)

        # ---- s = t3c + t3d with t3d as ONE K=3 MXU dot ----
        # t3d[a, bc] = t1[i,a] W_jk[bc] - t1[j,a] W_ik[bc] + t1[k,a] W_ij[bc]
        #            = [t1i | -t1j | t1k](a, 3) @ [W_jk; W_ik; W_ij](3, bc)
        # (W rows arrive pre-flattened (1, vp^2) from the host-side
        # reshape, so no in-kernel sublane->lane relayout is needed)
        i = ii_ref[p]
        j = jj_ref[p]
        k = kk_ref[p]
        t1cols = jnp.concatenate(
            [
                jnp.transpose(t1v_ref[pl.ds(i, 1), :], (1, 0)),
                -jnp.transpose(t1v_ref[pl.ds(j, 1), :], (1, 0)),
                jnp.transpose(t1v_ref[pl.ds(k, 1), :], (1, 0)),
            ],
            axis=1,
        )  # (vp, 3)
        wrows = jnp.concatenate(
            [W_jk[0, 0], W_ik[0, 0], W_ij[0, 0]], axis=0
        )  # (3, vp^2)
        s_s[:] = t3_s[:] + dot2(t1cols, wrows).reshape(vp, vp, vp)

        # ---- energy: sum x * (P^2 s) / D  with P = I - T_ab - T_ac ----
        # P self-adjoint, D fully symmetric => sum P(x) P(s) / D
        #   = sum x * (3 s - 2 s_bac - 2 s_cba + s_cab + s_bca) / D.
        # Whole-array VMEM transposes (~2.5 us each) + whole-array
        # elementwise/reduce passes; h accumulates through tmp_s so only
        # two scratch buffers are live instead of four permuted copies.
        h_s[:] = jnp.float32(3.0) * s_s[:]
        tmp_s[:] = jnp.transpose(s_s[:], (1, 0, 2))  # s_bac
        h_s[:] += jnp.float32(-2.0) * tmp_s[:]
        tmp_s[:] = jnp.transpose(s_s[:], (2, 1, 0))  # s_cba
        h_s[:] += jnp.float32(-2.0) * tmp_s[:]
        tmp_s[:] = jnp.transpose(s_s[:], (2, 0, 1))  # s_cab ([a,b,c]->[c,a,b])
        h_s[:] += tmp_s[:]
        tmp_s[:] = jnp.transpose(s_s[:], (1, 2, 0))  # s_bca
        h_s[:] += tmp_s[:]

        eo = eo_ref[p]
        # Mosaic cannot reduce a whole (vp,vp,vp) value (relayout check
        # fails) — materialise the product and reduce in 8-plane blocks
        # (16 iterations vs the previous per-plane loop's 106, each a
        # full-sublane (8,128,128) pass).  Conditioning is equivalent to
        # the previous per-plane Kahan chain at these magnitudes
        # (validated vs the 1e-8 goldens).
        tmp_s[:] = t3_s[:] * h_s[:] / (eo - d3_s[:])

        def rbody(b, acc):
            blk = tmp_s[pl.ds(b * 8, 8)]
            return acc + jnp.sum(jnp.sum(blk, axis=0))

        total = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(vp // 8), rbody, jnp.float32(0.0)
        )
        out_ref[pl.ds(row, 1), :] = jnp.full((1, 128), total, f32)

    return kernel


# Static term tables for the fused spatial kernel: the twelve joint
# (occ,virt) permutations of the two base contractions (ccsd.f90:2168-
# 2173 / 2188-2193).  Each entry: (lhs pair roles, rhs third role, axes
# permutation applied to the raw dot output before accumulation).
# Roles: 0=i, 1=j, 2=k.  Derivation in tools/ + validated to 3e-13
# against _triples_total_spatial on random data.
_ID = (0, 1, 2)
_SPATIAL_F_TERMS = (  # lhs t2[p,q] (a,f) @ rhs VvF/IvF[r] (f, b*c)
    ((0, 1), 2, _ID),
    ((1, 0), 2, (1, 0, 2)),
    ((2, 1), 0, (2, 1, 0)),
    ((0, 2), 1, (0, 2, 1)),
    ((1, 2), 0, (2, 0, 1)),
    ((2, 0), 1, (1, 2, 0)),
)
_SPATIAL_M_TERMS = (  # lhs VoL[r,q] (c,m) @ rhs t2M2[x] (m, b*a), sign -1
    ((2, 1), 0, (1, 2, 0)),
    ((2, 0), 1, (2, 1, 0)),
    ((0, 1), 2, (0, 2, 1)),
    ((1, 2), 0, (1, 0, 2)),
    ((0, 2), 1, _ID),
    ((1, 0), 2, (2, 0, 1)),
)
_SPATIAL_M3M_TERMS = (  # lhs JoT[p,q] (c,m) @ rhs t2M2[x] (m, b*a), sign -1
    ((1, 2), 0, (1, 2, 0)),
    ((0, 2), 1, (2, 1, 0)),
    ((1, 0), 2, (0, 2, 1)),
    ((2, 1), 0, (1, 0, 2)),
    ((2, 0), 1, _ID),
    ((0, 1), 2, (2, 0, 1)),
)
_T2A_PAIRS = ((0, 1), (1, 0), (2, 1), (0, 2), (1, 2), (2, 0))
_VOL_PAIRS = tuple(t[0] for t in _SPATIAL_M_TERMS)
_JOT_PAIRS = tuple(t[0] for t in _SPATIAL_M3M_TERMS)
_WVV_PAIRS = ((1, 2), (0, 2), (0, 1))


def _fused_spatial_kernel(o: int, v: int, vp: int, mp: int, has_m: bool):
    """Kernel body for triples_fused_spatial.

    Per sorted triple (i<=j<=k): the 12 t3_D dots (6 f-type K=v, 6
    m-type K=o) and, for CR, the 12 m3 dots accumulate VMEM-resident
    (vp,vp,vp) panels via transposed adds; the conjugacy-class operator

        M = 8 I - 4 (T_ab + T_ac + T_bc) + 2 (C + C^2)

    turns the full-cube xbar reductions into sorted-triple ones
    (sum_{S3 orbit} e = sum w3 (.) M(u3), exact — see
    methods/triples_spatial.strict_spatial_plan), and the six sums

        s0 = t3_D.Mt3  s1 = t3_D.Mz3  s2 = y.Mt3
        s3 = y.Mz3     s4 = m3.Mt3    s5 = m3.Mz3

    reduce in 8-plane blocks.  The big VvF/IvF operands stay in HBM
    and are manually DMA'd into single-buffered scratch only when their
    occupied index changes (auto double-buffering of six 8.4 MB blocks
    would not fit VMEM next to the panel scratches).

    r5 rework (recovers the ~31 MB VMEM regression a serving-stack
    update's register-spill accounting caused — the r4 dimer ran 396 KB
    over the 128 MB budget and degraded to the slab tier): the five
    cube scratches become THREE via a buffer rotation.  Phase A: t3 =
    x/D (the same element-rounding draw as the r2-validated kernel),
    M(t3), s0/s2; then x is dead, so its buffer is REBUILT as m3 and
    s4 reduces while M(t3) is live.  Phase B: the M buffer becomes
    M(z3num) — UNDIVIDED — via nine per-triple (vp, vp) combo matrices
    (M applied to z3's rank-structured numerator term-by-term: each S3
    image of t1 (x)_axis W is again vector (x) matrix, so M(z3num)
    groups into three vector-axis families with +-{8,4,2}-weighted
    W/W^T combos); because D is S3-symmetric, sum G.M(z3) =
    sum (G/D).M(z3num) exactly, so the division rides on the G side
    (t3 already held; m3/y divide block-wise on the fly) and s1/s3/s5
    reduce.  The y cube is never materialised — its 8-plane blocks are
    rebuilt on the fly from the same rank structure.  The z3/y rank-1
    MXU dots (and their large spilled value temporaries) are gone
    entirely.  Validated vs f64 at 1e-8 on the N2 CR golden
    (tests/test_triples_spatial.py)."""
    f32 = jnp.float32
    n_fetch = 6 if has_m else 3

    def kernel(*refs):
        (ii_ref, jj_ref, kk_ref, eo_ref, ev_ref) = refs[:5]
        pos = 5
        t2a = refs[pos : pos + 6]; pos += 6
        vol = refs[pos : pos + 6]; pos += 6
        if has_m:
            jot = refs[pos : pos + 6]; pos += 6
        t2m = refs[pos : pos + 3]; pos += 3
        wv = refs[pos : pos + 3]; pos += 3   # W pair blocks [jk, ik, ij]
        yv_jk = refs[pos]; pos += 1          # outer(t1j,t1k) + t2[j,k]
        u_ik = refs[pos]; pos += 1           # t2[i,k] pair block
        u_ij = refs[pos]; pos += 1           # t2[i,j] pair block
        t1v_ref = refs[pos]; pos += 1
        dvv_ref = refs[pos]; pos += 1
        evc_ref = refs[pos]; pos += 1
        vvf_hbm = refs[pos]; pos += 1
        if has_m:
            ivf_hbm = refs[pos]; pos += 1
        out_ref = refs[pos]; pos += 1
        # scratch: THREE cubes (x/m3 rotation, t3, M) + the 9 combo
        # mats + 3 t1 columns
        x_s = refs[pos]; pos += 1            # t3_D, later rebuilt as m3
        t3_s = refs[pos]; pos += 1           # t3 = t3_D / D
        M_s = refs[pos]; pos += 1            # M(t3), later M(z3num)
        cmb_s = refs[pos]; pos += 1          # (9, vp, vp)
        col_s = refs[pos]; pos += 1          # (vp, 3): t1 i/j/k columns
        fet = refs[pos : pos + n_fetch]; pos += n_fetch
        sems = refs[pos]

        p = pl.program_id(0)

        idx = (ii_ref[p], jj_ref[p], kk_ref[p])

        # ---- gated manual DMA: VvF[i/j/k] (and IvF) -> VMEM ----
        pm = jnp.maximum(p - 1, 0)
        prev = (ii_ref[pm], jj_ref[pm], kk_ref[pm])

        started = []
        for slot in range(n_fetch):
            which = slot % 3
            hbm = vvf_hbm if slot < 3 else ivf_hbm
            changed = jnp.logical_or(p == 0, idx[which] != prev[which])
            dma = pltpu.make_async_copy(
                hbm.at[idx[which]], fet[slot], sems.at[slot]
            )
            @pl.when(changed)
            def _(dma=dma):
                dma.start()
            started.append((changed, dma))
        for changed, dma in started:
            @pl.when(changed)
            def _(dma=dma):
                dma.wait()

        def dot2(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )

        # ---- cube GEMM builders (x = t3_D; for CR the SAME buffer is
        # rebuilt as m3 once x is dead — the buffer-rotation below needs
        # only three cubes where the r2-r4 kernel held five)
        def build_x(dst):
            first = True
            for t, ((pa, pb), r, perm) in enumerate(_SPATIAL_F_TERMS):
                raw = dot2(t2a[t][0, 0], fet[r][:]).reshape(vp, vp, vp)
                raw = raw if perm == _ID else jnp.transpose(raw, perm)
                if first:
                    dst[:] = raw
                    first = False
                else:
                    dst[:] += raw
            for t, ((pa, pb), r, perm) in enumerate(_SPATIAL_M_TERMS):
                raw = dot2(vol[t][0, 0], t2m[r][0]).reshape(vp, vp, vp)
                raw = raw if perm == _ID else jnp.transpose(raw, perm)
                dst[:] += -raw

        def build_m3(dst):
            first = True
            for t, ((pa, pb), r, perm) in enumerate(_SPATIAL_F_TERMS):
                raw = dot2(t2a[t][0, 0], fet[3 + r][:]).reshape(vp, vp, vp)
                raw = raw if perm == _ID else jnp.transpose(raw, perm)
                if first:
                    dst[:] = raw
                    first = False
                else:
                    dst[:] += raw
            for t, ((pa, pb), r, perm) in enumerate(_SPATIAL_M3M_TERMS):
                raw = dot2(jot[t][0, 0], t2m[r][0]).reshape(vp, vp, vp)
                raw = raw if perm == _ID else jnp.transpose(raw, perm)
                dst[:] += -raw

        build_x(x_s)

        eo = eo_ref[p]
        i, j, k = idx

        dvv3 = dvv_ref[:][None]  # (1, vp, vp), broadcast against cubes

        # ---- denominator division, in vp/8 full-sublane blocks ----
        # The association is (eo - ev[a]) - dvv — the SAME f32 rounding
        # draw as the validated per-plane kernel; ev[a] arrives as the
        # (vp,1) VMEM column evc_ref (a whole ev cube would blow the
        # 128M VMEM budget by exactly its 8M).  Padded planes carry
        # ev=1e3 (finite denominators); every cube built here is
        # exactly zero there (zero-padded operands), so padded entries
        # contribute 0 to the reductions.
        def div_blocks(dst, src):
            def body(b, c):
                sl = pl.ds(b * 8, 8)
                evb = evc_ref[sl, :].reshape(8, 1, 1)
                dst[sl] = src[sl] / ((eo - evb) - dvv3)
                return c

            jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(vp // 8), body, jnp.int32(0)
            )

        # ---- t1 i/j/k columns into sliceable scratch (8-block builds
        # below need dynamic (8,1) column windows; values cannot be
        # dynamically sliced in Mosaic, refs can)
        col_s[:, 0:1] = jnp.transpose(t1v_ref[pl.ds(i, 1), :], (1, 0))
        col_s[:, 1:2] = jnp.transpose(t1v_ref[pl.ds(j, 1), :], (1, 0))
        col_s[:, 2:3] = jnp.transpose(t1v_ref[pl.ds(k, 1), :], (1, 0))
        t1j_bc = col_s[:, 1:2][None]            # (1, vp, 1)
        t1k_cc = t1v_ref[pl.ds(k, 1), :][:, None, :]  # (1, 1, vp)

        def dblk(sl):
            evb = evc_ref[sl, :].reshape(8, 1, 1)
            return (eo - evb) - dvv3

        # ---- phase A: t3 = x/D (the SAME element-rounding draw as the
        # r2-validated kernel), M(t3), then s0/s2
        div_blocks(t3_s, x_s)

        def build_M(dst, src):
            dst[:] = jnp.float32(8.0) * src[:]
            dst[:] += jnp.float32(-4.0) * jnp.transpose(src[:], (1, 0, 2))
            dst[:] += jnp.float32(-4.0) * jnp.transpose(src[:], (0, 2, 1))
            dst[:] += jnp.float32(-4.0) * jnp.transpose(src[:], (2, 1, 0))
            dst[:] += jnp.float32(2.0) * jnp.transpose(src[:], (2, 0, 1))
            dst[:] += jnp.float32(2.0) * jnp.transpose(src[:], (1, 2, 0))

        build_M(M_s, t3_s)

        # y 8-plane block (Piecuch Eq. 66), rebuilt on the fly:
        # y[a,b,c] = t1[i,a] (outer(t1j,t1k)+t2[j,k])[b,c]
        #            + t1[j,b] t2[i,k][a,c] + t1[k,c] t2[i,j][a,b]
        def y_block(sl):
            ti8 = col_s[sl, 0:1].reshape(8, 1, 1)
            return (
                ti8 * yv_jk[0, 0][None]
                + t1j_bc * u_ik[0, 0, sl, :][:, None, :]
                + t1k_cc * u_ij[0, 0, sl, :][:, :, None]
            )

        # reductions in 8-plane blocks: each reduces only the lane axis
        # (128-element sums) and Kahan-accumulates the (8,128) partial
        # grid elementwise — compensation applied to 128-element
        # partials is strictly better conditioned than per-plane
        # 16k-element inner sums.
        z = jnp.zeros((8, 128), f32)

        def accA(b, acc):
            s0, s2 = acc
            sl = pl.ds(b * 8, 8)
            mt = M_s[sl]
            s0 = _ksum(s0, jnp.sum(x_s[sl] * mt, axis=1))
            s2 = _ksum(s2, jnp.sum(y_block(sl) * mt, axis=1))
            return (s0, s2)

        sA = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(vp // 8), accA, ((z, z),) * 2
        )

        # ---- CR: x is dead after s0 — rebuild its buffer as m3 and
        # take s4 = sum m3 . M(t3) while M(t3) is still live
        if has_m:
            build_m3(x_s)

            def accM(b, acc):
                sl = pl.ds(b * 8, 8)
                return _ksum(acc, jnp.sum(x_s[sl] * M_s[sl], axis=1))

            s4 = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(vp // 8), accM, (z, z)
            )
        else:
            s4 = (z, z)

        # ---- phase B: the SAME M buffer becomes M(z3num) — UNDIVIDED.
        # z3's numerator is rank-structured (t1 vector (x) W matrix per
        # axis), and every S3 image of such a term is again vector (x)
        # matrix — so M(z3num) collapses to three vector-axis families
        # with nine (vp, vp) combo matrices (W/W^T at M's class weights
        # 8/-4/2), built once per triple.  Because D is S3-symmetric,
        # sum G . M(z3) = sum (G/D) . M(z3num) EXACTLY (as reals): the
        # division rides on the G side, where t3 = x/D is already held
        # and m3/y divide block-wise on the fly.
        W1 = wv[0][0, 0]   # W[j,k]
        W2 = wv[1][0, 0]   # W[i,k]
        W3 = wv[2][0, 0]   # W[i,j]
        W1T = jnp.transpose(W1, (1, 0))
        W2T = jnp.transpose(W2, (1, 0))
        W3T = jnp.transpose(W3, (1, 0))
        c8, c4, c2 = jnp.float32(8.0), jnp.float32(-4.0), jnp.float32(2.0)
        cmb_s[0] = c8 * W1 + c4 * W1T   # A_i  (vector axis a)
        cmb_s[1] = c4 * W2 + c2 * W2T   # A_j
        cmb_s[2] = c2 * W3 + c4 * W3T   # A_k
        cmb_s[3] = c4 * W1 + c2 * W1T   # B_i  (vector axis b)
        cmb_s[4] = c8 * W2 + c4 * W2T   # B_j
        cmb_s[5] = c4 * W3 + c2 * W3T   # B_k
        cmb_s[6] = c2 * W1 + c4 * W1T   # C_i  (vector axis c)
        cmb_s[7] = c4 * W2 + c2 * W2T   # C_j
        cmb_s[8] = c8 * W3 + c4 * W3T   # C_k

        def mzn_block(b, c):
            sl = pl.ds(b * 8, 8)
            ti8 = col_s[sl, 0:1].reshape(8, 1, 1)
            tj8 = col_s[sl, 1:2].reshape(8, 1, 1)
            tk8 = col_s[sl, 2:3].reshape(8, 1, 1)
            xx = ti8 * cmb_s[0][None] + tj8 * cmb_s[1][None]
            xx += tk8 * cmb_s[2][None]
            # vector on b: vec (1,vp,1) x combo rows a in sl (8,1,vp)
            xx += (
                col_s[:, 0:1][None] * cmb_s[3, sl, :][:, None, :]
                + col_s[:, 1:2][None] * cmb_s[4, sl, :][:, None, :]
                + col_s[:, 2:3][None] * cmb_s[5, sl, :][:, None, :]
            )
            # vector on c: vec (1,1,vp) x combo rows a in sl (8,vp,1)
            xx += (
                t1v_ref[pl.ds(i, 1), :][:, None, :] * cmb_s[6, sl, :][:, :, None]
                + t1v_ref[pl.ds(j, 1), :][:, None, :] * cmb_s[7, sl, :][:, :, None]
                + t1v_ref[pl.ds(k, 1), :][:, None, :] * cmb_s[8, sl, :][:, :, None]
            )
            M_s[sl] = xx
            return c

        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(vp // 8), mzn_block, jnp.int32(0)
        )

        def accB(b, acc):
            s1, s3, s5 = acc
            sl = pl.ds(b * 8, 8)
            mzn = M_s[sl]
            d = dblk(sl)
            s1 = _ksum(s1, jnp.sum(t3_s[sl] * mzn, axis=1))
            s3 = _ksum(s3, jnp.sum((y_block(sl) / d) * mzn, axis=1))
            if has_m:
                s5 = _ksum(s5, jnp.sum((x_s[sl] / d) * mzn, axis=1))
            return (s1, s3, s5)

        sB = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(vp // 8), accB, ((z, z),) * 3
        )

        sums = (sA[0], sB[0], sA[1], sB[1], s4, sB[2])
        # Export the WHOLE (8,128) compensated partial grid per sum
        # (sum n -> lanes 128n..128n+127) instead of collapsing to one
        # f32 scalar: the collapse costs ~1 ulp(s) per triple and that
        # random walk across ~o^3/6 triples (~1.5e-8 at o=14) dominates
        # the kernel's total error.  Per-slot partials are ~1e-5-scale
        # (ulp ~1e-12), so the caller-side f64 grid sum is exact at the
        # contract scale.
        out_ref[0] = jnp.concatenate([s + c for (s, c) in sums], axis=1)

    return kernel


@partial(jax.jit, static_argnames=("has_m", "interpret"))
def triples_fused_spatial(
    t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v, Iv, Jo, ii, jj, kk,
    *, has_m: bool, interpret: bool | None = None
):
    """Fully-fused spatial triples over sorted (i<=j<=k) triples.

    Returns the six per-triple compensated PARTIAL GRIDS stacked as a
    (C, 8, 768) f32 array (sum n = [..., 128n:128(n+1)]); the caller
    f64-sums each grid and applies the f64 orbit weights (1, 1/2, 1/6)
    — see the kernel's export comment for why the per-triple scalar
    collapse was the error floor.  See _fused_spatial_kernel for the
    math; requires nvirt <= 128."""
    o, v = t1.shape
    assert v <= 128, "triples_fused_spatial requires nvirt <= 128"
    vp, mp = 128, -(-o // 8) * 8
    if interpret is None:
        interpret = not _on_tpu()
    f32 = jnp.float32
    pv, po = vp - v, mp - o

    t2f = t2.astype(f32)
    t2a = jnp.pad(t2f, ((0, 0), (0, 0), (0, pv), (0, pv)))
    t2M2 = jnp.pad(
        t2f.transpose(1, 0, 3, 2), ((0, 0), (0, po), (0, pv), (0, pv))
    ).reshape(o, mp, vp * vp)
    VvF = jnp.pad(
        v_vvov.astype(f32).transpose(2, 3, 1, 0),
        ((0, 0), (0, pv), (0, pv), (0, pv)),
    ).reshape(o, vp, vp * vp)
    VoL = jnp.pad(v_oovo.astype(f32), ((0, 0), (0, 0), (0, pv), (0, po)))
    Wvv = jnp.pad(v_oovv.astype(f32), ((0, 0), (0, 0), (0, pv), (0, pv)))
    if has_m:
        IvF = jnp.pad(
            Iv.astype(f32).transpose(1, 0, 2, 3),
            ((0, 0), (0, pv), (0, pv), (0, pv)),
        ).reshape(o, vp, vp * vp)
        JoT = jnp.pad(
            Jo.astype(f32).transpose(0, 1, 3, 2),
            ((0, 0), (0, 0), (0, pv), (0, po)),
        )
    t1v = jnp.pad(t1.astype(f32), ((0, 0), (0, pv)))
    # y's first-term matrix family (outer(t1,t1)+t2) as plain (vp, vp)
    # pair blocks — the r5 phased kernel consumes W/U matrices with
    # 8-row broadcasts, so the rank-1-dot flattened layouts are gone
    Yv = t1v[:, None, :, None] * t1v[None, :, None, :] + t2a
    evp = jnp.pad(e_v.astype(f32), (0, pv), constant_values=1e3)
    dvv = evp[:, None] + evp[None, :]
    eo_sum = (e_o[ii] + e_o[jj] + e_o[kk]).astype(f32)

    C = ii.shape[0]

    def pair_map(pa, pb):
        return lambda p, ii, jj, kk, *_: (
            (ii, jj, kk)[pa][p], (ii, jj, kk)[pb][p], 0, 0
        )

    def third_map(r):
        return lambda p, ii, jj, kk, *_: ((ii, jj, kk)[r][p], 0, 0)

    bs4 = lambda im: pl.BlockSpec((1, 1, vp, vp), im, memory_space=pltpu.VMEM)
    bsO = lambda im: pl.BlockSpec((1, 1, vp, mp), im, memory_space=pltpu.VMEM)
    bsM = lambda im: pl.BlockSpec((1, mp, vp * vp), im, memory_space=pltpu.VMEM)
    bsF = lambda im: pl.BlockSpec(
        (1, 1, 1, vp * vp), im, memory_space=pltpu.VMEM
    )

    in_specs = []
    inputs = []
    # t2a lhs pair blocks (order = _SPATIAL_F_TERMS lhs pairs)
    for t, ((pa, pb), r, perm) in enumerate(_SPATIAL_F_TERMS):
        in_specs.append(bs4(pair_map(pa, pb)))
        inputs.append(t2a)
    for (pa, pb) in _VOL_PAIRS:
        in_specs.append(bsO(pair_map(pa, pb)))
        inputs.append(VoL)
    if has_m:
        for (pa, pb) in _JOT_PAIRS:
            in_specs.append(bsO(pair_map(pa, pb)))
            inputs.append(JoT)
    for r in range(3):
        in_specs.append(bsM(third_map(r)))
        inputs.append(t2M2)
    for (pa, pb) in _WVV_PAIRS:
        in_specs.append(bs4(pair_map(pa, pb)))
        inputs.append(Wvv)
    # y-cube matrices: (outer+t2)[j,k], t2[i,k], t2[i,j]
    in_specs.append(bs4(pair_map(1, 2)))
    inputs.append(Yv)
    in_specs.append(bs4(pair_map(0, 2)))
    inputs.append(t2a)
    in_specs.append(bs4(pair_map(0, 1)))
    inputs.append(t2a)
    in_specs.append(
        pl.BlockSpec((o, vp), lambda p, *_: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(t1v)
    in_specs.append(
        pl.BlockSpec((vp, vp), lambda p, *_: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(dvv)
    in_specs.append(
        pl.BlockSpec((vp, 1), lambda p, *_: (0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(evp.reshape(vp, 1))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(VvF)
    if has_m:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(IvF)

    n_fetch = 6 if has_m else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # ii, jj, kk, eo_sum, evp
        grid=(C,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, 6 * 128), lambda p, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((vp, vp, vp), f32)] * 3
        + [pltpu.VMEM((9, vp, vp), f32), pltpu.VMEM((vp, 3), f32)]
        + [pltpu.VMEM((vp, vp * vp), f32)] * n_fetch
        + [pltpu.SemaphoreType.DMA((n_fetch,))],
    )
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _fused_spatial_kernel(o, v, vp, mp, has_m),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C, 8, 6 * 128), f32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            ii.astype(jnp.int32), jj.astype(jnp.int32), kk.astype(jnp.int32),
            eo_sum, evp,
            *inputs,
        )
    return partials


@partial(jax.jit, static_argnames=("interpret",))
def triples_fused(
    t1, t2, vovv, ovoo, oovv, e_o, e_v, ii, jj, kk, *, interpret: bool | None = None
):
    """Fully-fused spin-orbital triples: for each strict (i<j<k) triple,
    the six connected-numerator MXU GEMMs (ccsd.f90:1883-1890), the
    disconnected t1 outer products (1878), the P(a/bc) antisymmetrisation,
    denominator and energy reduction (1897-1910) all execute inside one
    Pallas kernel on VMEM-resident (v,v,v) panels — no t3 panel ever
    touches HBM (the XLA strict path's remaining wall, measured 32 ms of
    48 at pVTZ, is exactly that panel traffic).

    Virtual dims are padded to vp=128 so the MXU's (a, b*c) GEMM output
    reshapes to (a,b,c) panels without relayout; zero-padding is exact
    (padded operand entries are zero => padded panel entries are zero).
    Requires nvirt <= 128 (the committed spin-orbital fixtures; larger
    systems fall back to the strict+finale path).

    Returns sum over the given triples of P(t3c)(P(t3c)+P(t3d))/D — the
    caller applies the strict-grid 1/6 weight."""
    o, v = t1.shape
    assert v <= 128, "triples_fused requires nvirt <= 128"
    vp, mp = 128, -(-o // 8) * 8
    if interpret is None:
        interpret = not _on_tpu()
    f32 = jnp.float32
    pv, po = vp - v, mp - o

    t2f = t2.astype(f32)
    t2a = jnp.pad(t2f, ((0, 0), (0, 0), (0, pv), (0, pv)))
    vF = jnp.pad(
        vovv.astype(f32).transpose(1, 0, 2, 3),
        ((0, 0), (0, pv), (0, pv), (0, pv)),
    )
    # ovoo[m,a,j,k] -> (j,k,a,m) so the block is the (a,m) GEMM lhs
    ovA = jnp.pad(
        ovoo.astype(f32).transpose(2, 3, 1, 0), ((0, 0), (0, 0), (0, pv), (0, po))
    )
    t2M = jnp.pad(
        t2f.transpose(1, 0, 2, 3), ((0, 0), (0, po), (0, pv), (0, pv))
    )
    # one K-concatenated rhs per third-index: [vovv[f,x,:,:]; t2[m,x,:,:]]
    vFM = jnp.concatenate([vF, t2M], axis=1).reshape(o, vp + mp, vp * vp)
    # W rows pre-flattened to (o, o, 1, vp^2): the kernel consumes them
    # as (1, vp^2) rows of the t3d K=3 dot's rhs (in-kernel (vp,vp) ->
    # (1,vp^2) value reshapes would be sublane->lane relayouts; the unit
    # third axis satisfies the Mosaic block rule that the last two block
    # dims be tile-divisible or equal to the array dims)
    Wv = jnp.pad(oovv.astype(f32), ((0, 0), (0, 0), (0, pv), (0, pv)))
    Wflat = Wv.reshape(o, o, 1, vp * vp)
    t1v = jnp.pad(t1.astype(f32), ((0, 0), (0, pv)))
    t1flat = t1v.reshape(-1)
    evp = jnp.pad(e_v.astype(f32), (0, pv), constant_values=1e3)
    dvv = evp[:, None] + evp[None, :]
    eo_sum = (e_o[ii] + e_o[jj] + e_o[kk]).astype(f32)

    C = ii.shape[0]
    rows = -(-C // 8) * 8

    bs4 = lambda im: pl.BlockSpec((1, 1, vp, vp), im, memory_space=pltpu.VMEM)
    bsF = lambda im: pl.BlockSpec(
        (1, vp + mp, vp * vp), im, memory_space=pltpu.VMEM
    )
    bsA = lambda im: pl.BlockSpec((1, 1, vp, mp), im, memory_space=pltpu.VMEM)
    bsW = lambda im: pl.BlockSpec(
        (1, 1, 1, vp * vp), im, memory_space=pltpu.VMEM
    )
    # index maps receive (p, *prefetch_refs); triples select their blocks
    jk = lambda p, ii, jj, kk, *_: (jj[p], kk[p], 0, 0)
    ik = lambda p, ii, jj, kk, *_: (ii[p], kk[p], 0, 0)
    ji = lambda p, ii, jj, kk, *_: (jj[p], ii[p], 0, 0)
    jk3 = lambda p, ii, jj, kk, *_: (jj[p], kk[p], 0, 0)
    ik3 = lambda p, ii, jj, kk, *_: (ii[p], kk[p], 0, 0)
    ij3 = lambda p, ii, jj, kk, *_: (ii[p], jj[p], 0, 0)
    bi = lambda p, ii, jj, kk, *_: (ii[p], 0, 0)
    bj = lambda p, ii, jj, kk, *_: (jj[p], 0, 0)
    bk = lambda p, ii, jj, kk, *_: (kk[p], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # ii, jj, kk, eo_sum, evp, t1flat
        grid=(C,),
        in_specs=[
            bs4(jk), bs4(ik), bs4(ji),          # t2a lhs halves (a,f)
            bsA(jk), bsA(ik), bsA(ji),          # ovoo lhs halves (a,m)
            bsF(bi), bsF(bj), bsF(bk),          # K-concat rhs (f+m, b*c)
            bsW(jk3), bsW(ik3), bsW(ij3),       # oovv W rows (1, vp^2)
            pl.BlockSpec((o, vp), lambda p, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, vp), lambda p, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda p, *_: (p // 8, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((vp, vp, vp), f32)] * 5,
    )
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _fused_kernel(o, v, vp, mp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), f32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            ii.astype(jnp.int32), jj.astype(jnp.int32), kk.astype(jnp.int32),
            eo_sum, evp, t1flat,
            t2a, t2a, t2a,
            ovA, ovA, ovA,
            vFM, vFM, vFM,
            Wflat, Wflat, Wflat,
            t1v,
            dvv,
        )
    return jnp.sum(partials[:C, 0], dtype=jnp.float64)


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
