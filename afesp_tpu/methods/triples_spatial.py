"""Spatial perturbative-triples family: CCSD[T], CCSD(T), R-CCSD[T]/(T),
CR-CCSD[T]/(T) — Piecuch et al., CPC 149 (2002) 71-96.

Re-implements do_ccsd_t_spatial (ccsd.f90:2018-2293) and
build_cr_ccsd_t_intermediates (ccsd.f90:2338-2551).

The reference computes per-(i,j,k) nvirt^3 panels in thread-private
buffers (the Rendell batched-triples strategy).  Here the whole
(i,j,k,a,b,c) tensor is produced by two einsums plus six joint
(occ,virt) transpositions and reduced on device; occupied-index batching
(`i_block`) bounds the O(o^3 v^3) transients so the same code path scales
to larger systems.

Faithfulness notes (quirks reproduced deliberately, see ccsd.f90):
  * I_ooov'' inner sum over the *virtual* index e runs only to nocc
    (ccsd.f90:2535 `do e = 1, nocc`) — reproduced for bit-parity with the
    committed CR energies.
  * build_cr_ccsd_t_intermediates consumes I_vo and asym_t2 computed from
    the amplitudes at the *start* of the final CCSD iteration (the
    routine reuses cc_int buffers from update_restricted_intermediates,
    ccsd.f90:2364-2377) — the caller passes t1_prev/t2_prev for this.
  * make_x_bar uses the paper's Eq. 55 form (ccsd.f90:2313-2318); the
    GAMESS-derived alternative remains commented out upstream.

Deviation (documented + switchable): the reference only forms z3_bar
when a renormalised variant is requested (ccsd.f90:2211-2215), so its
*plain* CCSD(T)_spatial silently reduces to CCSD[T].  By default we
always form z3_bar when the (T) variant is on (the correct Piecuch
Eq. 60 behaviour); `ccsd_t_spatial_bug_compat = .true.` in els.in
reproduces the reference output exactly (tests/test_triples_spatial.py
documents both numbers).  For every committed fixture (all CR runs) the
two behaviours coincide.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io import dat
from ..io.report import Reporter
from .ccsd_spatial import CCSDResult, Slices


@dataclasses.dataclass
class TriplesResult:
    e_ccsd_t: float = 0.0  # CCSD[T] total correlation-corrected (e_ccsd + e_T)
    e_ccsd_tt: float = 0.0  # CCSD(T)
    e_rccsd_t: float = 0.0
    e_rccsd_tt: float = 0.0
    e_crccsd_t: float = 0.0
    e_crccsd_tt: float = 0.0
    D_T: float = 0.0
    D_TT: float = 0.0
    e_highest: float = 0.0
    calcname: str = "CCSD"
    # which kernel tier actually ran (a Pallas VMEM fallback may differ
    # from the requested precision — benches report this honestly)
    precision_used: str = ""


def _xbar(x: jnp.ndarray) -> jnp.ndarray:
    """x_bar[...,a,b,c] = 4/3 x[abc] - 2 x[acb] + 2/3 x[bca]
    (make_x_bar, ccsd.f90:2313-2318; acts on the last three axes)."""
    perm_acb = tuple(range(x.ndim - 3)) + (x.ndim - 3, x.ndim - 1, x.ndim - 2)
    perm_bca = tuple(range(x.ndim - 3)) + (x.ndim - 1, x.ndim - 3, x.ndim - 2)
    return (
        4.0 / 3.0 * x
        - 2.0 * jnp.transpose(x, perm_acb)
        + 2.0 / 3.0 * jnp.transpose(x, perm_bca)
    )


@partial(jax.jit, static_argnames=("nocc", "precision"))
def cr_intermediates(
    t1, t2, t1_prev, t2_prev, v: Slices, nocc: int, precision: str = "f64",
    vvvv_term=None,
):
    """I_vovv'' and I_ooov'' (build_cr_ccsd_t_intermediates,
    ccsd.f90:2338-2551), with stale I_vo/asym_t2 from (t1_prev, t2_prev).

    precision="hybrid": the whole chain runs in f32 (native MXU dots; the
    emulated-f64 contractions against the O(v^4) v_vvvv operand cost tens
    of seconds at >=100 bf through limb-array decompositions).  The I''
    tensors feed the m3 GEMMs, which run f32 in hybrid mode anyway; the
    end-to-end effect on all six variant energies is <1e-8 on the N2
    golden (tests/test_triples_spatial.py).

    vvvv_term: the single v_vvvv contraction es("ecba,ie->ciab", v_vvvv,
    t1) (ccsd.f90:2513), precomputed on the streaming tier straight from
    the digit limbs (ccsd_spatial._cr_vvvv_term_from_B) — the only way
    v_vvvv enters this chain, so with it supplied v.v_vvvv may be None
    and the O(v^4) tensor need not exist at all."""
    if precision in ("hybrid", "pallas", "fused"):
        f32 = jnp.float32
        t1, t2 = t1.astype(f32), t2.astype(f32)
        t1_prev, t2_prev = t1_prev.astype(f32), t2_prev.astype(f32)
        v = Slices(*(
            x.astype(f32) if x is not None else None for x in v
        ))
        if vvvv_term is not None:
            vvvv_term = vvvv_term.astype(f32)
    es = partial(jnp.einsum, optimize=True)

    # Stale quantities (see module docstring)
    asym_t2 = 2.0 * t2_prev - jnp.transpose(t2_prev, (1, 0, 2, 3))
    I_vo = 2.0 * es("miea,me->ai", v.v_oovv, t1_prev) - es(
        "miae,me->ai", v.v_oovv, t1_prev
    )

    # x helpers (ccsd.f90:2390-2403 definitions, 2424-2506 loops)
    x_vvvo_p = jnp.transpose(v.v_vvov, (1, 0, 3, 2)) - 0.5 * es(
        "ma,mibc->bcai", t1, v.v_oovv
    )
    x_ovov_p = (
        v.v_ovov
        - 0.5 * es("mibj,ma->jbia", v.v_oovo, t1)
        + es("je,beai->jbia", t1, x_vvvo_p)
    )
    x_voov_p = (
        jnp.transpose(v.v_oovv, (2, 1, 0, 3))
        - 0.5 * es("imbj,ma->bjia", v.v_oovo, t1)
        + es("ebai,je->bjia", x_vvvo_p, t1)
    )
    x_vvvo = x_vvvo_p - 0.5 * es("ma,mibc->bcai", t1, v.v_oovv)
    x_ovoo = jnp.transpose(v.v_oovo, (3, 2, 1, 0)) + es(
        "ke,ijea->kaij", t1, v.v_oovv
    )
    x_ovov_pp = (
        v.v_ovov
        - es("mibj,ma->jbia", v.v_oovo, t1)
        + 0.5 * es("je,beai->jbia", t1, x_vvvo)
    )
    x_voov_pp = (
        jnp.transpose(v.v_oovv, (2, 1, 0, 3))
        - es("imbj,ma->bjia", v.v_oovo, t1)
        + 0.5 * es("ebai,je->bjia", x_vvvo, t1)
    )

    # I_vovv'' (ccsd.f90:2513-2520)
    if vvvv_term is None:
        vvvv_term = es("ecba,ie->ciab", v.v_vvvv, t1)
    I_vovv_pp = (
        jnp.transpose(v.v_vvov, (3, 2, 1, 0))
        + vvvv_term
        - es("icma,mb->ciab", x_ovov_p, t1)
        - es("ma,cimb->ciab", t1, x_voov_p)
        - es("cm,miab->ciab", I_vo, t2)
        + es("mnba,icmn->ciab", t2, x_ovoo)
        + es("ceam,imbe->ciab", x_vvvo, asym_t2)
        - es("ecam,mieb->ciab", x_vvvo, t2)
        - es("miae,ecbm->ciab", t2, x_vvvo)
    )

    # I_ooov'' (ccsd.f90:2532-2537).  NOTE the reference bug reproduced
    # here: the virtual index e of the last three terms runs only over
    # the first nocc virtuals (ccsd.f90:2535 `do e = 1, nocc`).
    ecut = slice(None, nocc)
    I_ooov_pp = (
        jnp.transpose(v.v_oovo, (1, 0, 3, 2))
        - es("mikj,ma->jkia", v.v_oooo, t1)
        + es("jeia,ke->jkia", x_ovov_pp, t1)
        + es("je,ekia->jkia", t1, x_voov_pp)
        + es("kjef,efai->jkia", t2, x_vvvo)
        + es("jeim,mkea->jkia", x_ovoo[:, ecut], asym_t2[:, :, ecut])
        - es("jemi,mkea->jkia", x_ovoo[:, ecut], t2[:, :, ecut])
        - es("mjae,kemi->jkia", t2[:, :, :, ecut], x_ovoo[:, ecut])
    )
    return I_vovv_pp, I_ooov_pp


def _islice_terms(
    i0,  # scalar (traced) occupied index
    j0,  # scalar (traced) start of the j slab
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
    jlen: int,
    doing_T: bool,
    doing_R: bool,
    doing_CR: bool,
    precision: str = "f64",
):
    """The six reductions over the (i=i0, j in [j0, j0+jlen), all k) slab.

    Panel formulation of the per-(i,j,k) loop (ccsd.f90:2151-2237): every
    transient is O(jlen * o * v^3) — the spatial analogue of the
    spin-orbital slab strategy — so CR-CCSD(T) scales to pVTZ-sized
    spatial problems in bounded memory (the old i-block form materialised
    O(B o^2 v^3) 6-D tensors, hopeless past pVDZ).

    precision="hybrid" (same contract as triples_spinorb._islice_energy):
    the 24 panel GEMMs run with f32 operands on the native MXU path —
    f64 GEMMs are XLA-emulated via f32 limb arrays ~5x the memory and
    ~50x slower — while the denominators and every energy/denominator
    reduction stay f64."""
    es = partial(jnp.einsum, optimize=True)
    dj = lambda x, ax: jax.lax.dynamic_slice_in_dim(x, j0, jlen, axis=ax)

    if precision in ("hybrid", "pallas"):
        f32 = jnp.float32
        t1 = t1.astype(f32)
        t2 = t2.astype(f32)
        v_vvov = v_vvov.astype(f32)
        v_oovo = v_oovo.astype(f32)
        v_oovv = v_oovv.astype(f32)
        I_vovv_pp = I_vovv_pp.astype(f32)
        I_ooov_pp = I_ooov_pp.astype(f32)

    t2_i = jnp.take(t2, i0, axis=0)  # t2[i0,·,:,:]  (o,v,v)
    t2_ci = jnp.take(t2, i0, axis=1)  # t2[·,i0,:,:]  (o,v,v)
    t1_i = jnp.take(t1, i0, axis=0)  # (v,)
    Vv, Vo = v_vvov, v_oovo
    Vv_i3 = jnp.take(Vv, i0, axis=2)  # Vv[a,b,i0,f]  (v,v,v)
    Vo_i0 = jnp.take(Vo, i0, axis=0)  # Vo[i0,j,a,m]  (o,v,o)
    Vo_i1 = jnp.take(Vo, i0, axis=1)  # Vo[k,i0,c,m]  (o,v,o)

    # Twelve terms of t3_D (ccsd.f90:2168-2173) with i pinned to i0 and j
    # restricted to the slab:
    t3_D = (
        es("jaf,cbkf->jkabc", dj(t2_i, 0), Vv)
        - es("mba,kjcm->jkabc", t2_ci, dj(Vo, 1))
        + es("jbf,cakf->jkabc", dj(t2_ci, 0), Vv)
        - es("mjab,kcm->jkabc", dj(t2, 1), Vo_i1)
        + es("kjcf,abf->jkabc", dj(t2, 1), Vv_i3)
        - es("mkbc,jam->jkabc", t2, dj(Vo_i0, 0))
        + es("kaf,bcjf->jkabc", t2_i, dj(Vv, 2))
        - es("mca,jkbm->jkabc", t2_ci, dj(Vo, 0))
        + es("jkbf,acf->jkabc", dj(t2, 0), Vv_i3)
        - es("mjcb,kam->jkabc", dj(t2, 1), Vo_i0)
        + es("kcf,bajf->jkabc", t2_ci, dj(Vv, 2))
        - es("mkac,jbm->jkabc", t2, dj(Vo_i1, 0))
    )

    def build_m3():
        # M3 moment (Piecuch Eq. 62; ccsd.f90:2188-2193), same twelve-term
        # joint-permutation structure as t3_D:
        Iv, Jo = I_vovv_pp, I_ooov_pp
        Iv_i1 = jnp.take(Iv, i0, axis=1)  # Iv[e,i0,b,a]  (v,v,v)
        Jo_i0 = jnp.take(Jo, i0, axis=0)  # Jo[i0,k,m,c]  (o,o,v)
        Jo_i1 = jnp.take(Jo, i0, axis=1)  # Jo[j,i0,m,a]  (o,o,v)
        return (
            es("jae,ekbc->jkabc", dj(t2_i, 0), Iv)
            - es("mba,jkmc->jkabc", t2_ci, dj(Jo, 0))
            + es("jbe,ekac->jkabc", dj(t2_ci, 0), Iv)
            - es("mjab,kmc->jkabc", dj(t2, 1), Jo_i0)
            + es("kjce,eba->jkabc", dj(t2, 1), Iv_i1)
            - es("mkbc,jma->jkabc", t2, dj(Jo_i1, 0))
            + es("kae,ejcb->jkabc", t2_i, dj(Iv, 1))
            - es("mca,kjmb->jkabc", t2_ci, dj(Jo, 1))
            + es("jkbe,eca->jkabc", dj(t2, 0), Iv_i1)
            - es("mjcb,kma->jkabc", dj(t2, 1), Jo_i1)
            + es("kce,ejab->jkabc", t2_ci, dj(Iv, 1))
            - es("mkac,jmb->jkabc", t2, dj(Jo_i0, 0))
        )

    eo_j = jax.lax.dynamic_slice_in_dim(e_o, j0, jlen)

    if precision == "pallas":
        # Fused VMEM finale (ops/triples_pallas.triples_finale_spatial):
        # only the two GEMM outputs (t3_D, m3) touch HBM; t3/xbar/z3/y
        # and all six reductions happen in VMEM per (j,k) panel.
        from ..ops.triples_pallas import triples_finale_spatial

        nv = t3_D.shape[-1]
        o = t2.shape[0]
        m3 = build_m3() if doing_CR else t3_D
        voovv_i0 = jnp.take(v_oovv, i0, axis=0)  # (o,v,v)
        bcast = lambda x: jnp.broadcast_to(x, (jlen, o, nv, nv))
        mats = jnp.stack(
            [
                dj(v_oovv, 0),                      # v_oovv[j,k]  [b,c]
                bcast(voovv_i0[None]),              # v_oovv[i,k]  [a,c]
                bcast(dj(voovv_i0, 0)[:, None]),    # v_oovv[i,j]  [a,b]
                dj(t2, 0),                          # t2[j,k]      [b,c]
                bcast(t2_i[None]),                  # t2[i,k]      [a,c]
                bcast(dj(t2_i, 0)[:, None]),        # t2[i,j]      [a,b]
            ],
            axis=2,
        ).reshape(jlen * o, 6, nv, nv)
        vecs = jnp.stack(
            [
                jnp.broadcast_to(dj(t1, 0)[:, None, :], (jlen, o, nv)),
                jnp.broadcast_to(t1[None], (jlen, o, nv)),
            ],
            axis=2,
        ).reshape(jlen * o, 2, nv)
        eo_sum = (e_o[i0] + eo_j[:, None] + e_o[None, :]).reshape(-1)
        s0, s1, s2, s3, s4, s5 = triples_finale_spatial(
            t3_D.reshape(-1, nv, nv, nv),
            m3.reshape(-1, nv, nv, nv),
            mats,
            vecs,
            eo_sum.astype(jnp.float32),
            t1_i,
            e_v,
            doing_T=doing_T,
            doing_Y=doing_R or doing_CR,
            doing_CR=doing_CR,
        )
        acc = {"e_T": s0}
        if doing_T:
            acc["e_TT"] = s0 + s1
        if doing_R or doing_CR:
            acc["D_T"] = s2
            if doing_T:
                acc["D_TT"] = s2 + s3
        if doing_CR:
            acc["e_CR"] = s4
            if doing_T:
                acc["e_CRT"] = s4 + s5
        return acc

    D3 = (
        (e_o[i0] + eo_j[:, None] + e_o[None, :])[:, :, None, None, None]
        - e_v[None, None, :, None, None]
        - e_v[None, None, None, :, None]
        - e_v[None, None, None, None, :]
    )
    t3 = t3_D / D3
    t_bar = _xbar(t3)

    acc = {}
    acc["e_T"] = jnp.sum(t_bar * t3_D)

    voovv_i = jnp.take(v_oovv, i0, axis=0)  # (o,v,v)
    if doing_T:
        # z3 (Piecuch Eq. 60; ccsd.f90:2178-2179)
        z3 = (
            es("a,jkbc->jkabc", t1_i, dj(v_oovv, 0))
            + es("jb,kac->jkabc", dj(t1, 0), voovv_i)
            + es("kc,jab->jkabc", t1, dj(voovv_i, 0))
        ) / D3
        z3_bar = _xbar(z3)
        acc["e_TT"] = acc["e_T"] + jnp.sum(z3_bar * t3_D)

    if doing_R or doing_CR:
        # y (Piecuch Eq. 66; ccsd.f90:2183-2184)
        y = (
            es("a,jb,kc->jkabc", t1_i, dj(t1, 0), t1)
            + es("a,jkbc->jkabc", t1_i, dj(t2, 0))
            + es("jb,kac->jkabc", dj(t1, 0), t2_i)
            + es("kc,jab->jkabc", t1, dj(t2_i, 0))
        )
        acc["D_T"] = jnp.sum(t_bar * y)
        if doing_T:
            acc["D_TT"] = acc["D_T"] + jnp.sum(z3_bar * y)

    if doing_CR:
        m3 = build_m3()
        acc["e_CR"] = jnp.sum(t_bar * m3)
        if doing_T:
            acc["e_CRT"] = acc["e_CR"] + jnp.sum(z3_bar * m3)

    return acc


_SUM_KEYS = ("e_T", "e_TT", "D_T", "D_TT", "e_CR", "e_CRT")


def strict_spatial_plan(nocc: int):
    """Sorted occupied triples i<=j<=k with their S3-orbit weights.

    The spatial triples summands are NOT (i,j,k)-diagonal-free (unlike
    the spin-orbital case), but every one of the six xbar-style
    reductions satisfies the exact orbit identity

        sum_{sigma in S3} e(sigma(i,j,k)) = sum_abc w3 (.) M(u3),
        M = 8 I - 4 (T_ab+T_ac+T_bc) + 2 (C+C^2),

    because xbar's coefficients (4/3, -2, 2/3) conjugate into class
    sums (validated to 3e-13 against _triples_total_spatial on random
    data).  Summing sorted triples with weights 1 (distinct), 1/2 (two
    equal), 1/6 (all equal) therefore reproduces the full-cube total
    while cutting the executed panel work ~4.5x at nocc=10.

    Returns (ii, jj, kk, w) padded to a multiple of 8 with zero-weight
    entries."""
    tri = [
        (i, j, k)
        for i in range(nocc)
        for j in range(i, nocc)
        for k in range(j, nocc)
    ]
    w = [
        1.0 if i < j < k else (1.0 / 6.0 if i == j == k else 0.5)
        for (i, j, k) in tri
    ]
    pad = (-len(tri)) % 8
    tri += [(0, 0, 0)] * pad
    w += [0.0] * pad
    a = np.asarray(tri, dtype=np.int32)
    return a[:, 0], a[:, 1], a[:, 2], np.asarray(w)


@partial(
    jax.jit,
    static_argnames=("nocc", "jlen", "doing_T", "doing_R", "doing_CR", "precision"),
)
def _triples_total_spatial(
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
    """All six reductions over the full (i, j-slab) grid as ONE compiled
    lax.fori_loop program (see triples_spinorb._triples_total).  jlen
    must divide nocc."""
    assert nocc % jlen == 0
    nslab = nocc // jlen
    if precision in ("hybrid", "pallas"):
        # hoist the f64->f32 operand casts out of the slab loop (see
        # triples_spinorb._triples_total)
        f32 = jnp.float32
        t1, t2, v_vvov, v_oovo, v_oovv, I_vovv_pp, I_ooov_pp = (
            x.astype(f32)
            for x in (t1, t2, v_vvov, v_oovo, v_oovv, I_vovv_pp, I_ooov_pp)
        )
    args = (t1, t2, v_vvov, v_oovo, v_oovv, e_o, e_v, I_vovv_pp, I_ooov_pp)

    def body(idx, sums):
        i0 = idx // nslab
        j0 = (idx % nslab) * jlen
        acc = _islice_terms(
            i0,
            j0,
            *args,
            jlen=jlen,
            doing_T=doing_T,
            doing_R=doing_R,
            doing_CR=doing_CR,
            precision=precision,
        )
        return tuple(
            s + acc.get(k, jnp.float64(0.0)) for s, k in zip(sums, _SUM_KEYS)
        )

    init = tuple(jnp.float64(0.0) for _ in _SUM_KEYS)
    return jax.lax.fori_loop(0, nocc * nslab, body, init)


def pick_spatial_jlen(
    nocc: int, nvirt: int, precision: str, i_block: int = 0
) -> int:
    """j-slab length for the islice grid: bounds the ~(6..20) live
    (jlen*o*v^3) panel transients to ~8 GB.  In f64 mode each element
    effectively costs ~40 B: the emulated f64 dots decompose
    operands/outputs into f32 limb arrays ~4x the f64 bytes on top of
    the tensor itself (measured: jlen=5 at 116 bf compiled to a 22.9 GB
    program).  Hybrid f32 GEMM panels cost ~12 B/el (f32 GEMM + f64 t3).
    The fused loop needs jlen | nocc.  "pallas" never materialises
    z3/y/t_bar in HBM, so its live-transient cost per element is lower
    than "hybrid"."""
    el = {"hybrid": 12, "pallas": 8}.get(precision, 40)
    if i_block > 0:
        return max(d for d in range(1, min(i_block, nocc) + 1) if nocc % d == 0)
    budget = max(1, min(nocc, int(8e9 / (20 * el * nocc * nvirt**3) + 1)))
    return max(d for d in range(1, budget + 1) if nocc % d == 0)


_SPATIAL_PLAN_CACHE: dict = {}

# (o, v, has_m) signatures whose fused-kernel compile failed (VMEM):
# compile FAILURES are not cached by XLA, so without this memo every
# do_ccsd_t_spatial call would re-pay a ~150 s server compile attempt
# before falling back (measured: the dimer's "warm" (T) wall read 296 s
# of which ~1 s was the actual fallback kernel).  The in-process set is
# backed by a persistent store next to the compile cache
# (pallas_memo.py) so LATER PROCESSES skip the doomed attempt too.
_FUSED_BROKEN: set = set()


def _fused_is_broken(sig: tuple) -> bool:
    from .. import pallas_memo

    return sig in _FUSED_BROKEN or pallas_memo.contains("fused_spatial", sig)


def _spatial_plan_device(nocc: int):
    """strict_spatial_plan memoized as device arrays (see the spin-
    orbital twin: re-uploading the index vectors costs tunnel round
    trips per call).  Returns (si, sj, sk, w, ntrip)."""
    if nocc not in _SPATIAL_PLAN_CACHE:
        si, sj, sk, w = strict_spatial_plan(nocc)
        _SPATIAL_PLAN_CACHE[nocc] = (
            jnp.asarray(si), jnp.asarray(sj), jnp.asarray(sk),
            jnp.asarray(w), len(si),
        )
    return _SPATIAL_PLAN_CACHE[nocc]


def do_ccsd_t_spatial(
    sys_: dat.System,
    cc: CCSDResult,
    cfg: Config,
    levels: np.ndarray,
    rep: Reporter | None = None,
    i_block: int = 0,
    mesh=None,
    precision: str | None = None,
) -> TriplesResult:
    rep = rep or Reporter()
    rep.section("CCSD(T)")
    t_start = time.perf_counter()

    if precision is None:
        precision = cfg.ccsd_precision
        if precision == "hybrid" and jax.default_backend() in ("tpu", "axon"):
            # TPU default: upgrade "hybrid" to the sorted-triples fused
            # VMEM kernel — hardware-validated on the 116-bf dimer
            # (fused_ok=true, 0.36 s vs 0.95 s for the slab+finale
            # "pallas" path at identical 1e-8 accuracy, BENCH_LARGE r2);
            # "pallas" under a mesh (the sharded path shards the slab
            # kernel).  Above the kernels' 128-lane virtual panel the
            # whole-cube tiers cannot fit (the finale's per-(j,k) v^3
            # VMEM cube pads past the 128 MB budget at nvirt=159 —
            # measured 191 MB reserved, r4 trimer attempt 3); the r5
            # "tiled" tier (ops/triples_tiled.py) removes the cliff by
            # tiling the v^3 window over PA-row a-panels, so nvirt>128
            # runs Pallas too instead of the 1.1%-utilisation jnp slab
            # finale (BENCH_XL_r04's 50.3 s (T) stage).
            # An explicit ccsd_precision="f64" is respected.
            if sys_.nvirt > 128:
                precision = "tiled" if mesh is None else "hybrid"
            else:
                precision = "fused" if mesh is None else "pallas"

    nocc, nvirt = sys_.nocc, sys_.nvirt
    doing_T = cfg.ccsd_t_paren
    doing_R = cfg.ccsd_t_renorm
    doing_CR = cfg.ccsd_t_comp_renorm

    v = cc.slices
    t1 = jnp.asarray(cc.t1)
    t2 = jnp.asarray(cc.t2)
    e_o = jnp.asarray(levels[:nocc])
    e_v = jnp.asarray(levels[nocc : nocc + nvirt])

    if doing_CR:
        assert v.v_vvvv is not None or cc.cr_vvvv_term is not None, (
            "CR intermediates need v_vvvv or its precomputed contraction "
            "(streaming tier: do_ccsd_spatial computes cr_vvvv_term when "
            "the config requests a CR variant)"
        )
        I_vovv_pp, I_ooov_pp = cr_intermediates(
            t1, t2, jnp.asarray(cc.t1_prev), jnp.asarray(cc.t2_prev), v,
            nocc=nocc,
            # normalised: the chain only distinguishes f32 vs f64, and
            # "hybrid"/"pallas"/"fused" are identical HLO — one static
            # key means one compile serves all three callers
            precision="hybrid" if precision != "f64" else "f64",
            vvvv_term=cc.cr_vvvv_term,
        )
    else:
        I_vovv_pp = jnp.zeros((nvirt, nocc, nvirt, nvirt))
        I_ooov_pp = jnp.zeros((nocc, nocc, nocc, nvirt))

    jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)

    targs = (t1, t2, v.v_vvov, v.v_oovo, v.v_oovv, e_o, e_v,
             I_vovv_pp, I_ooov_pp)
    if precision == "fused" and _fused_is_broken((nocc, nvirt, doing_CR)):
        precision = "pallas" if nvirt <= 128 else "hybrid"
        jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)
    if precision in ("pallas", "tiled"):
        from .. import pallas_memo

        kind = "pallas_spatial" if precision == "pallas" else "tiled_spatial"
        if pallas_memo.contains(kind, (nocc, nvirt, doing_CR)):
            precision = "hybrid"
            jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)
    totals = None
    if precision == "fused" and mesh is None:
        # sorted-triples fully-fused kernel (ops/triples_pallas).  The
        # kernel's VMEM reservation sits near the 128 MB budget and the
        # margin is toolchain-dependent (r4: a serving-stack update added
        # ~31 MB of register-spill accounting and pushed the 116-bf dimer
        # 396 KB over) — on a compile failure fall back to the slab
        # finale instead of dying, and say so.
        from ..ops.triples_pallas import triples_fused_spatial

        try:
            si, sj, sk, w, ntrip = _spatial_plan_device(nocc)
            partials = triples_fused_spatial(
                *targs, si, sj, sk, has_m=doing_CR,
            )
            # (C, 8, 768) compensated partial grids: f64-sum each
            # 128-lane grid per sum, then apply the f64 orbit weights —
            # the f64 combine of ~1e-5-scale f32 slots keeps per-triple
            # error at slot-ulp scale (see the kernel's export comment)
            g = (
                partials[:ntrip].astype(jnp.float64).reshape(ntrip, 8, 6, 128)
            )
            s = jnp.sum(
                jnp.sum(g, axis=(1, 3)) * w[:, None],
                axis=0,
            )
            s = jax.block_until_ready(s)  # surface a compile/VMEM error HERE
            totals = (s[0], s[0] + s[1], s[2], s[2] + s[3], s[4], s[4] + s[5])
        except Exception as e:
            from .. import pallas_memo

            if not pallas_memo.is_vmem_error(e):
                raise  # a real bug must not masquerade as a VMEM degrade
            _FUSED_BROKEN.add((nocc, nvirt, doing_CR))
            pallas_memo.add("fused_spatial", (nocc, nvirt, doing_CR))
            # prefer the slab + Pallas-finale tier (its per-(j,k) v^3
            # window is exactly 128 lanes at nvirt <= 128, and it ran
            # ~0.9 s on the dimer vs the all-jnp "hybrid" finale's ~3 s;
            # hybrid only above 128 lanes, where the finale cannot fit
            precision = "pallas" if nvirt <= 128 else "hybrid"
            rep.write(
                " Fused triples kernel exceeded the VMEM budget"
                f" ({pallas_memo.brief(e)});"
                f" falling back to the {precision} slab finale."
            )
            jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)
    if totals is None and precision == "tiled" and mesh is None:
        # r5 tier: sorted-triple batched GEMM cubes + the a-panel-tiled
        # Pallas M-finale (ops/triples_tiled.py) — the nvirt > 128 path
        # with no whole-cube VMEM window
        from ..ops.triples_tiled import triples_tiled_spatial

        try:
            si, sj, sk, w, ntrip = _spatial_plan_device(nocc)
            r = triples_tiled_spatial(
                *targs, si, sj, sk, w, nocc=nocc,
                doing_T=doing_T, doing_R=doing_R, doing_CR=doing_CR,
            )
            r = jax.block_until_ready(jnp.stack(r))  # surface VMEM errors
            totals = (r[0], r[0] + r[1], r[2], r[2] + r[3],
                      r[4], r[4] + r[5])
        except Exception as e:
            from .. import pallas_memo

            if not pallas_memo.is_vmem_error(e):
                raise
            pallas_memo.add("tiled_spatial", (nocc, nvirt, doing_CR))
            precision = "hybrid"
            rep.write(
                " Tiled triples kernel exceeded the VMEM budget"
                f" ({pallas_memo.brief(e)});"
                " falling back to the hybrid slab finale."
            )
            jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)
    if totals is not None:
        pass
    elif mesh is not None:
        # multi-chip: the SAME (i, j-slab) slab kernel, shard_map'd over
        # the mesh with psum (parallel/triples_shard.py)
        from ..parallel.triples_shard import triples_spatial_sharded

        totals = triples_spatial_sharded(
            mesh, *targs, nocc=nocc, jlen=jlen,
            doing_T=doing_T, doing_R=doing_R, doing_CR=doing_CR,
            precision="pallas" if precision in ("fused", "tiled")
            else precision,
        )
    else:
        flags = dict(doing_T=doing_T, doing_R=doing_R, doing_CR=doing_CR)
        try:
            totals = jax.block_until_ready(
                _triples_total_spatial(
                    *targs, nocc=nocc, jlen=jlen, precision=precision, **flags
                )
            )
        except Exception as e:
            from .. import pallas_memo

            if precision != "pallas" or not pallas_memo.is_vmem_error(e):
                raise
            # second-level degrade: slab + jnp finale (slow but fits)
            pallas_memo.add("pallas_spatial", (nocc, nvirt, doing_CR))
            rep.write(
                " Pallas slab finale exceeded the VMEM budget"
                f" ({pallas_memo.brief(e)});"
                " falling back to the hybrid finale."
            )
            precision = "hybrid"
            jlen = pick_spatial_jlen(nocc, nvirt, precision, i_block)
            totals = _triples_total_spatial(
                *targs, nocc=nocc, jlen=jlen, precision=precision, **flags
            )
    sums = {k: float(x) for k, x in zip(_SUM_KEYS, totals)}
    if cfg.ccsd_t_spatial_bug_compat and doing_T and not (doing_R or doing_CR):
        # reference quirk (ccsd.f90:2211-2215): z3_bar is only formed for
        # renormalised variants, so upstream's plain CCSD(T)_spatial
        # equals its CCSD[T]; dropping the z3 contribution reproduces it
        sums["e_TT"] = sums["e_T"]

    e_T, e_TT = sums["e_T"], sums["e_TT"]
    D_T, D_TT = sums["D_T"], sums["D_TT"]
    e_CR, e_CRT = sums["e_CR"], sums["e_CRT"]

    if doing_R or doing_CR:
        # Constant denominator terms (ccsd.f90:2241-2248), built from the
        # *converged* amplitudes
        asym_t2 = 2.0 * t2 - jnp.transpose(t2, (1, 0, 2, 3))
        c_oovv = t2 + jnp.einsum("ia,jb->ijab", t1, t1)
        const = float(1.0 + 2.0 * jnp.sum(t1**2) + jnp.sum(asym_t2 * c_oovv))
        D_T += const
        if doing_T:
            D_TT += const

    res = TriplesResult()
    res.precision_used = precision
    e_ccsd = cc.e_ccsd
    res.e_ccsd_t = e_ccsd + e_T
    res.e_highest = res.e_ccsd_t
    res.D_T, res.D_TT = D_T, D_TT
    if doing_T:
        res.e_ccsd_tt = e_ccsd + e_TT
        res.e_highest = res.e_ccsd_tt
    if doing_R or doing_CR:
        res.e_rccsd_t = e_ccsd + e_T / D_T
        res.e_highest = res.e_rccsd_t
        if doing_T:
            res.e_rccsd_tt = e_ccsd + e_TT / D_TT
            res.e_highest = res.e_rccsd_tt
        if doing_CR:
            res.e_crccsd_t = e_ccsd + e_CR / D_T
            res.e_highest = res.e_crccsd_t
            if doing_T:
                res.e_crccsd_tt = e_ccsd + e_CRT / D_TT
                res.e_highest = res.e_crccsd_tt

    # calcname assembly (ccsd.f90:2279-2287)
    calcname = "CCSD" + ("(T)" if doing_T else "[T]")
    if doing_R:
        calcname = "renormalised " + calcname
    if doing_CR:
        calcname = "completely renormalised " + calcname
    res.calcname = calcname

    rep.write(
        f" Restricted {calcname} correlation energy (Hartree): {res.e_highest:15.9f}"
    )
    rep.stage_time(
        f"Time taken for restricted {calcname}:", time.perf_counter() - t_start
    )
    return res
