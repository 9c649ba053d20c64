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

Deviation (documented): the reference only forms z3_bar when a
renormalised variant is requested (ccsd.f90:2211-2215), so its *plain*
CCSD(T)_spatial silently reduces to CCSD[T].  We always form z3_bar when
the (T) variant is on; for every committed fixture (all CR runs) the two
behaviours coincide.
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


def cr_intermediates(t1, t2, t1_prev, t2_prev, v: Slices, nocc: int):
    """I_vovv'' and I_ooov'' (build_cr_ccsd_t_intermediates,
    ccsd.f90:2338-2551), with stale I_vo/asym_t2 from (t1_prev, t2_prev)."""
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
    I_vovv_pp = (
        jnp.transpose(v.v_vvov, (3, 2, 1, 0))
        + es("ecba,ie->ciab", v.v_vvvv, t1)
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


@partial(jax.jit, static_argnames=("doing_T", "doing_R", "doing_CR"))
def _triples_block(
    i0_block,  # (B,) int32 occupied indices of this block
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
    doing_T: bool,
    doing_R: bool,
    doing_CR: bool,
):
    """Accumulate the six reductions over a block of the first occupied
    index i (full j,k,a,b,c inside), mirroring the per-(i,j,k) panel loop
    ccsd.f90:2151-2237."""
    es = partial(jnp.einsum, optimize=True)

    t2i = t2[i0_block]  # (B,o,v,v)
    t1i = t1[i0_block]  # (B,v)

    # Six explicit terms of t3_D (ccsd.f90:2168-2173), each with the block
    # index B in position i:
    # X(i,j,k,a,b,c) = sum_f t2[i,j,a,f] Vv[c,b,k,f] - sum_m t2[m,i,b,a] Vo[k,j,c,m]
    Vv, Vo = v_vvov, v_oovo
    t3_D = (
        es("Bjaf,cbkf->Bjkabc", t2i, Vv)
        - es("mBba,kjcm->Bjkabc", t2[:, i0_block], Vo)
        + es("jBbf,cakf->Bjkabc", t2[:, i0_block], Vv)
        - es("mjab,kBcm->Bjkabc", t2, Vo[:, i0_block])
        + es("kjcf,abBf->Bjkabc", t2, Vv[:, :, i0_block])
        - es("mkbc,Bjam->Bjkabc", t2, Vo[i0_block])
        + es("Bkaf,bcjf->Bjkabc", t2i, Vv)
        - es("mBca,jkbm->Bjkabc", t2[:, i0_block], Vo)
        + es("jkbf,acBf->Bjkabc", t2, Vv[:, :, i0_block])
        - es("mjcb,Bkam->Bjkabc", t2, Vo[i0_block])
        + es("kBcf,bajf->Bjkabc", t2[:, i0_block], Vv)
        - es("mkac,jBbm->Bjkabc", t2, Vo[:, i0_block])
    )

    D3 = (
        e_o[i0_block][:, None, None, None, None, None]
        + e_o[None, :, None, None, None, None]
        + e_o[None, None, :, None, None, None]
        - e_v[None, None, None, :, None, None]
        - e_v[None, None, None, None, :, None]
        - e_v[None, None, None, None, None, :]
    )
    t3 = t3_D / D3
    t_bar = _xbar(t3)

    acc = {}
    acc["e_T"] = jnp.sum(t_bar * t3_D)

    if doing_T:
        # z3 (Piecuch Eq. 60; ccsd.f90:2178-2179)
        z3 = (
            es("Ba,jkbc->Bjkabc", t1i, v_oovv)
            + es("jb,Bkac->Bjkabc", t1, v_oovv[i0_block])
            + es("kc,Bjab->Bjkabc", t1, v_oovv[i0_block])
        ) / D3
        z3_bar = _xbar(z3)
        acc["e_TT"] = acc["e_T"] + jnp.sum(z3_bar * t3_D)

    if doing_R or doing_CR:
        # y (Piecuch Eq. 66; ccsd.f90:2183-2184)
        y = (
            es("Ba,jb,kc->Bjkabc", t1i, t1, t1)
            + es("Ba,jkbc->Bjkabc", t1i, t2)
            + es("jb,Bkac->Bjkabc", t1, t2[i0_block])
            + es("kc,Bjab->Bjkabc", t1, t2[i0_block])
        )
        acc["D_T"] = jnp.sum(t_bar * y)
        if doing_T:
            acc["D_TT"] = acc["D_T"] + jnp.sum(z3_bar * y)

    if doing_CR:
        # M3 moment (Piecuch Eq. 62; ccsd.f90:2188-2193), same six-term
        # joint-permutation structure as t3_D:
        # M(i,j,k,a,b,c) = sum_e t2[i,j,a,e] I''[e,k,b,c] - sum_m t2[m,i,b,a] J''[j,k,m,c]
        Iv, Jo = I_vovv_pp, I_ooov_pp
        m3 = (
            es("Bjae,ekbc->Bjkabc", t2i, Iv)
            - es("mBba,jkmc->Bjkabc", t2[:, i0_block], Jo)
            + es("jBbe,ekac->Bjkabc", t2[:, i0_block], Iv)
            - es("mjab,Bkmc->Bjkabc", t2, Jo[i0_block])
            + es("kjce,eBba->Bjkabc", t2, Iv[:, i0_block])
            - es("mkbc,jBma->Bjkabc", t2, Jo[:, i0_block])
            + es("Bkae,ejcb->Bjkabc", t2i, Iv)
            - es("mBca,kjmb->Bjkabc", t2[:, i0_block], Jo)
            + es("jkbe,eBca->Bjkabc", t2, Iv[:, i0_block])
            - es("mjcb,kBma->Bjkabc", t2, Jo[:, i0_block])
            + es("kBce,ejab->Bjkabc", t2[:, i0_block], Iv)
            - es("mkac,Bjmb->Bjkabc", t2, Jo[i0_block])
        )
        acc["e_CR"] = jnp.sum(t_bar * m3)
        if doing_T:
            acc["e_CRT"] = acc["e_CR"] + jnp.sum(z3_bar * m3)

    return acc


def do_ccsd_t_spatial(
    sys_: dat.System,
    cc: CCSDResult,
    cfg: Config,
    levels: np.ndarray,
    rep: Reporter | None = None,
    i_block: int = 0,
) -> TriplesResult:
    rep = rep or Reporter()
    rep.section("CCSD(T)")
    t_start = time.perf_counter()

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
        I_vovv_pp, I_ooov_pp = cr_intermediates(
            t1, t2, jnp.asarray(cc.t1_prev), jnp.asarray(cc.t2_prev), v, nocc
        )
    else:
        I_vovv_pp = jnp.zeros((nvirt, nocc, nvirt, nvirt))
        I_ooov_pp = jnp.zeros((nocc, nocc, nocc, nvirt))

    # block size over the first occupied index bounds the o^2 v^3 transients
    if i_block <= 0:
        # target <=2 GB of f64 6-D transients (a few live at once)
        per_i = nocc**2 * nvirt**3 * 8
        i_block = max(1, min(nocc, int(2e9 / (6 * per_i + 1))))

    sums = {k: 0.0 for k in ("e_T", "e_TT", "D_T", "D_TT", "e_CR", "e_CRT")}
    for start in range(0, nocc, i_block):
        idx = jnp.arange(start, min(start + i_block, nocc))
        acc = _triples_block(
            idx,
            t1,
            t2,
            v.v_vvov,
            v.v_oovo,
            v.v_oovv,
            e_o,
            e_v,
            I_vovv_pp,
            I_ooov_pp,
            doing_T=doing_T,
            doing_R=doing_R,
            doing_CR=doing_CR,
        )
        for k, val in acc.items():
            sums[k] += float(val)

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
