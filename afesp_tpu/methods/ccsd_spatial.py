"""Spin-free (spatial-orbital) CCSD — Piecuch et al., CPC 149 (2002) 71-96.

Re-implements do_ccsd_spatial (ccsd.f90:279-402) as a single jitted
einsum program per iteration.  The equations are transcribed from the
reference's *debug twin* routines, which its author verified against the
optimised BLAS path ("All no change", ccsd.f90:1532):

  - intermediates:  update_restricted_intermediates_debug (ccsd.f90:1314-1458)
  - amplitudes:     update_amplitudes_restricted_debug   (ccsd.f90:1460-1536)
  - energy/conv:    update_cc_energy                     (ccsd.f90:1734-1810)

Tensor layouts keep the Fortran index orders exactly (I_vovv_p[c,i,a,b],
I_voov[b,j,i,a], ...) so each einsum line can be checked term-by-term
against the reference.  The reshape/dgemm choreography of the optimised
Fortran path (components 5-7 of SURVEY.md) is *absent by design*: XLA
fuses and tiles these contractions onto the MXU automatically.

DIIS follows ccsd.f90:38-67: error vectors e_i = T_i - T'_{i-1} where
T'_{i-1} is the previous *extrapolated* amplitude set (snapshot taken at
the top of each iteration, ccsd.f90:340-344).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io import dat
from ..io.report import Reporter
from .hf import HFResult


class Slices(NamedTuple):
    """Physicist-notation MO ERI slices (ccsd.f90:493-514).

    v_pqrs = <pq|rs> = (pr|qs); o = occupied, v = virtual blocks.
    """

    v_oovv: jnp.ndarray  # (o,o,v,v)
    v_ovov: jnp.ndarray  # (o,v,o,v)
    v_vvov: jnp.ndarray  # (v,v,o,v)
    v_oovo: jnp.ndarray  # (o,o,v,o)
    v_oooo: jnp.ndarray  # (o,o,o,o)
    v_vvvv: jnp.ndarray  # (v,v,v,v)


@dataclasses.dataclass
class CCSDResult:
    e_ccsd: float
    t1: np.ndarray  # (o,v)
    t2: np.ndarray  # (o,o,v,v)
    t1_diagnostic: float
    converged: bool
    iterations: int
    slices: Slices
    # Pre-update amplitudes of the final iteration: build_cr_ccsd_t_intermediates
    # (ccsd.f90:2338-2551) consumes I_vo and asym_t2 computed from these
    # ("stale" relative to the converged t1/t2 — reproduced deliberately).
    t1_prev: np.ndarray | None = None
    t2_prev: np.ndarray | None = None
    # Streaming tier only: the CR chain's single v_vvvv contraction
    # (es("ecba,ie->ciab", v_vvvv, t1); ccsd.f90:2513), precomputed from
    # the digit limbs at solve-return time while they are still resident
    # — the full v_vvvv (f64 OR f32) then never exists at this tier.
    cr_vvvv_term: jnp.ndarray | None = None


def make_slices(eri_mo: jnp.ndarray, nocc: int) -> Slices:
    """Chemist (pq|rs) -> physicist <pq|rs> slices (ccsd.f90:493-514)."""
    phys = jnp.transpose(eri_mo, (0, 2, 1, 3))  # <pq|rs> = (pr|qs)
    o = slice(None, nocc)
    v = slice(nocc, None)
    return Slices(
        v_oovv=phys[o, o, v, v],
        v_ovov=phys[o, v, o, v],
        v_vvov=phys[v, v, o, v],
        v_oovo=phys[o, o, v, o],
        v_oooo=phys[o, o, o, o],
        v_vvvv=phys[v, v, v, v],
    )


def denominators(levels: jnp.ndarray, nocc: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """D_ia = e_i - e_a;  D_ijab = e_i + e_j - e_a - e_b (ccsd.f90:435-445)."""
    e_o = levels[:nocc]
    e_v = levels[nocc:]
    D_ia = e_o[:, None] - e_v[None, :]
    D_ijab = (
        e_o[:, None, None, None]
        + e_o[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    return D_ia, D_ijab


def _intermediates(t1, t2, v: Slices, digs=None):
    """Piecuch Table-1 intermediates (debug twin, ccsd.f90:1334-1454).

    With `digs` (the precomputed prechunk_op dict, hybrid solve), EVERY
    contraction with a slice-sized operand runs as a bf16 digit GEMM:
    prechunked (ce) for the smaller constant slices, digitized in-loop
    (xe) for the vvov-sized ones — prechunking those too would hold
    ~2.9 GB of extra limbs at nvirt=159.  Plain f64 einsums are not an
    option at that scale: XLA's emulated-f64 dot expands each operand
    into EIGHT f32 limb arrays (x1.6 tile padding, multiple live
    copies) — a single es("ebma,me->ba", v_vvov, t1) allocated 12 GB of
    HLO temp in the 174-bf solve (measured OOM)."""
    es = partial(jnp.einsum, optimize=True)

    def ce(spec, A, B):
        if digs is None:
            return es(spec, A, B)
        from ..ops.exact_gemm import exact_einsum

        return exact_einsum(spec, A, B, A_pre=digs[spec], maxdeg=7)

    def cb(spec, A, B):
        """Const on the B side (see _DIG_CONST_SPECS_B): A is the small
        iteration-local operand, B the prechunked slice (consulted for
        its shape only — the limbs carry the data)."""
        if digs is None:
            return es(spec, A, B)
        from ..ops.exact_gemm import exact_einsum

        return exact_einsum(spec, A, B, B_pre=digs[spec], maxdeg=7)

    def xe(spec, A, B):
        if digs is None:
            return es(spec, A, B)
        from ..ops.exact_gemm import exact_einsum

        return exact_einsum(spec, A, B, L=6, maxdeg=7)

    asym_t2 = 2.0 * t2 - jnp.transpose(t2, (1, 0, 2, 3))
    c_oovv = t2 + es("ia,jb->ijab", t1, t1)

    # I_ai = (2 v_oovv[m,i,e,a] - v_oovv[m,i,a,e]) t1[m,e]        (ccsd.f90:1336)
    I_vo = 2.0 * ce("miea,me->ai", v.v_oovv, t1) - ce("miae,me->ai", v.v_oovv, t1)

    # The two t1-dressings of v_vvov, computed ONCE and shared by
    # I_vv / I_ovov / I_voov / I_ooov' below.  These are the only v^3 o
    # GEMVs against v_vvov left in the iteration (the r4 OOM rework):
    # as prechunked digit GEMMs they read the resident limb form instead
    # of digitizing the f64 operand in-loop (two ~1 GB transposed-copy +
    # digitize transients per iteration at 174 bf, the r4 OOM report's
    # items 9-16).
    #   x_voov[b,j,i,a]    = v_vvov[b,e,i,a] t1[j,e]   (ccsd.f90:1413/1426)
    #   x_ovov_t1[j,b,i,a] = v_vvov[e,b,i,a] t1[j,e]   (ccsd.f90:1401)
    x_voov = cb("je,beia->bjia", t1, v.v_vvov)
    x_ovov_t1 = cb("je,ebia->jbia", t1, v.v_vvov)

    # I_ba (ccsd.f90:1352-1353).  The two v_vvov GEMVs are exact diagonal
    # traces of the dressings above (set j = i = m and sum): zero extra
    # contraction work and zero extra operand matricisations
    I_vv = (
        2.0 * es("mbma->ba", x_ovov_t1)
        - es("bmma->ba", x_voov)
        - 2.0 * ce("mneb,mnea->ba", v.v_oovv, c_oovv)
        + ce("mnbe,mnea->ba", v.v_oovv, c_oovv)
    )

    # I_ji' (ccsd.f90:1359)
    I_oo_p = (
        2.0 * ce("miej,me->ji", v.v_oovo, t1)
        - ce("imej,me->ji", v.v_oovo, t1)
        + ce("mief,mjef->ji", v.v_oovv, asym_t2)
    )

    # I_ji = I_ji' + I_ei t1[j,e] (ccsd.f90:1365)
    I_oo = I_oo_p + es("ei,je->ji", I_vo, t1)

    # I_klij (ccsd.f90:1375-1376)
    I_oooo = (
        v.v_oooo
        + ce("ijef,klef->klij", v.v_oovv, c_oovv)
        + ce("ijel,ke->klij", v.v_oovo, t1)
        + ce("jiek,le->klij", v.v_oovo, t1)
    )

    # I_ciab' (ccsd.f90:1388) — ONLY for the f64 debug-parity path: in
    # the production T2 its single consumer xe("ie,ejab", t1, I_vovv_p)
    # is reassociated through the t1 contraction (_iteration_core), so
    # the (v,o,v,v) tensor + its X64 splits never materialise (the r4
    # 174-bf OOM report's items 1-8, ~3 GB of peak HLO temp).  Unused ->
    # traced away (DCE) in the hybrid program.
    if digs is None:
        I_vovv_p = (
            jnp.transpose(v.v_vvov, (3, 2, 1, 0))  # v_vvov[b,a,i,c]->[c,i,a,b]
            - ce("maic,mb->ciab", v.v_ovov, t1)
            - ce("micb,ma->ciab", v.v_oovv, t1)
        )
    else:
        I_vovv_p = None

    # I_jbia (ccsd.f90:1400-1401)
    I_ovov = (
        v.v_ovov
        - 0.5 * ce("imeb,jmea->jbia", v.v_oovv, c_oovv)
        - ce("mibj,ma->jbia", v.v_oovo, t1)
        + x_ovov_t1
    )

    # I_bjia (ccsd.f90:1413-1414; x_voov also ccsd.f90:1426)
    I_voov = (
        jnp.transpose(v.v_oovv, (2, 1, 0, 3))  # v_oovv[i,j,b,a] -> [b,j,i,a]
        + ce("imbe,mjea->bjia", v.v_oovv, t2)
        - 0.5 * ce("imeb,mjea->bjia", v.v_oovv, t2)
        - 0.5 * ce("mieb,mjae->bjia", v.v_oovv, c_oovv)
        + x_voov
        - ce("imbj,ma->bjia", v.v_oovo, t1)
    )

    # I_jkia' (ccsd.f90:1438)
    I_ooov_p = (
        jnp.transpose(v.v_oovo, (1, 0, 3, 2))  # v_oovo[k,j,a,i] -> [j,k,i,a]
        + ce("efia,jkef->jkia", v.v_vvov, t2)
        + xe("je,ekia->jkia", t1, x_voov)
    )

    return dict(
        asym_t2=asym_t2,
        c_oovv=c_oovv,
        I_vo=I_vo,
        I_vv=I_vv,
        I_oo_p=I_oo_p,
        I_oo=I_oo,
        I_oooo=I_oooo,
        I_vovv_p=I_vovv_p,
        I_ovov=I_ovov,
        I_voov=I_voov,
        x_voov=x_voov,
        I_ooov_p=I_ooov_p,
    )


class SpatialHybridConsts(NamedTuple):
    """Loop-constant operand preparations for the hybrid iteration,
    built once per solve (make_cc_solver's precompute hook): the
    split-f32 halves of v_vvvv, plus the pre-digitized bf16 chunk forms
    (ops/exact_gemm.prechunk_op) of every constant-ERI side of the
    emulated-f64 contractions now routed through digit GEMMs.

    vvvv_B (>=140-bf external-slices tier): v_vvvv exists ONLY as this
    per-chunk-scaled digit form (prechunk_B_chunkscaled of the (ef, ab)
    matricisation, built by the streaming transform) — Slices.v_vvvv is
    None and the o^2v^4 contraction runs from these limbs directly."""

    digs: dict  # spec -> prechunk_op output (const operand A side)
    vvvv_B: tuple | None = None


# Contractions of the hybrid iteration whose FIRST operand is a
# loop-constant ERI slice: evaluated as pre-digitized bf16 digit GEMMs
# (emulated f64 measures ~0.3 TF/s at these shapes; the digit route is
# ~2^-35-of-scale at native MXU rate).
_DIG_CONST_SPECS = (
    ("mneb,mnea->ba", "v_oovv"),
    ("mnbe,mnea->ba", "v_oovv"),
    ("mief,mjef->ji", "v_oovv"),
    ("ijef,klef->klij", "v_oovv"),
    ("imeb,jmea->jbia", "v_oovv"),
    ("imbe,mjea->bjia", "v_oovv"),
    ("imeb,mjea->bjia", "v_oovv"),
    ("mieb,mjae->bjia", "v_oovv"),
    ("efia,jkef->jkia", "v_vvov"),
    ("efma,mief->ia", "v_vvov"),
    ("mnei,mnea->ia", "v_oovo"),
    ("mnei,mnae->ia", "v_oovo"),
    # the t1-weighted slice GEMVs (every remaining f64 dot with a
    # slice-sized operand — the emulated-f64 limb expansion allocates
    # 8x the operand bytes per dot, which OOMs the 174-bf solve)
    ("miea,me->ai", "v_oovv"),
    ("miae,me->ai", "v_oovv"),
    ("miej,me->ji", "v_oovo"),
    ("imej,me->ji", "v_oovo"),
    ("ijel,ke->klij", "v_oovo"),
    ("jiek,le->klij", "v_oovo"),
    ("mibj,ma->jbia", "v_oovo"),
    ("imbj,ma->bjia", "v_oovo"),
    ("miea,me->ia", "v_oovv"),
    ("maie,me->ia", "v_ovov"),
    # the dominant O(o^2 v^4) contraction: digit GEMMs replace the hi/lo
    # split-f32 route here — ~the same MXU passes (21 bf16 vs 3 six-pass
    # f32 products) but 2^-42-of-scale instead of the split path's
    # measured 7.3e-9 fixed-point noise on the stretched-N2 golden
    ("efab,ijef->ijab", "v_vvvv"),
)

# r4 OOM rework: the v_vvov t1-dressings and the reassociated t1*I_vovv'
# pieces run as prechunked digit GEMMs, killing the in-loop digitize of
# v_vvov-sized operands (transposed f64 copy + X64 splits + L f32
# residuals, ~2 GB of transient per site at 174 bf; items 1-16 of the r4
# OOM report).  These prechunk on the B SIDE: their contraction axis is a
# bare nvirt, and an A-side chunk (nc, M, kc=159) pads its minor dim to
# 256 (1.6x, +70 MB per limb at 174 bf) while the B-side (nc, kc, N)
# layout puts the huge free product minor (pads 1.006x).
# "maic,mb->ciab"/"micb,ma->ciab" stay unprechunked with I_vovv_p (the
# f64 debug-parity path only, where the digit route is off).
_DIG_CONST_SPECS_B = (
    ("je,beia->bjia", "v_vvov"),
    ("je,ebia->jbia", "v_vvov"),
    ("ie,baje->ijab", "v_vvov"),
    ("ie,maje->imaj", "v_ovov"),
    ("ie,mjeb->imjb", "v_oovv"),
)


# Digit depth per prechunked const: L=6/maxdeg=7 (21 digit-pair GEMMs)
# default — with twelve contractions converted, the compounded truncation
# shifts the stretched-N2 converged energy by 5.1e-8 at L=4 and 8.7e-9 at
# L=5, so L=6 buys the 1e-8 contract a comfortable margin while staying
# ~5-10x cheaper than the emulated-f64 einsums it replaces.  The three
# O(v^3 o) v_vvov matricisations added by the r4 OOM rework hold L=5
# (~0.6 GB each at 174 bf; they feed t1-weighted CORRECTION terms whose
# absolute scale is |t1| x |v| ~ 1e-2, so 2^-35-of-scale truncation sits
# ~1e-12 absolute — far inside the contract).
_DIG_L = {
    "je,beia->bjia": 5,
    "je,ebia->jbia": 5,
    "ie,baje->ijab": 5,
    # the two O(v^3 o) A-side v_vvov matricisations: L=5 trims 120 MB of
    # resident limbs each at 174 bf; they feed I_ooov' and one T1 term
    # (t2-weighted, scale ~1e-2), so 2^-35-of-scale truncation sits far
    # below the 1e-8 contract (stretched-N2 compound at L=5 across
    # twelve conversions measured 8.7e-9; here it is two)
    "efia,jkef->jkia": 5,
    # L=4 (~2^-28 of scale): feeds exactly one T1-level term whose own
    # magnitude is ~1e-2 — truncation lands ~1e-10 absolute, and the 51 MB
    # HBM overage of the 174-bf solve (r4 probe) needed the limb plane
    "efma,mief->ia": 4,
}


def _build_digs(v: Slices, skip_vvvv: bool = False) -> dict:
    from ..ops.exact_gemm import prechunk_op

    digs = {
        spec: prechunk_op(spec, "A", getattr(v, name), L=_DIG_L.get(spec, 6))
        for spec, name in _DIG_CONST_SPECS
        if not (skip_vvvv and name == "v_vvvv")
    }
    digs.update({
        spec: prechunk_op(spec, "B", getattr(v, name), L=_DIG_L.get(spec, 6))
        for spec, name in _DIG_CONST_SPECS_B
    })
    return digs


def spatial_presplit(v: Slices, kc: int = 64) -> SpatialHybridConsts:
    return SpatialHybridConsts(digs=_build_digs(v))


def spatial_presplit_ext(v: Slices, vvvv_B) -> SpatialHybridConsts:
    """External-slices variant: v.v_vvvv is None (the >=140-bf tier never
    materialises it in f64); its digit form arrives prebuilt from the
    streaming transform, everything else prechunks from the f64 slices
    inside the solve program as usual."""
    return SpatialHybridConsts(digs=_build_digs(v, skip_vvvv=True), vvvv_B=vvvv_B)


def _iteration_core(
    t1, t2, v: Slices, D_ia, D_ijab, consts=None, *, vvvv_split: bool = False
):
    """One T1/T2 update, Piecuch Eqs. 43-44 (debug twin ccsd.f90:1487-1530).

    vvvv_split routes the dominant O(o^2 v^4) c_oovv * v_vvvv contraction
    through the Ozaki split-f32 GEMM path (`ccsd_precision = "hybrid"`),
    exactly as the spin-orbital path does — same kernel, same validated
    ~1e-9 Ha end-to-end shift (tests/test_cc_solver.py)."""
    es = partial(jnp.einsum, optimize=True)
    dig = vvvv_split and consts is not None
    digs = consts.digs if dig else None
    if dig:
        from ..ops.exact_gemm import exact_einsum

        def ce(spec, A, B):
            return exact_einsum(spec, A, B, A_pre=digs[spec], maxdeg=7)

        def cb(spec, A, B):  # const on the B side (_DIG_CONST_SPECS_B)
            return exact_einsum(spec, A, B, B_pre=digs[spec], maxdeg=7)

        def xe(spec, A, B):  # both operands iteration-local
            return exact_einsum(spec, A, B, L=6, maxdeg=7)
    else:
        ce = cb = xe = es
    im = _intermediates(t1, t2, v, digs)
    asym_t2 = im["asym_t2"]
    c_oovv = im["c_oovv"]

    # ---------------- T1 (Eq. 43; ccsd.f90:1487-1495) ----------------
    tmp_t1 = (
        es("ea,ie->ia", im["I_vv"], t1)
        - es("im,ma->ia", im["I_oo_p"], t1)
        + xe("em,miea->ia", im["I_vo"], asym_t2)
        + 2.0 * ce("miea,me->ia", v.v_oovv, t1)
        - ce("maie,me->ia", v.v_ovov, t1)
        - 2.0 * ce("mnei,mnea->ia", v.v_oovo, t2)
        + ce("mnei,mnae->ia", v.v_oovo, t2)
        + ce("efma,mief->ia", v.v_vvov, asym_t2)
    )

    # ---------------- T2 (Eq. 44; ccsd.f90:1497-1526) ----------------
    if vvvv_split:
        from .ccsd_spinorb import split_einsum

        if consts is None:
            vvvv_term = 0.5 * split_einsum("efab,ijef->ijab", v.v_vvvv, c_oovv)
        elif consts.vvvv_B is not None:
            # external-slices tier: v_vvvv exists only as per-chunk bf16
            # limbs (see SpatialHybridConsts.vvvv_B); contract from them.
            # (A sequenced two-half M split of this GEMM was probed for
            # the r4 HBM budget and REGRESSED: XLA kept both halves'
            # per-degree pair products alive plus a layout copy —
            # 1.23 GB vs the single 1.16 GB buffer.)
            from ..ops.exact_gemm import exact_einsum

            nv = t2.shape[-1]
            vvvv_term = 0.5 * exact_einsum(
                "ijef,efab->ijab", c_oovv, None, L=6, maxdeg=7,
                B_pre=consts.vvvv_B, B_shape=(nv, nv, nv, nv),
            )
        else:
            vvvv_term = 0.5 * ce("efab,ijef->ijab", v.v_vvvv, c_oovv)
    else:
        vvvv_term = 0.5 * es("efab,ijef->ijab", v.v_vvvv, c_oovv)
    # t1 * I_vovv' (Eq. 44 term 5), reassociated through the t1
    # contraction so the (v,o,v,v) intermediate never exists (r4 OOM
    # rework; identical math, summation order differs at roundoff):
    #   sum_e t1[i,e] I_vovv'[e,j,a,b]
    #     = sum_e t1[i,e] v_vvov[b,a,j,e]                     (term A)
    #     - sum_m U[i,m,a,j] t1[m,b],  U = v_ovov[m,a,j,e] t1[i,e]
    #     - sum_m W[i,m,j,b] t1[m,a],  W = v_oovv[m,j,e,b] t1[i,e]
    U = cb("ie,maje->imaj", t1, v.v_ovov)
    W = cb("ie,mjeb->imjb", t1, v.v_oovv)
    t1_Ivovv = (
        cb("ie,baje->ijab", t1, v.v_vvov)
        - es("imaj,mb->ijab", U, t1)
        - es("imjb,ma->ijab", W, t1)
    )
    X = (
        xe("ijae,eb->ijab", t2, im["I_vv"])
        - xe("imab,jm->ijab", t2, im["I_oo"])
        + vvvv_term
        + 0.5 * xe("mnab,ijmn->ijab", c_oovv, im["I_oooo"])
        + t1_Ivovv
        - xe("ma,ijmb->ijab", t1, im["I_ooov_p"])
        - xe("mjae,iemb->ijab", t2, im["I_ovov"])
        - xe("iema,mjeb->ijab", im["I_ovov"], t2)
        + xe("miea,ejmb->ijab", asym_t2, im["I_voov"])
    )
    t2_new = (v.v_oovv + X + jnp.transpose(X, (1, 0, 3, 2))) / D_ijab
    t1_new = tmp_t1 / D_ia
    return t1_new, t2_new


# Default: all-f64 (golden-fixture parity).  Hybrid: split-f32 vvvv GEMM.
ccsd_iteration = jax.jit(partial(_iteration_core, vvvv_split=False))
ccsd_iteration_hybrid = jax.jit(partial(_iteration_core, vvvv_split=True))


@jax.jit
def cc_energy_restricted(t1, t2, t2_old, v_oovv):
    """E_CC and the (squared) t2 RMS (ccsd.f90:1764-1781)."""
    asym_v = 2.0 * v_oovv - jnp.transpose(v_oovv, (0, 1, 3, 2))
    ecc = jnp.sum(asym_v * (t2 + jnp.einsum("ia,jb->ijab", t1, t1)))
    rms2 = jnp.sum((t2 - t2_old) ** 2)
    return ecc, rms2


# module-level singleton (see ccsd_spinorb.py for why)
from ..ops.cc_step import (  # noqa: E402
    init_cc_state,
    make_cc_solver,
    make_cc_solver_pre,
    pack_solve_summary,
)

ccsd_spatial_solver = make_cc_solver(ccsd_iteration, cc_energy_restricted)
ccsd_spatial_solver_hybrid = make_cc_solver(
    ccsd_iteration_hybrid, cc_energy_restricted, precompute=spatial_presplit
)
# external-slices (>=140 bf): v_vvvv arrives as prebuilt digit limbs
ccsd_spatial_solver_ext = make_cc_solver_pre(
    ccsd_iteration_hybrid, cc_energy_restricted, precompute=spatial_presplit_ext
)


def get_spatial_solver(vvvv_split: bool = False):
    """Memoized whole-solve wrapper for a precision mode."""
    return ccsd_spatial_solver_hybrid if vvvv_split else ccsd_spatial_solver


@partial(jax.jit, static_argnames=("nv", "streamed"))
def _cr_vvvv_term_from_B(t1, vvvv_B, *, nv: int, streamed: bool = True):
    """es("ecba,ie->ciab", v_vvvv, t1) straight from the digit limbs.

    vvvv_B stores v_vvvv as prechunk_B_chunkscaled limbs of the
    (rows=(axis0,axis1), cols=(axis2,axis3)) matricisation — i.e. rows
    flatten (e,c), columns (b,a) for this term's index roles.  The
    contraction over e alone doesn't fit that layout, so it is recast as
    one (o*v, v^2) x (v^2, v^2) digit GEMM with the Kronecker lhs
    A[(i,c),(e,c')] = t1[i,e] * delta_{cc'}: out[(i,c),(b,a)] then equals
    the wanted sum exactly.  15 bf16 digit-pair GEMMs (maxdeg=6 at L=6,
    accuracy ~2^-35 of scale — tighter than the f32 einsum this
    replaces; t1 digitizes from f64, and the Kronecker product with the
    0/1 identity is exact per digit plane, so no f32 rounding of t1
    enters — round-4 advisor finding); under a
    mesh the limbs' chunk axis is sharded and GSPMD partitions the pair
    GEMMs, psum-ing the cross-chunk combine (see
    parallel/ccsd_shard.ccsd_solve_sharded_ext — same mechanism).
    streamed=True (single chip): the K-chunk axis streams through a
    fori_loop (ops/exact_gemm.gemm_B_pre_streamed) — the fused path's
    (nc, M, v^2) pair-product block is 12.8 GB at 174 bf and cannot
    coexist with the resident limbs.  streamed=False (mesh path): the
    fused exact_gemm, whose nc-axis pair products GSPMD shards 1/n_dev
    alongside the chunk-sharded limbs.

    Returns (c,i,a,b) f64."""
    from ..ops.exact_gemm import exact_gemm, gemm_B_pre_streamed

    o = t1.shape[0]
    eye = jnp.eye(nv, dtype=t1.dtype)
    A = (t1[:, None, :, None] * eye[None, :, None, :]).reshape(
        o * nv, nv * nv
    )
    if streamed:
        out = gemm_B_pre_streamed(A, vvvv_B, maxdeg=6)
    else:
        out = exact_gemm(A=A, B_pre=vvvv_B, maxdeg=6)
    return out.reshape(o, nv, nv, nv).transpose(1, 0, 3, 2)


@partial(jax.jit, static_argnames=("nocc",))
def spatial_cc_init(eri_mo, levels, *, nocc: int):
    """Slices + denominators + MP1 guess + initial energy as ONE compiled
    program (see spinorb_cc_init for why)."""
    v = make_slices(eri_mo, nocc)
    D_ia, D_ijab = denominators(levels, nocc)
    t1 = jnp.zeros_like(D_ia)
    t2 = v.v_oovv / D_ijab  # MP1 (ccsd.f90:521)
    e0, r0 = cc_energy_restricted(t1, t2, jnp.zeros_like(t2), v.v_oovv)
    return v, D_ia, D_ijab, t1, t2, e0, r0


@partial(jax.jit, static_argnames=("nocc",))
def spatial_cc_init_slices(v: Slices, levels, *, nocc: int):
    """spatial_cc_init for pre-built slices (the streaming-transform
    tier, where no dense MO tensor ever exists; v.v_vvvv may be None)."""
    D_ia, D_ijab = denominators(levels, nocc)
    t1 = jnp.zeros_like(D_ia)
    t2 = v.v_oovv / D_ijab
    e0, r0 = cc_energy_restricted(t1, t2, jnp.zeros_like(t2), v.v_oovv)
    return D_ia, D_ijab, t1, t2, e0, r0


def do_ccsd_spatial(
    sys_: dat.System,
    eri_mo: jnp.ndarray | None,
    cfg: Config,
    hf: HFResult,
    rep: Reporter | None = None,
    workdir=".",
    mesh=None,
    slices: Slices | None = None,
    vvvv_B=None,
) -> CCSDResult:
    """eri_mo path: dense MO tensor (the <=~140-bf tiers).  slices path
    (eri_mo None): pre-built physicist slices from the streaming
    transform with v_vvvv present ONLY as vvvv_B digit limbs — the
    >=140-bf tier where no dense n^4 f64 tensor fits on device."""
    from pathlib import Path

    from .. import warmup

    warmup.join()  # if a compile-ahead prefetch is in flight, finish it
    rep = rep or Reporter()
    rep.section("CCSD")
    t_stage = time.perf_counter()
    rep.write(" Initialise CC intermediate tensors and DIIS auxilliary arrays...")
    rep.write(" Forming energy denominator matrices...")
    rep.write(" Allocating amplitude tensors...")
    rep.write(" Forming ERI slices...")

    nocc, nvirt = sys_.nocc, sys_.nvirt
    levels = jnp.asarray(hf.levels)
    external = eri_mo is None
    if external:
        assert slices is not None and vvvv_B is not None
        assert cfg.ccsd_precision in ("hybrid", "pallas", "fused"), (
            "the streaming-slices tier stores v_vvvv as digit limbs; "
            "all-f64 ccsd_precision is not available above the dense cutoff"
        )
        v = slices
        D_ia, D_ijab, t1, t2, e0, r0 = spatial_cc_init_slices(
            v, levels, nocc=nocc
        )
    else:
        v, D_ia, D_ijab, t1, t2, e0, r0 = spatial_cc_init(eri_mo, levels, nocc=nocc)

    rep.write(" Forming initial amplitude guesses...")
    amp_in = Path(workdir) / "amplitudes_in.npz"
    if cfg.ccsd_read_amplitudes and amp_in.exists():
        rep.write(" Reading previous CC amplitudes as guess...")
        t1_np, t2_np = dat.read_amplitudes(amp_in)
        t1, t2 = jnp.asarray(t1_np), jnp.asarray(t2_np)
        e0, r0 = cc_energy_restricted(t1, t2, jnp.zeros_like(t2), v.v_oovv)
    rep.write(" Allocating stored intermediate tensors...")

    # "pallas" only changes the triples finale; the CC solve itself runs
    # the hybrid split-f32 path
    if external:
        solver = ccsd_spatial_solver_ext
    else:
        solver = get_spatial_solver(
            vvvv_split=cfg.ccsd_precision in ("hybrid", "pallas", "fused")
        )

    rep.write(f" Time taken: {time.perf_counter() - t_stage:8.6f} s")
    rep.write("")
    rep.write(" Initialisation done, now entering iterative CC solver...")

    rep.cc_table_header()

    state = init_cc_state(t1, t2, cfg.ccsd_diis_n_errmat)
    t_solve = time.perf_counter()
    if external and mesh is not None:
        # memory-scaling multi-chip: the digit-limb v_vvvv shards over
        # its chunk axis (1/n_dev of the dominant operand per device).
        # Shard HERE (shard_vvvv_limbs is idempotent — the solve wrapper
        # re-puts to the same sharding) so the CR-term GEMM below reuses
        # the SAME sharded copy the solve ran on.
        from ..parallel.ccsd_shard import (
            ccsd_solve_sharded_ext,
            shard_vvvv_limbs,
        )

        vvvv_B = shard_vvvv_limbs(mesh, vvvv_B)
        state, n_iter, done, hist_e, hist_rms = ccsd_solve_sharded_ext(
            mesh, solver, state, v, D_ia, D_ijab, v.v_oovv, e0,
            jnp.float64(cfg.ccsd_e_tol), jnp.float64(cfg.ccsd_t_tol),
            vvvv_B,
            nerr=cfg.ccsd_diis_n_errmat, maxiter=cfg.ccsd_maxiter,
        )
    elif mesh is not None:
        # multi-chip: the SAME fused solve, GSPMD-sharded over the
        # virtual axis (parallel/ccsd_shard.py)
        from ..parallel.ccsd_shard import ccsd_solve_sharded

        state, n_iter, done, hist_e, hist_rms = ccsd_solve_sharded(
            mesh, solver, state, v, D_ia, D_ijab, v.v_oovv, e0,
            jnp.float64(cfg.ccsd_e_tol), jnp.float64(cfg.ccsd_t_tol),
            nerr=cfg.ccsd_diis_n_errmat, maxiter=cfg.ccsd_maxiter,
        )
    elif external:
        state, n_iter, done, hist_e, hist_rms = solver(
            state, v, D_ia, D_ijab, v.v_oovv, e0,
            jnp.float64(cfg.ccsd_e_tol), jnp.float64(cfg.ccsd_t_tol),
            vvvv_B,
            nerr=cfg.ccsd_diis_n_errmat, maxiter=cfg.ccsd_maxiter,
        )
    else:
        state, n_iter, done, hist_e, hist_rms = solver(
            state,
            v,
            D_ia,
            D_ijab,
            v.v_oovv,
            e0,
            # strong-typed scalars so the AOT-prefetched executable
            # (warmup.py lowers from f64 ShapeDtypeStructs) is signature-hit
            jnp.float64(cfg.ccsd_e_tol),
            jnp.float64(cfg.ccsd_t_tol),
            nerr=cfg.ccsd_diis_n_errmat,
            maxiter=cfg.ccsd_maxiter,
        )
    if mesh is None:
        # ONE transfer for everything the reporting path reads back
        # (e0/r0/n_iter/done/T1-norms + both histories): each separate
        # readback is a ~29 ms tunnel round trip
        vec = np.asarray(
            pack_solve_summary(
                hist_e, hist_rms, (e0, r0, n_iter, done),
                state.t1_raw, state.t1,
            )
        )
        e0_h, r0_h, it, converged = vec[0], vec[1], int(vec[2]), bool(vec[3])
        t1sq = float(vec[4]) if bool(vec[3]) else float(vec[5])
        hist_e = vec[6 : 6 + cfg.ccsd_maxiter]
        hist_rms = vec[6 + cfg.ccsd_maxiter :]
    else:
        # mesh outputs are committed across devices; read back directly
        e0_h, r0_h = float(e0), float(r0)
        it, converged = int(n_iter), bool(done)
        t1sq = float(
            jnp.sum((state.t1_raw if converged else state.t1) ** 2)
        )
        hist_e = np.asarray(hist_e)
        hist_rms = np.asarray(hist_rms)
    wall = time.perf_counter() - t_solve
    energy = float(e0_h)
    rep.cc_row("MP1", energy, energy, float(r0_h))
    per_iter = wall / max(it, 1)
    prev = energy
    for k in range(1, it + 1):
        rep.cc_row(k, hist_e[k - 1], hist_e[k - 1] - prev, hist_rms[k - 1], per_iter)
        prev = hist_e[k - 1]
    if it:
        energy = float(hist_e[it - 1])
    if converged:
        rep.table_close()
        rep.write(" Convergence reached within tolerance.")
        rep.write(f" Final CCSD Energy (Hartree): {energy:15.12f}")

    # On convergence the reference keeps the unextrapolated final
    # amplitudes (ccsd.f90:365-393); t1_in/t2_in are the pre-update pair
    # consumed by build_cr_ccsd_t_intermediates (stale I_vo/asym_t2).
    t1 = state.t1_raw if converged else state.t1
    t2 = state.t2_raw if converged else state.t2
    t1_prev, t2_prev = state.t1_in, state.t2_in
    if cfg.ccsd_write_amplitudes and converged:
        rep.write(" Writing CC amplitudes for future use...")
        dat.write_amplitudes(Path(workdir) / "amplitudes_out.npz", t1, t2)

    t1_diag = 0.0
    if converged:
        # T1 diagnostic (ccsd.f90:369-376); the squared norm rode the
        # packed summary transfer above
        t1_diag = float(np.sqrt(t1sq / sys_.nel))
        rep.write(f" T1 diagnostic: {t1_diag:8.5f}")
        if t1_diag > 0.02:
            rep.write(
                " Significant multireference character detected,"
                " CCSD result might be unreliable!"
            )

    cr_term = None
    if external and cfg.ccsd_t_comp_renorm:
        # The only downstream consumer of v_vvvv is the CR chain's single
        # contraction es("ecba,ie->ciab", v_vvvv, t1) (ccsd.f90:2513).
        # Compute it NOW, straight from the digit limbs (still resident
        # from the solve): the r3 approach reconstructed a full f32
        # v_vvvv (3.9 GB padded at 174 bf) per device; the (c,i,a,b)
        # result is o*v^3 f64 — 16x smaller — and under a mesh the limbs'
        # chunk axis is sharded, so GSPMD partitions the digit GEMMs and
        # psums the cross-chunk reduction (per-device limb bytes 1/n_dev);
        # the mesh path therefore uses the FUSED form (streamed=False)
        # over the same sharded limb copy the solve ran on — a fori_loop
        # stream would serialise the sharded chunk axis.
        t1_cr = t1
        if mesh is not None:
            # the solve may have run on a SUB-mesh (nvirt-divisibility,
            # _fitting_mesh) while the limbs shard over the full mesh:
            # replicate the (tiny) t1 onto the full device set so the
            # jitted GEMM sees one consistent mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            t1_cr = jax.device_put(t1, NamedSharding(mesh, P()))
        cr_term = _cr_vvvv_term_from_B(
            t1_cr, vvvv_B, nv=nvirt, streamed=mesh is None
        )

    # amplitudes stay on device (see ccsd_spinorb.py — the tunnel's
    # device->host readback is ~30 MB/s)
    return CCSDResult(
        e_ccsd=energy,
        t1=t1,
        t2=t2,
        t1_diagnostic=t1_diag,
        converged=converged,
        iterations=it,
        slices=v,
        t1_prev=t1_prev,
        t2_prev=t2_prev,
        cr_vvvv_term=cr_term,
    )
