"""Spin-orbital CCSD — Stanton, Gauss, Watts, Bartlett, JCP 94, 4334 (1991).

Re-implements do_ccsd_spinorb (ccsd.f90:71-277) with the tau/F/W
intermediates (build_tau ccsd.f90:678-715, build_F 717-797, build_W
799-905) and amplitude equations (update_amplitudes 907-1038) transcribed
*code-faithfully* — every dgemm/omp_reshape sequence was resolved into
the einsum it actually computes, including the reference's F_oo
tau~ term which contracts as 0.5 tau~[m,n,e,f] <in||ef> (ccsd.f90:792-795;
Stanton Eq. 4 writes the [m<->i]-transposed contraction — we follow the
code, not the paper, for trajectory parity).

One jitted einsum program per iteration; amplitude DIIS identical to the
spatial path (ccsd.f90:617-676).
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
from ..ops.spin import spinorb_levels, spinorb_slice
from .hf import HFResult


class SpinSlices(NamedTuple):
    """Antisymmetrised spin-orbital ERI slices (ccsd.f90:181-194)."""

    oooo: jnp.ndarray
    ooov: jnp.ndarray
    ovoo: jnp.ndarray
    oovo: jnp.ndarray
    oovv: jnp.ndarray
    ovvo: jnp.ndarray
    ovvv: jnp.ndarray
    vovv: jnp.ndarray
    vvvv: jnp.ndarray
    # block-compressed alternative to the dense vvvv for nvirt where
    # (2 vs)^4 f64 exceeds HBM (the 116-bf dimer spin-orbital run:
    # 16.2 GB dense, 2 x 1.0 GB as blocks): the unique (aa, ab) spin
    # blocks from ops/spin.spinorb_vvvv_blocks.  When set, vvvv is None
    # and every vvvv consumer routes through the blocks (they already
    # computed block-wise — tau_vvvv_blocked/tau_vvvv_split).
    vvvv_blocks: tuple | None = None


@dataclasses.dataclass
class CCSDSpinorbResult:
    e_ccsd: float
    t1: np.ndarray  # (o,v) spin-orbital
    t2: np.ndarray  # (o,o,v,v) spin-orbital
    converged: bool
    iterations: int
    slices: SpinSlices


@partial(jax.jit, static_argnames=("nocc_spatial", "block_vvvv"))
def make_spin_slices(
    eri_mo: jnp.ndarray, *, nocc_spatial: int, block_vvvv: bool = False
) -> SpinSlices:
    """All nine antisymmetrised slices in ONE compiled program — the
    unjitted version costs ~500 dispatches of tunnel latency.
    block_vvvv=True keeps vvvv as its two unique spin blocks instead of
    the dense (2 nvirt)^4 tensor (see SpinSlices.vvvv_blocks)."""
    from ..ops.spin import spinorb_vvvv_blocks

    s = lambda b: spinorb_slice(eri_mo, b, nocc_spatial)
    return SpinSlices(
        oooo=s("oooo"),
        ooov=s("ooov"),
        ovoo=s("ovoo"),
        oovo=s("oovo"),
        oovv=s("oovv"),
        ovvo=s("ovvo"),
        ovvv=s("ovvv"),
        vovv=s("vovv"),
        vvvv=None if block_vvvv else s("vvvv"),
        vvvv_blocks=(
            spinorb_vvvv_blocks(eri_mo, nocc_spatial) if block_vvvv else None
        ),
    )


def tau_vvvv_blocked(tau, vvvv, blocks=None):
    """0.5 * einsum('ijef,efab->ijab', tau, vvvv), exploiting the spin
    block-sparsity of the antisymmetrised slices (block spin order,
    ops/spin.py): <ef||ab> vanishes unless multiset{spin e, spin f} ==
    multiset{spin a, spin b}, so only 6 of the 16 (ef)x(ab) spin blocks
    survive — and antisymmetry in (e<->f) and (a<->b) collapses the four
    mixed-spin blocks onto one GEMM.  Three (o^2 x vs^2)x(vs^2 x vs^2)
    f64 GEMMs instead of one 16x larger one: ~5.3x fewer MXU FLOPs on
    the dominant CCSD contraction (ccsd.f90:1669 analogue), bit-exact up
    to f64 reassociation because the skipped blocks are exact zeros.

    blocks: the (aa, ab) unique spin blocks when vvvv is held
    block-compressed (SpinSlices.vvvv_blocks) — the same three GEMMs,
    with the bb block read from aa (identical for closed shells in
    block spin order).

    Falls back to the dense einsum for odd nv (non-spin-orbital callers).
    """
    es = partial(jnp.einsum, optimize=True)
    if blocks is not None:
        aa_blk, ab_blk = blocks
        vs = aa_blk.shape[0]
        A, B = slice(0, vs), slice(vs, None)
        out_aa = es("ijef,efab->ijab", tau[:, :, A, A], aa_blk)
        out_bb = es("ijef,efab->ijab", tau[:, :, B, B], aa_blk)
        out_ab = 2.0 * es("ijef,efab->ijab", tau[:, :, A, B], ab_blk)
        out_ba = -jnp.transpose(out_ab, (0, 1, 3, 2))
        top = jnp.concatenate([out_aa, out_ab], axis=3)
        bot = jnp.concatenate([out_ba, out_bb], axis=3)
        return 0.5 * jnp.concatenate([top, bot], axis=2)
    nv = vvvv.shape[0]
    if nv % 2:
        return 0.5 * es("ijef,efab->ijab", tau, vvvv)
    vs = nv // 2
    A, B = slice(0, vs), slice(vs, None)
    out_aa = es("ijef,efab->ijab", tau[:, :, A, A], vvvv[A, A, A, A])
    out_bb = es("ijef,efab->ijab", tau[:, :, B, B], vvvv[B, B, B, B])
    # the (e in alpha, f in beta) and (e in beta, f in alpha) contributions
    # are equal by simultaneous antisymmetry of tau and vvvv in (e,f)
    out_ab = 2.0 * es("ijef,efab->ijab", tau[:, :, A, B], vvvv[A, B, A, B])
    # <ef||ab> = -<ef||ba>  =>  the (beta a, alpha b) block is the negated
    # transpose of the (alpha a, beta b) block
    out_ba = -jnp.transpose(out_ab, (0, 1, 3, 2))
    top = jnp.concatenate([out_aa, out_ab], axis=3)
    bot = jnp.concatenate([out_ba, out_bb], axis=3)
    return 0.5 * jnp.concatenate([top, bot], axis=2)


# Split-f32 GEMM machinery — shared with the large-basis Fock build and
# AO->MO transform; re-exported here for its historical import site.
from ..ops.split_gemm import (  # noqa: E402,F401
    split_einsum,
    split_matmul,
)
from ..ops.exact_gemm import exact_einsum  # noqa: E402


def _split_gemm_chunked(tau_b, v_b, kc: int = 64, B_pre=None):
    """sum_ef tau[i,j,e,f] v[e,f,a,b]: digit GEMM when the vvvv block is
    pre-digitized (B_pre), split_matmul otherwise."""
    from ..ops.exact_gemm import exact_gemm

    o, _, e1, f1 = tau_b.shape
    K = e1 * f1
    if B_pre is not None:
        out = exact_gemm(A=tau_b.reshape(o * o, K), B_pre=B_pre, maxdeg=6)
    else:
        out = split_matmul(tau_b.reshape(o * o, K), v_b.reshape(K, -1), kc)
    return out.reshape(o, o, v_b.shape[2], v_b.shape[3])


class HybridConsts(NamedTuple):
    """Loop-constant ERI operand preparations for the hybrid iteration.
    Built once per solve by presplit_consts and closed over by the
    while_loop body — re-deriving them inside the loop cost ~10
    ms/iteration on the O(v^4) slice alone (profiled)."""

    # digit-prechunked (L=5/maxdeg=6, ~2^-42 of scale) spin blocks of
    # vvvv and the G/w4 ERI sides: replaced the hi/lo split-f32 route,
    # which carried the hybrid path's dominant ~2e-9 fixed-point noise
    # at ~the same MXU passes (10 bf16 vs 3 six-pass f32 products)
    vvvv_aa: tuple
    vvvv_bb: tuple
    vvvv_ab: tuple
    ovvv_ef: tuple  # <ma||ef> keyed (ef, ma) for the G intermediate
    oovv_me: tuple  # <mn||ef> keyed (me, nf) for the W_mbej tau term
    # pre-digitized (bf16 chunk list, scale) loop-constant operands of
    # the exact-digit-GEMM contractions (ops/exact_gemm.prechunk_*) —
    # digitizing them in-loop costs ~10 elementwise passes/iteration
    oovv_mn_dig: tuple  # <mn||ef> keyed (mn, ef) for W_oooo
    ovvv_mbe_dig: tuple  # <mb||ef> keyed (mbe, f) for W_ovvo
    vovv_e_dig: tuple  # <ej||ab> keyed (e, jab) for the T2 t1*vovv term
    # F-intermediate / small-term constants (emulated-f64 matmuls run at
    # ~0.3 TF/s on this hardware; the digit-bf16 route is ~2^-35-of-
    # scale accurate at native MXU rate) — layouts match exact_einsum's
    # (fa+contr)/(contr+fb) matricisation for the annotated spec
    oovv_nef_m_dig: tuple  # B of both F_oo tau~ contractions (the
    #   (n,e,f,·) matricisation coincides for the code and paper modes)
    oovv_mnf_e_dig: tuple  # B of "mnaf,mnfe->ae"
    ovvv_mf_ae_dig: tuple  # B of "mf,mafe->ae"
    ovvv_mfe_a_dig: tuple  # B of "mife,mafe->ia"
    ooov_ne_mi_dig: tuple  # B of "ne,nmie->mi"
    ooov_mni_e_dig: tuple  # A of "mnie,je->mnij"
    oovo_mne_i_dig: tuple  # B of "mnea,mnei->ia"
    oovo_n_mej_dig: tuple  # B of "nb,nmej->mbej"
    oovo_ijb_m_dig: tuple  # A of "ijbm,ma->ijab"


# resident-limb budget for the five ovvv-sized prechunks combined (each
# is 5 bf16 limbs of an o*v^3 operand); above it they digitize in-loop
_OVVV_LIMB_BYTES = 1.5e9


def presplit_consts(v: SpinSlices, kc: int = 64) -> HybridConsts:
    from ..ops.exact_gemm import prechunk_A, prechunk_B

    nv = v.oovv.shape[2]
    vs = nv // 2
    A, B = slice(0, vs), slice(vs, None)
    no = v.oovv.shape[0]
    # Each ovvv-family prechunk holds 5 bf16 limbs of an o*v^3 operand:
    # trivial at pVTZ (~0.1 GB/site) but ~1.9 GB/site at the 116-bf
    # spin-orbital dimer (o=20, v=212) — five sites = 9.6 GB of resident
    # limbs, which is what OOM'd the first dimer spin-orbital solve
    # (21.7 GB reserved vs 15.75).  Above the budget those sites keep
    # B_pre=None and digitize IN-LOOP instead (transient, reused by
    # XLA's scheduler, at the same L=5 depth via the call sites).
    big = no * nv**3 * 2 * 5 > _OVVV_LIMB_BYTES

    def unless_big(pre_fn, build_operand):
        return None if big else pre_fn(build_operand(), L=5)

    if v.vvvv_blocks is not None:
        # block-compressed vvvv: bb == aa for closed shells in block
        # spin order, so ONE prechunk serves both (saves 1.3 GB of
        # limbs at the 116-bf dimer)
        aa_blk, ab_blk = v.vvvv_blocks
        aa_pre = prechunk_B(aa_blk.reshape(vs * vs, vs * vs), L=5)
        vvvv_pre = (
            aa_pre, aa_pre,
            prechunk_B(ab_blk.reshape(vs * vs, vs * vs), L=5),
        )
    else:
        vvvv_pre = (
            prechunk_B(v.vvvv[A, A, A, A].reshape(vs * vs, vs * vs), L=5),
            prechunk_B(v.vvvv[B, B, B, B].reshape(vs * vs, vs * vs), L=5),
            prechunk_B(v.vvvv[A, B, A, B].reshape(vs * vs, vs * vs), L=5),
        )
    return HybridConsts(
        vvvv_aa=vvvv_pre[0],
        vvvv_bb=vvvv_pre[1],
        vvvv_ab=vvvv_pre[2],
        ovvv_ef=unless_big(
            prechunk_B,
            lambda: jnp.transpose(v.ovvv, (2, 3, 0, 1)).reshape(
                nv * nv, no * nv
            ),
        ),
        oovv_me=prechunk_A(
            jnp.transpose(v.oovv, (0, 2, 1, 3)).reshape(no * nv, no * nv), L=5
        ),
        oovv_mn_dig=prechunk_A(v.oovv.reshape(no * no, nv * nv), L=5),
        ovvv_mbe_dig=unless_big(
            prechunk_A, lambda: v.ovvv.reshape(no * nv * nv, nv)
        ),
        vovv_e_dig=unless_big(
            prechunk_B, lambda: v.vovv.reshape(nv, no * nv * nv)
        ),
        oovv_nef_m_dig=prechunk_B(
            jnp.transpose(v.oovv, (1, 2, 3, 0)).reshape(no * nv * nv, no), L=5
        ),
        oovv_mnf_e_dig=prechunk_B(v.oovv.reshape(no * no * nv, nv), L=5),
        ovvv_mf_ae_dig=unless_big(
            prechunk_B,
            lambda: jnp.transpose(v.ovvv, (0, 2, 1, 3)).reshape(
                no * nv, nv * nv
            ),
        ),
        ovvv_mfe_a_dig=unless_big(
            prechunk_B,
            lambda: jnp.transpose(v.ovvv, (0, 2, 3, 1)).reshape(
                no * nv * nv, nv
            ),
        ),
        ooov_ne_mi_dig=prechunk_B(
            jnp.transpose(v.ooov, (0, 3, 1, 2)).reshape(no * nv, no * no), L=5
        ),
        ooov_mni_e_dig=prechunk_A(v.ooov.reshape(no * no * no, nv), L=5),
        oovo_mne_i_dig=prechunk_B(v.oovo.reshape(no * no * nv, no), L=5),
        oovo_n_mej_dig=prechunk_B(v.oovo.reshape(no, no * nv * no), L=5),
        oovo_ijb_m_dig=prechunk_A(v.oovo.reshape(no * no * nv, no), L=5),
    )


def tau_vvvv_split(tau, vvvv, consts: HybridConsts | None = None, blocks=None):
    """tau_vvvv_blocked with the three spin-block GEMMs on the MXU fast
    path (pre-digitized bf16 digit GEMMs when consts are available,
    hi/lo split-f32 otherwise) — selected by `ccsd_precision = "hybrid"`
    in els.in.  blocks: the (aa, ab) unique spin blocks when vvvv is
    block-compressed (bb reads aa — identical for closed shells)."""
    nv = tau.shape[2]
    vs = nv // 2
    A, B = slice(0, vs), slice(vs, None)
    pre = (None, None, None) if consts is None else (
        consts.vvvv_aa, consts.vvvv_bb, consts.vvvv_ab
    )
    if blocks is not None:
        aa_blk, ab_blk = blocks
    else:
        aa_blk, ab_blk = vvvv[A, A, A, A], vvvv[A, B, A, B]
    bb_blk = aa_blk if blocks is not None else vvvv[B, B, B, B]
    aa = _split_gemm_chunked(tau[:, :, A, A], aa_blk, B_pre=pre[0])
    bb = _split_gemm_chunked(tau[:, :, B, B], bb_blk, B_pre=pre[1])
    ab = 2.0 * _split_gemm_chunked(tau[:, :, A, B], ab_blk, B_pre=pre[2])
    ba = -jnp.transpose(ab, (0, 1, 3, 2))
    top = jnp.concatenate([aa, ab], axis=3)
    bot = jnp.concatenate([ba, bb], axis=3)
    return 0.5 * jnp.concatenate([top, bot], axis=2)


def _w4_split(oovv, Z, consts: HybridConsts | None):
    """w4[m,b,e,j] = sum_nf <mn||ef> Z[j,n,f,b] as one split GEMM with
    the <mn||ef> side pre-split when available."""
    no, nv = oovv.shape[0], oovv.shape[2]
    Zm = jnp.transpose(Z, (1, 2, 0, 3)).reshape(no * nv, no * nv)  # (nf, jb)
    if consts is None:
        Am = jnp.transpose(oovv, (0, 2, 1, 3)).reshape(no * nv, no * nv)
        C = split_matmul(Am, Zm)
    else:
        from ..ops.exact_gemm import exact_gemm

        C = exact_gemm(B=Zm, A_pre=consts.oovv_me, maxdeg=6)
    C = C.reshape(no, nv, no, nv)  # (m, e, j, b)
    return jnp.transpose(C, (0, 3, 1, 2))  # (m, b, e, j)


def _g_split(tau, ovvv, consts: HybridConsts | None):
    """G[i,j,m,a] = sum_ef tau[i,j,e,f] <ma||ef> with the <ma||ef> side
    pre-split when available."""
    no, _, nv, _ = tau.shape
    if consts is None:
        Bm = jnp.transpose(ovvv, (2, 3, 0, 1)).reshape(nv * nv, -1)
        C = split_matmul(tau.reshape(no * no, nv * nv), Bm)
    elif consts.ovvv_ef is None:
        # large tier (presplit _OVVV_LIMB_BYTES gate): digitize in-loop
        from ..ops.exact_gemm import exact_gemm

        Bm = jnp.transpose(ovvv, (2, 3, 0, 1)).reshape(nv * nv, -1)
        C = exact_gemm(tau.reshape(no * no, nv * nv), Bm, L=5, maxdeg=6)
    else:
        from ..ops.exact_gemm import exact_gemm

        C = exact_gemm(
            tau.reshape(no * no, nv * nv), B_pre=consts.ovvv_ef, maxdeg=6
        )
    return C.reshape(no, no, ovvv.shape[0], ovvv.shape[1])


def _iteration_core(
    t1,
    t2,
    v: SpinSlices,
    D_ia,
    D_ijab,
    consts: HybridConsts | None = None,
    *,
    paper_foo: bool,
    vvvv_split: bool = False,
):
    es = partial(jnp.einsum, optimize=True)
    # Sz-block-sparse evaluation (`bs`) — forbidden spin blocks are
    # exact zeros (ops/spin_einsum.py), so skipping them is exact up to
    # f64 reassociation while cutting the emulated-f64 GEMM FLOPs ~6x.
    # Only even spin-orbital extents qualify (always true for the
    # closed-shell spin-orbital path).
    from ..ops.spin_einsum import spin_blocked_einsum

    bs = (
        spin_blocked_einsum
        if t1.shape[0] % 2 == 0 and t1.shape[1] % 2 == 0
        else es
    )
    if vvvv_split:
        # hybrid mode: the 4-index-output contractions below run as ONE
        # dense integer-digit MXU GEMM each (`hs` = ops/exact_gemm
        # .exact_einsum, 6 f32 digit-pair products).  Profiling showed
        # the Sz-blocked route's ~10 half-size GEMMs + 16-block
        # concatenate reassembly per 4-index contraction dominated the
        # iteration wall (~21 ms/it of dynamic-update-slice churn at
        # pVTZ shapes vs ~0.1 ms of GEMM math).  The hi/lo split-f32
        # route (split_einsum) was tried first and rejected: its
        # ~7.7e-8-relative per-GEMM accumulation noise moved the
        # converged fixed point 1.0-1.2e-8 past the f64 answer on the
        # real TPU (bench gate 1e-8), non-monotonically in kc.  The
        # digit GEMMs accumulate exactly per chunk, leaving only the
        # ~2^-35-of-scale digit truncation (~500x tighter, measured),
        # for 2x the (negligible) f32 GEMM passes.  The F intermediates
        # stay Sz-blocked f64: their 2-index outputs assemble with a
        # single cheap concat, so splitting buys nothing there.
        hs = partial(exact_einsum, L=5, maxdeg=6)
    else:
        hs = bs
    # With presplit consts available, every f64-emulated matmul whose
    # ERI operand is a loop constant runs as a pre-digitized bf16 digit
    # GEMM instead (emulated f64 measures ~0.3 TF/s at these shapes; the
    # digit route is ~2^-35-of-scale accurate at native MXU rate, and
    # digit truncation is platform-independent so the CPU equivalence
    # suite validates the numerics).
    dig = vvvv_split and consts is not None

    # -------- tau / tau~ (ccsd.f90:678-715) --------
    x = es("ia,jb->ijab", t1, t1)
    x = x - jnp.transpose(x, (0, 1, 3, 2))
    tau_tilde = t2 + 0.5 * x
    tau = t2 + x

    # -------- F intermediates (ccsd.f90:717-797) --------
    if dig:
        F_vv = exact_einsum(
            "mf,mafe->ae", t1, v.ovvv, B_pre=consts.ovvv_mf_ae_dig,
            L=5, maxdeg=6,
        ) + 0.5 * exact_einsum(
            "mnaf,mnfe->ae", tau_tilde, v.oovv, B_pre=consts.oovv_mnf_e_dig,
            maxdeg=6,
        )
    else:
        F_vv = bs("mf,mafe->ae", t1, v.ovvv) + 0.5 * bs(
            "mnaf,mnfe->ae", tau_tilde, v.oovv
        )
    if paper_foo:
        # Stanton Eq. 5: 0.5 tau~[i,n,e,f] <mn||ef>.  This is the form
        # the reference's *2022-02 revision* ran (and what Psi4 solves):
        # with it, CCSD on every committed fixture lands within 1e-8 of
        # both Psi4's reference.dat and the old-revision ref_out —
        # demonstrating the current code's transposed contraction below
        # is a later-introduced bug, not an equivalent rearrangement.
        F_oo = -(
            exact_einsum("ne,nmie->mi", t1, v.ooov,
                         B_pre=consts.ooov_ne_mi_dig, maxdeg=6)
            if dig else bs("ne,nmie->mi", t1, v.ooov)
        ) + 0.5 * (
            exact_einsum(
                "inef,mnef->mi", tau_tilde, v.oovv,
                B_pre=consts.oovv_nef_m_dig, maxdeg=6,
            )
            if dig else bs("inef,mnef->mi", tau_tilde, v.oovv)
        )
    else:
        # code-faithful tau~ contraction (ccsd.f90:792-795; see module
        # docstring) — required to reproduce the committed els.out /
        # els_cpu.out goldens, which were produced by the current code
        F_oo = -(
            exact_einsum("ne,nmie->mi", t1, v.ooov,
                         B_pre=consts.ooov_ne_mi_dig, maxdeg=6)
            if dig else bs("ne,nmie->mi", t1, v.ooov)
        ) + 0.5 * (
            # NOTE operand order: A = tau~ carries "mnef" (the reproduced
            # reference transposition); the const oovv B-side happens to
            # matricise identically in both equation modes
            exact_einsum(
                "mnef,inef->mi", tau_tilde, v.oovv,
                B_pre=consts.oovv_nef_m_dig, maxdeg=6,
            )
            if dig else bs("mnef,inef->mi", tau_tilde, v.oovv)
        )
    F_ov = es("nf,mnef->me", t1, v.oovv)

    # -------- W intermediates (ccsd.f90:799-905) --------
    # W_mnij, stored as [i,j,m,n] upstream; we keep natural [m,n,i,j]
    w1 = (
        exact_einsum("mnie,je->mnij", v.ooov, t1,
                     A_pre=consts.ooov_mni_e_dig, maxdeg=6)
        if dig else es("mnie,je->mnij", v.ooov, t1)
    )
    W_oooo = (
        v.oooo
        + w1
        - jnp.transpose(w1, (0, 1, 3, 2))
        + 0.5 * (
            exact_einsum(
                "mnef,ijef->mnij", v.oovv, tau, A_pre=consts.oovv_mn_dig,
                maxdeg=6,
            )
            if dig else hs("mnef,ijef->mnij", v.oovv, tau)
        )
    )
    # W_abef (Eq. 7) is NOT materialised: its three contributions to the
    # T2 equation are fused below so no O(v^4) temporary beyond the
    # stored vvvv slice exists (the reference instead reshapes/stores
    # W_vvvv, ccsd.f90:846-858 — prohibitive in HBM at pVTZ scale).
    # W_mbej (Eq. 8)
    Z = 0.5 * t2 + es("jf,nb->jnfb", t1, t1)  # [j,n,f,b]
    if vvvv_split:
        w4 = _w4_split(v.oovv, Z, consts)
    else:
        w4 = bs("mnef,jnfb->mbej", v.oovv, Z)
    W_ovvo = (
        v.ovvo
        + (
            exact_einsum(
                "mbef,jf->mbej", v.ovvv, t1, A_pre=consts.ovvv_mbe_dig,
                L=5, maxdeg=6,
            )
            if dig else hs("mbef,jf->mbej", v.ovvv, t1)
        )
        + (
            exact_einsum(
                "nb,nmej->mbej", t1, v.oovo, B_pre=consts.oovo_n_mej_dig,
                maxdeg=6,
            )
            if dig else es("nb,nmej->mbej", t1, v.oovo)
        )
        - w4
    )

    # -------- T1 (Eq. 1; ccsd.f90:933-965) --------
    tmp_t1 = (
        es("ie,ae->ia", t1, F_vv)
        - es("mi,ma->ia", F_oo, t1)
        + es("me,maei->ia", t1, v.ovvo)
        + es("miea,me->ia", t2, F_ov)
        + 0.5 * (
            exact_einsum(
                "mife,mafe->ia", t2, v.ovvv, B_pre=consts.ovvv_mfe_a_dig,
                L=5, maxdeg=6,
            )
            if dig else bs("mife,mafe->ia", t2, v.ovvv)
        )
        - 0.5 * (
            exact_einsum(
                "mnea,mnei->ia", t2, v.oovo, B_pre=consts.oovo_mne_i_dig,
                maxdeg=6,
            )
            if dig else es("mnea,mnei->ia", t2, v.oovo)
        )
    )
    t1_new = tmp_t1 / D_ia

    # -------- T2 (Eq. 2; ccsd.f90:967-1031) --------
    s = -es("ie,ma,mbej->ijab", t1, t1, v.ovvo) + hs(
        "miea,mbej->ijab", t2, W_ovvo
    )
    tmp_t2 = (
        v.oovv
        + s
        - jnp.transpose(s, (1, 0, 2, 3))
        - jnp.transpose(s, (0, 1, 3, 2))
        + jnp.transpose(s, (1, 0, 3, 2))
    )
    s = hs("ijae,be->ijab", t2, F_vv)
    tmp_t2 += s - jnp.transpose(s, (0, 1, 3, 2))
    s = es("ijae,mb,me->ijab", t2, t1, F_ov)
    tmp_t2 -= 0.5 * (s - jnp.transpose(s, (0, 1, 3, 2)))
    s = es("ie,me,mjab->ijab", t1, F_ov, t2)
    tmp_t2 -= 0.5 * (s - jnp.transpose(s, (1, 0, 2, 3)))
    s = (
        exact_einsum("ie,ejab->ijab", t1, v.vovv,
                     B_pre=consts.vovv_e_dig, L=5, maxdeg=6)
        if dig else hs("ie,ejab->ijab", t1, v.vovv)
    )
    tmp_t2 += s - jnp.transpose(s, (1, 0, 2, 3))
    s = (
        exact_einsum("ijbm,ma->ijab", v.oovo, t1,
                     A_pre=consts.oovo_ijb_m_dig, maxdeg=6)
        if dig else es("ijbm,ma->ijab", v.oovo, t1)
    )
    tmp_t2 += s - jnp.transpose(s, (0, 1, 3, 2))
    s = es("mi,mjab->ijab", F_oo, t2)
    tmp_t2 -= s - jnp.transpose(s, (1, 0, 2, 3))
    tmp_t2 += 0.5 * hs("mnij,mnab->ijab", W_oooo, tau)
    # 0.5 tau_ijef W_abef with W_abef = <ab||ef> + P_(ab) t1[m,b] <ma||ef>,
    # fused: the t1 part factors through G[i,j,m,a] = tau_ijef <ma||ef>
    # (O(o^3 v) memory instead of O(v^4)).
    # vvvv is (ab)<->(ef) symmetric
    if vvvv_split:
        tmp_t2 += tau_vvvv_split(tau, v.vvvv, consts, blocks=v.vvvv_blocks)
        G = _g_split(tau, v.ovvv, consts)
    else:
        tmp_t2 += tau_vvvv_blocked(tau, v.vvvv, blocks=v.vvvv_blocks)
        G = bs("ijef,maef->ijma", tau, v.ovvv)
    tmp_t2 += 0.5 * (es("ijma,mb->ijab", G, t1) - es("ijmb,ma->ijab", G, t1))
    t2_new = tmp_t2 / D_ijab

    return t1_new, t2_new


# Default: trajectory/golden parity with the current reference code.
ccsd_spinorb_iteration = jax.jit(partial(_iteration_core, paper_foo=False))
# Literature-correct equations (Stanton Eq. 5 F_mi) — matches Psi4 and
# the reference's own 2022-02 outputs; selected by
# `ccsd_spinorb_equations = "paper"` in els.in.
ccsd_spinorb_iteration_paper = jax.jit(partial(_iteration_core, paper_foo=True))


ccsd_spinorb_iteration_hybrid = jax.jit(
    partial(_iteration_core, paper_foo=False, vvvv_split=True)
)
ccsd_spinorb_iteration_paper_hybrid = jax.jit(
    partial(_iteration_core, paper_foo=True, vvvv_split=True)
)


def get_spinorb_iteration(paper_foo: bool = False, vvvv_split: bool = False):
    """The (memoized) jitted iteration for an equations/precision combo —
    always the same wrapper object, so executables stay cached."""
    return {
        (False, False): ccsd_spinorb_iteration,
        (True, False): ccsd_spinorb_iteration_paper,
        (False, True): ccsd_spinorb_iteration_hybrid,
        (True, True): ccsd_spinorb_iteration_paper_hybrid,
    }[(paper_foo, vvvv_split)]


@jax.jit
def cc_energy_spinorb(t1, t2, t2_old, oovv):
    """E = 1/4 sum <ij||ab> (t2 + 2 t1 t1) (ccsd.f90:1789-1799)."""
    ecc = 0.25 * jnp.sum(oovv * (t2 + 2.0 * jnp.einsum("ia,jb->ijab", t1, t1)))
    rms2 = jnp.sum((t2 - t2_old) ** 2)
    return ecc, rms2


def spinorb_denominators(levels_so, nocc):
    e_o = levels_so[:nocc]
    e_v = levels_so[nocc:]
    D_ia = e_o[:, None] - e_v[None, :]
    D_ijab = (
        e_o[:, None, None, None]
        + e_o[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    return D_ia, D_ijab


# module-level singleton: jit caches are per-wrapper, so a fresh
# make_cc_solver per do_ccsd_spinorb call would re-deserialize the
# (large) executable every time — and the warmup prefetch thread must
# target the SAME wrapper the production call uses
from ..ops.cc_step import init_cc_state, make_cc_solver, pack_solve_summary  # noqa: E402

ccsd_spinorb_solver = make_cc_solver(ccsd_spinorb_iteration, cc_energy_spinorb)
ccsd_spinorb_solver_paper = make_cc_solver(
    ccsd_spinorb_iteration_paper, cc_energy_spinorb
)
ccsd_spinorb_solver_hybrid = make_cc_solver(
    ccsd_spinorb_iteration_hybrid, cc_energy_spinorb, precompute=presplit_consts
)
ccsd_spinorb_solver_paper_hybrid = make_cc_solver(
    ccsd_spinorb_iteration_paper_hybrid,
    cc_energy_spinorb,
    precompute=presplit_consts,
)


def get_spinorb_solver(paper_foo: bool = False, vvvv_split: bool = False):
    """Memoized whole-solve wrapper for an equations/precision combo."""
    return {
        (False, False): ccsd_spinorb_solver,
        (True, False): ccsd_spinorb_solver_paper,
        (False, True): ccsd_spinorb_solver_hybrid,
        (True, True): ccsd_spinorb_solver_paper_hybrid,
    }[(paper_foo, vvvv_split)]


@partial(
    jax.jit, static_argnames=("nocc_spatial", "selfcheck", "block_vvvv")
)
def spinorb_cc_init(
    eri_mo, levels, *, nocc_spatial: int, selfcheck: bool = True,
    block_vvvv: bool = False,
):
    """Slices + denominators + MP1 guess + initial energy as ONE compiled
    program (the eager op-by-op version costs seconds of per-op dispatch
    latency/compiles under a remote-tunnel TPU).

    The permutational-symmetry self-check (ccsd.f90:150-173) is computed
    HERE, fused into the same program, rather than as a separate
    dispatch: the check's transposes then read slices XLA just wrote
    (no second program load, no extra dispatch latency), and the scalar
    rides back with the packed solve summary."""
    v = make_spin_slices(
        eri_mo, nocc_spatial=nocc_spatial, block_vvvv=block_vvvv
    )
    lv = spinorb_levels(levels, nocc_spatial)
    D_ia, D_ijab = spinorb_denominators(lv, 2 * nocc_spatial)
    t1 = jnp.zeros_like(D_ia)
    t2 = v.oovv / D_ijab  # MP1 guess (ccsd.f90:523)
    e0, r0 = cc_energy_spinorb(t1, t2, jnp.zeros_like(t2), v.oovv)
    if selfcheck and block_vvvv:
        from ..ops.spin import spin_symmetry_error_blocks

        err = spin_symmetry_error_blocks(
            v.oooo, v.oovv, v.vvvv_blocks[0], v.vvvv_blocks[1]
        )
    elif selfcheck:
        from ..ops.spin import spin_symmetry_error_traceable

        err = spin_symmetry_error_traceable(v.oooo, v.oovv, v.vvvv)
    else:
        err = jnp.float64(0.0)
    return v, D_ia, D_ijab, t1, t2, e0, r0, err


# dense-vvvv byte budget above which do_ccsd_spinorb holds the slice
# block-compressed (tests lower this to force the path on small fixtures)
_BLOCK_VVVV_BYTES = 4e9


def do_ccsd_spinorb(
    sys_: dat.System,
    eri_mo: jnp.ndarray,
    cfg: Config,
    hf: HFResult,
    rep: Reporter | None = None,
    workdir=".",
    mesh=None,
) -> CCSDSpinorbResult:
    from pathlib import Path

    from .. import warmup

    warmup.join()  # if a compile-ahead prefetch is in flight, finish it
    rep = rep or Reporter()
    rep.section("CCSD")
    t0_stage = time.perf_counter()
    rep.write(" Forming antisymmetrised spinorbital ERIs...")

    nocc, nvirt = sys_.nocc, sys_.nvirt  # spin-orbital counts
    # the self-check (ccsd.f90:150-173) is fused into the init program;
    # its scalar is read back after the solve is queued, with the packed
    # summary.  On failure the error still surfaces before any result is
    # returned (the reference aborts before iterating; we abort after —
    # same user-visible contract, error block included).
    # dense vvvv is (nvirt)^4 f64; above ~4 GB (nvirt ~ 150) it cannot
    # share one chip's HBM with the other slices — hold it as its two
    # unique spin blocks instead (16x smaller; every consumer is
    # block-wise already).  This is what lets the 116-bf dimer run the
    # spin-orbital formulation at all (16.2 GB dense).
    block_vvvv = sys_.nvirt**4 * 8 > _BLOCK_VVVV_BYTES
    v, D_ia, D_ijab, t1, t2, e0, r0, selfcheck_err = spinorb_cc_init(
        eri_mo, jnp.asarray(hf.levels), nocc_spatial=sys_.nel // 2,
        selfcheck=cfg.spinorb_selfcheck, block_vvvv=block_vvvv,
    )
    if cfg.spinorb_selfcheck:
        # the reference's typo is part of the output format
        rep.write(
            " Checking that the permuational symmetry of the antisymmetrised"
            " integrals hold..."
        )
    rep.write(f" Time taken: {time.perf_counter() - t0_stage:8.6f} s")
    rep.write("")
    rep.write(" Forming slices of antisymmetrised spinorbital ERIs")
    rep.write("")

    rep.write(" Initialise CC intermediate tensors and DIIS auxilliary arrays...")
    rep.write(" Forming energy denominator matrices...")
    rep.write(" Allocating amplitude tensors...")
    amp_in = Path(workdir) / "amplitudes_in.npz"
    if cfg.ccsd_read_amplitudes and amp_in.exists():
        rep.write(" Reading previous CC amplitudes as guess...")
        t1_np, t2_np = dat.read_amplitudes(amp_in)
        t1, t2 = jnp.asarray(t1_np), jnp.asarray(t2_np)
        e0, r0 = cc_energy_spinorb(t1, t2, jnp.zeros_like(t2), v.oovv)
    rep.write(" Forming initial amplitude guesses...")

    solver = get_spinorb_solver(
        paper_foo=cfg.ccsd_spinorb_equations == "paper",
        vvvv_split=cfg.ccsd_precision in ("hybrid", "pallas", "fused"),
    )

    rep.write(" Initialisation done, now entering iterative CC solver...")
    rep.cc_table_header()

    state = init_cc_state(t1, t2, cfg.ccsd_diis_n_errmat)
    t_solve = time.perf_counter()
    if mesh is not None:
        # multi-chip: the SAME fused solve, GSPMD-sharded over the
        # virtual axis (parallel/ccsd_shard.py)
        from ..parallel.ccsd_shard import ccsd_solve_sharded

        state, n_iter, done, hist_e, hist_rms = ccsd_solve_sharded(
            mesh, solver, state, v, D_ia, D_ijab, v.oovv, e0,
            jnp.float64(cfg.ccsd_e_tol), jnp.float64(cfg.ccsd_t_tol),
            nerr=cfg.ccsd_diis_n_errmat, maxiter=cfg.ccsd_maxiter,
        )
    else:
        state, n_iter, done, hist_e, hist_rms = solver(
            state,
            v,
            D_ia,
            D_ijab,
            v.oovv,
            e0,
            # strong-typed scalars so the AOT-prefetched executable
            # (warmup.py lowers from f64 ShapeDtypeStructs) is signature-hit
            jnp.float64(cfg.ccsd_e_tol),
            jnp.float64(cfg.ccsd_t_tol),
            nerr=cfg.ccsd_diis_n_errmat,
            maxiter=cfg.ccsd_maxiter,
        )
    err_dev = selfcheck_err
    if mesh is None:
        # ONE transfer for everything the reporting path reads back
        # (e0/r0/n_iter/done/selfcheck + both histories): each separate
        # readback is a ~29 ms tunnel round trip
        vec = np.asarray(
            pack_solve_summary(
                hist_e, hist_rms, (e0, r0, n_iter, done, err_dev),
                state.t1_raw, state.t1,
            )
        )
        e0_h, r0_h, it, converged, err = (
            vec[0], vec[1], int(vec[2]), bool(vec[3]), float(vec[4]),
        )
        hist_e = vec[7 : 7 + cfg.ccsd_maxiter]
        hist_rms = vec[7 + cfg.ccsd_maxiter :]
    else:
        # mesh outputs are committed across devices; read back directly
        e0_h, r0_h = float(e0), float(r0)
        it, converged, err = int(n_iter), bool(done), float(err_dev)
        hist_e = np.asarray(hist_e)
        hist_rms = np.asarray(hist_rms)
    wall = time.perf_counter() - t_solve
    energy = float(e0_h)
    rep.cc_row("MP1", energy, energy, float(r0_h))
    if cfg.spinorb_selfcheck:
        # the reference compares against depsilon=1e-12 on exact Fortran
        # copies; our einsum construction carries ~1e-17/element roundoff
        # asymmetry under TPU f64 emulation, so the tolerance scales with
        # the number of summed elements (still ~9 orders below any real
        # symmetry violation)
        vvvv_size = (
            v.vvvv.size if v.vvvv is not None else 16 * v.vvvv_blocks[0].size
        )
        tol = max(1e-10, 1e-13 * 2 * (v.oooo.size + vvvv_size))
        if err > tol:
            rep.write(f" Permutational symmetry error: {err:15.6E}")
            raise RuntimeError(
                "Permutational symmetry of antisymmetrised integrals does not hold"
            )
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

    # On convergence the reference returns the *unextrapolated* amplitudes
    # of the final iteration (ccsd.f90:252-268)
    t1_out = state.t1_raw if converged else state.t1
    t2_out = state.t2_raw if converged else state.t2
    if cfg.ccsd_write_amplitudes and converged:
        rep.write(" Writing CC amplitudes for future use...")
        dat.write_amplitudes(Path(workdir) / "amplitudes_out.npz", t1_out, t2_out)
    # amplitudes stay on device: the triples stage consumes them there,
    # and the tunnel's device->host readback is ~30 MB/s (0.3 s for a
    # pVTZ t2); np.asarray() converts lazily wherever a host copy is
    # genuinely needed (checkpoint writer, tests)
    return CCSDSpinorbResult(
        e_ccsd=energy,
        t1=t1_out,
        t2=t2_out,
        converged=converged,
        iterations=it,
        slices=v,
    )
