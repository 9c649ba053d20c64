"""Sliced AO->MO transform for large bases: tri-packed AO ERI -> the six
physicist-notation CCSD slices, never materialising ANY dense n^4 f64
tensor on device.

Why this exists.  The reference's transform (mp2.f90:320-386) ping-pongs
two dense n^4 temporaries; the TPU port of that shape (`_ao_to_mo_split`)
holds a dense AO ERI (7.3 GB at 174 bf) plus a dense MO output (7.3 GB)
— past ~140 basis functions the pair alone crowds a 16 GB v5e before
CCSD allocates a single slice.  This module keeps the 8-fold-symmetric
tri-packed store (n(n+1)/2 choose-2 elements, 0.93 GB at 174 bf) as the
ONLY resident ERI form and streams everything else:

  - the packed store is half-expanded ONCE into a (npair, n^2) row
    table (_expand_packed_rows, 3.7 GB transform-transient at 174 bf);
    stage 1 then reads contiguous rows of it per block (r4: the
    previous per-chunk random element re-gather cost ~26 s x 53 chunks
    of pure gather latency — same eri_ind arithmetic as
    ops/packed_eri.unpack_eri, integrals.f90:196);
  - the MO index is produced in ROW CHUNKS (all occupied rows in one
    call; virtual rows in `lax.scan` chunks), so the four quarter
    transforms only ever hold (chunk, n^3) temporaries;
  - each chunk's physicist transpose is scattered straight into the six
    slice buffers — the dense chemist (pq|rs) never exists.

Every contraction is an exact integer-digit bf16 GEMM (ops/exact_gemm,
same L=7/maxdeg=8 contract as `_ao_to_mo_split`, validated to ~1e-12 in
tests/test_split_transform.py), so the slices are f64-grade.

Peak HBM at 174 bf (o=15, v=159): packed 0.93 + slices 5.75 + two
(53, n^3) stage buffers 4.5 + block temporaries ~0.5  ~= 11.7 GB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.exact_gemm import digitize_B, exact_gemm
from .ccsd_spatial import Slices


def _pair(x, y):
    """eri_ind pair index: tri(max) + min (integrals.f90:196-210)."""
    lo = jnp.minimum(x, y)
    hi = jnp.maximum(x, y)
    return hi * (hi + 1) // 2 + lo


@partial(jax.jit, static_argnames=("n",))
def _expand_packed_rows(packed, *, n):
    """(npair, n^2) ROW-major half-expansion of the tri-packed store:
    P3[p, (k,l)] = packed[pair(p, pair(k,l))], built once per transform.

    Why: stage 1 used to re-gather the full dense AO tensor from the
    packed store for EVERY MO-row chunk — n^4 quasi-random element
    gathers x 53 chunks at 174 bf, ~26 s/chunk = ~24 min of pure gather
    latency (BENCH_XL_r04 mp2_wall).  With this table built once (npair
    x n^2 element gathers, one chunk's worth), every later stage-1 block
    becomes a CONTIGUOUS-ROW gather of ~240 KB rows — bandwidth-bound
    DMA instead of latency-bound random access.

    Returned as an explicit (hi, lo) f32 SPLIT PAIR, not one f64 array:
    this backend X64-splits a whole f64 operand at every gather inside a
    program, which would add +3.7 GB of transient per chunk program at
    174 bf (the r4 first attempt OOM'd exactly there).  hi+lo
    reconstructs the value to ~2^-48 relative — three orders below the
    digit-GEMM transform's own 2^-49-of-scale contract and the 1e-12
    validation (tests/test_split_transform.py).  2 x 1.85 GB at 174 bf,
    alive only during the transform.
    """
    npair = n * (n + 1) // 2
    i = jnp.arange(n, dtype=jnp.int32)
    kl = _pair(i[:, None], i[None, :]).reshape(-1)  # (n^2,) pair(k,l)
    # row blocks bound the (bp, n^2) i32 index + f64 gather temporaries
    bp = max(
        d for d in range(1, npair + 1)
        if npair % d == 0 and d * n * n <= 2.1e8
    )
    f32 = jnp.float32

    def block(p0):
        rows = p0 + jnp.arange(bp, dtype=jnp.int32)
        vals = packed[_pair(rows[:, None], kl[None, :])]
        hi = vals.astype(f32)
        lo = (vals - hi.astype(vals.dtype)).astype(f32)
        return hi, lo

    hi, lo = jax.lax.map(
        block, jnp.arange(npair // bp, dtype=jnp.int32) * bp
    )
    return hi.reshape(npair, n * n), lo.reshape(npair, n * n)


def _gather_ao_jkl_block(P3, j0, *, n, jb):
    """AO[(j,k,l), i] rows for j in [j0, j0+jb) from the half-expanded
    row table: gather jb*n CONTIGUOUS rows of the two f32 split planes
    (pair(i,j), full kl), reconstruct f64, then transpose the block to
    the [(j,k,l), i] GEMM layout.  int32 index arithmetic is exact for
    n <= 300 (see ops/packed_eri.unpack_eri)."""
    P3_hi, P3_lo = P3
    i = jnp.arange(n, dtype=jnp.int32)
    j = j0 + jnp.arange(jb, dtype=jnp.int32)
    pij = _pair(i[None, :], j[:, None]).reshape(-1)  # (jb*n,) pair(i,j)
    G = P3_hi[pij].astype(jnp.float64) + P3_lo[pij]
    G = G.reshape(jb, n, n, n)  # (j, i, k, l)
    return jnp.transpose(G, (0, 2, 3, 1)).reshape(jb * n * n, n)


def _stage1_from_packed(P3, CBr, *, n, jb):
    """out[(j,k,l), p] = sum_i AO[i,j,k,l] C[p,i], reading AO blocks of
    jb leading-j planes at a time (jb | n) from the row table."""

    def block(j0):
        Ab = _gather_ao_jkl_block(P3, j0, n=n, jb=jb)
        return exact_gemm(Ab, B_dig=CBr)

    j0s = jnp.arange(n // jb, dtype=jnp.int32) * jb
    out = jax.lax.map(block, j0s)  # (n/jb, jb*n^2, nr)
    return out.reshape(n, n, n, -1)


def _stage_dense(T, CB, *, nb):
    """Contract the LEADING axis of T against C (cols of CB): T (k, rest...)
    -> (rest..., p).  Column-blocked: each block slices (k, bs) columns
    and transposes ONLY the block — a full (k, rest).T materialisation
    is a second rest*k f64 buffer (2.2 GB per stage at 174 bf), and the
    alternation of such buffers fragmented the scan program's allocator
    to 41% (measured OOM by 0.7 GB); per-block transposes keep the live
    set to the input + output + ~(k, bs) temporaries."""
    k = T.shape[0]
    rest_shape = T.shape[1:]
    rest = int(np.prod(rest_shape))
    T2 = T.reshape(k, rest)
    bs = rest // nb

    def block(c):
        cols = jax.lax.dynamic_slice(T2, (jnp.int32(0), c * bs), (k, bs))
        return exact_gemm(cols.T, B_dig=CB)

    out = jax.lax.map(block, jnp.arange(nb, dtype=jnp.int32))
    return out.reshape(*rest_shape, out.shape[-1])


def _chem_rows(P3, CBr, CB, *, n, jb, nb):
    """Chemist-order MO chunk (nr, n, n, n) = (p q|r s) for the MO rows p
    selected by CBr (digitized C rows); q,r,s run over ALL MOs.

    Index cycling (mp2.f90:320-386 reimagined): each stage contracts the
    leading AO index and emits its MO partner trailing, so four stages
    land in (p, q, r, s) order with no full-tensor transpose."""
    t = _stage1_from_packed(P3, CBr, n=n, jb=jb)  # (j,k,l,p)
    t = _stage_dense(t, CB, nb=nb)  # (k,l,p,q)
    t = _stage_dense(t, CB, nb=nb)  # (l,p,q,r)
    return _stage_dense(t, CB, nb=nb)  # (p,q,r,s)


def _pslice(chem, x, y, z):
    """Physicist block phys[:, x, y, z] of a chemist row chunk, without
    the full-chunk transpose: phys[p,x,y,z] = chem(p y|x z), so slice
    chem[:, y, x, z] FIRST (the 2.2 GB full-chunk _phys transpose
    alternating with stage buffers was half the fragmentation OOM) and
    transpose only the slice."""
    return jnp.transpose(chem[:, y, x, z], (0, 2, 1, 3))


@partial(jax.jit, static_argnames=("n", "nocc", "jb", "nb"))
def _occ_slices(P3, CBo, CB, *, n, nocc, jb, nb):
    """The four occupied-leading slices in one program."""
    chem = _chem_rows(P3, CBo, CB, n=n, jb=jb, nb=nb)
    o = slice(None, nocc)
    v = slice(nocc, None)
    return (
        _pslice(chem, o, v, v),
        _pslice(chem, v, o, v),
        _pslice(chem, o, v, o),
        _pslice(chem, o, o, o),
    )


@partial(jax.jit, static_argnames=("n", "nocc", "nr", "jb", "nb"))
def _virt_chunk(P3, C, c, *, n, nocc, nr, jb, nb):
    """One MO row chunk (nr virtual rows starting at c*nr) of the two
    virtual-leading slices, as 2-D matricisations (vvov rows = e, vvvv
    rows = (e,f)).

    Why a HOST-level chunk loop instead of one lax.scan program: this
    backend emulates f64 by X64-splitting whole arrays into f32
    high/low pairs AT USE, so an f64 scan carry of the full vvvv2
    (5.1 GB at 174 bf) costs an extra 4.8 GB of split copies inside the
    program (measured OOM).  Per-chunk programs keep every f64 tensor
    <= one chunk; the stream tier digitizes each vvvv chunk to bf16
    limbs immediately and the full f64 vvvv2 never exists."""
    nv = n - nocc
    CB = digitize_B(C.T)
    rows = jax.lax.dynamic_slice(
        C, (jnp.int32(nocc) + c * jnp.int32(nr), jnp.int32(0)), (nr, n)
    )
    CBr = digitize_B(rows.T)
    chem = _chem_rows(P3, CBr, CB, n=n, jb=jb, nb=nb)
    o = slice(None, nocc)
    v = slice(nocc, None)
    return (
        _pslice(chem, v, o, v).reshape(nr, nv * nocc * nv),
        _pslice(chem, v, v, v).reshape(nr * nv, nv * nv),
    )


def _pick_chunk(nvirt: int, n: int, budget_bytes: float = 4e8) -> int:
    """Largest divisor of nvirt whose (nr, n^3) f64 stage buffer fits the
    budget.  The budget is deliberately small: this backend X64-splits
    whole f64 arrays at use, so each live stage buffer costs ~2x its f64
    bytes, and 2-3 are live at once alongside the accumulated bf16
    vvvv limbs (7.7 GB at 174 bf) — a 2.6 GB budget OOM'd at runtime."""
    cap = max(1, int(budget_bytes / (8.0 * n**3)))
    divs = [d for d in range(1, nvirt + 1) if nvirt % d == 0 and d <= cap]
    return max(divs)


def ao_to_mo_slices(packed_dev, C, *, n: int, nocc: int, digit_L: int | None = None,
                    free_packed=None):
    """Tri-packed AO ERI (device) + MO coefficients C (rows = MO,
    sys%canon_coeff layout) -> (Slices with v_vvvv=None, vvvv_form),
    f64 throughout except that nothing dense ever materialises (see
    module docstring).

    digit_L=None (tests/CPU): vvvv_form is the 2-D (ef, ab) f64
    matricisation.  digit_L=L (the stream tier): each chunk of vvvv is
    digitized to bf16 limbs THE MOMENT it is computed and vvvv_form is
    the assembled prechunk_B_chunkscaled operand — the full f64 vvvv
    never exists in HBM (at 174 bf the f64 2-D form is 5.1 GB and this
    backend X64-splits f64 arrays at use, +4.8 GB: measured OOM).
    """
    from ..ops.exact_gemm import prechunk_B_chunkscaled

    C = jnp.asarray(C)
    nvirt = n - nocc
    # jb: leading-j planes per stage-1 gather block (jb | n); the gather
    # block is (jb*n^2, n) f64 + int32 indices
    jb = max(d for d in range(1, n + 1) if n % d == 0 and d * n**3 * 12 <= 3e8)
    # nb: row blocks inside dense stages (must divide n^2*nr and n^2*nocc;
    # n itself always does)
    nb = n
    CB = digitize_B(C.T)
    CBo = digitize_B(C[:nocc].T)
    # one-time half-expansion: every stage-1 below reads contiguous rows
    # of this table instead of re-gathering the packed store per chunk
    P3 = _expand_packed_rows(packed_dev, n=n)
    if free_packed is not None:
        # the table supersedes the packed store for the whole transform;
        # drop the 0.93 GB (at 174 bf) source now (the runtime keeps the
        # buffer alive until the in-flight expansion completes)
        del packed_dev
        free_packed()
    oovv, ovov, oovo, oooo = _occ_slices(
        P3, CBo, CB, n=n, nocc=nocc, jb=jb, nb=nb
    )
    nr = _pick_chunk(nvirt, n)
    dig = (
        None
        if digit_L is None
        else jax.jit(partial(prechunk_B_chunkscaled, L=digit_L))
    )
    vvov_blocks = []
    limb_blocks: list = []
    scale_blocks: list = []
    vvvv_blocks = []
    for c in range(nvirt // nr):
        vvovb, vvvvb = _virt_chunk(
            P3, C, jnp.int32(c), n=n, nocc=nocc, nr=nr, jb=jb, nb=nb
        )
        vvov_blocks.append(vvovb)
        if dig is None:
            vvvv_blocks.append(vvvvb)
        else:
            limbs, s = dig(vvvvb)
            jax.block_until_ready(s)
            del vvvvb  # the f64 chunk dies before the next one is built
            limb_blocks.append(limbs)
            scale_blocks.append(s)
    del P3  # 3.7 GB at 174 bf — dead before the big concats/slices form
    vvov2 = jnp.concatenate(vvov_blocks) if len(vvov_blocks) > 1 else vvov_blocks[0]
    del vvov_blocks
    slices = Slices(
        v_oovv=oovv, v_ovov=ovov,
        v_vvov=vvov2.reshape(nvirt, nvirt, nocc, nvirt),
        v_oovo=oovo, v_oooo=oooo, v_vvvv=None,
    )
    if dig is None:
        vvvv2 = (
            jnp.concatenate(vvvv_blocks) if len(vvvv_blocks) > 1 else vvvv_blocks[0]
        )
        return slices, vvvv2
    L = len(limb_blocks[0])
    if len(limb_blocks) == 1:
        return slices, (list(limb_blocks[0]), scale_blocks[0])
    limb_blocks = [list(b) for b in limb_blocks]
    digits = []
    for d in range(L):
        digits.append(jnp.concatenate([b[d] for b in limb_blocks]))
        jax.block_until_ready(digits[-1])
        for b in limb_blocks:  # free each source digit as it is merged
            b[d] = None
    return slices, (digits, jnp.concatenate(scale_blocks))
