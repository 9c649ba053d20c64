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

  - stage 1 gathers AO blocks from the packed store on the fly (the
    (jkl, i) operand rows are generated per block from iotas — the same
    eri_ind arithmetic as ops/packed_eri.unpack_eri, integrals.f90:196);
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


def _gather_ao_jkl_block(packed, j0, *, n, jb):
    """AO[(j,k,l), i] rows for j in [j0, j0+jb) as one (jb*n^2, n) gather
    from the tri-packed store.  int32 index arithmetic is exact for
    n <= 300 (see ops/packed_eri.unpack_eri)."""
    i = jnp.arange(n, dtype=jnp.int32)
    j = j0 + jnp.arange(jb, dtype=jnp.int32)
    kl = _pair(i[:, None], i[None, :]).reshape(-1)  # (n^2,) pair(k,l)
    pij = _pair(i[None, :], j[:, None])  # (jb, n) pair(i,j)
    idx = _pair(pij[:, None, :], kl[None, :, None])  # (jb, n^2, n) quad
    return packed[idx].reshape(jb * n * n, n)


def _stage1_from_packed(packed, CBr, *, n, jb):
    """out[(j,k,l), p] = sum_i AO[i,j,k,l] C[p,i], gathering AO blocks of
    jb leading-j planes at a time (jb | n)."""

    def block(j0):
        Ab = _gather_ao_jkl_block(packed, j0, n=n, jb=jb)
        return exact_gemm(Ab, B_dig=CBr)

    j0s = jnp.arange(n // jb, dtype=jnp.int32) * jb
    out = jax.lax.map(block, j0s)  # (n/jb, jb*n^2, nr)
    return out.reshape(n, n, n, -1)


def _stage_dense(T, CB, *, nb):
    """Contract the LEADING axis of T against C (cols of CB): T (k, rest...)
    -> (rest..., p).  Row-blocked so digitization temporaries stay small."""
    k = T.shape[0]
    rest_shape = T.shape[1:]
    rest = int(np.prod(rest_shape))
    A = T.reshape(k, rest).T
    bs = rest // nb
    blocks = A.reshape(nb, bs, k)
    out = jax.lax.map(lambda Ab: exact_gemm(Ab, B_dig=CB), blocks)
    return out.reshape(*rest_shape, out.shape[-1])


def _chem_rows(packed, CBr, CB, *, n, jb, nb):
    """Chemist-order MO chunk (nr, n, n, n) = (p q|r s) for the MO rows p
    selected by CBr (digitized C rows); q,r,s run over ALL MOs.

    Index cycling (mp2.f90:320-386 reimagined): each stage contracts the
    leading AO index and emits its MO partner trailing, so four stages
    land in (p, q, r, s) order with no full-tensor transpose."""
    t = _stage1_from_packed(packed, CBr, n=n, jb=jb)  # (j,k,l,p)
    t = _stage_dense(t, CB, nb=nb)  # (k,l,p,q)
    t = _stage_dense(t, CB, nb=nb)  # (l,p,q,r)
    return _stage_dense(t, CB, nb=nb)  # (p,q,r,s)


def _phys(chunk):
    """Chemist chunk (p,q,r,s) -> physicist <p q|r s> rows: phys[p,x,y,z]
    = chem(p y|x z) (ccsd.f90:493-514's notation re-sort)."""
    return jnp.transpose(chunk, (0, 2, 1, 3))


@partial(jax.jit, static_argnames=("n", "nocc", "jb", "nb"))
def _occ_slices(packed, CBo, CB, *, n, nocc, jb, nb):
    """The four occupied-leading slices in one program."""
    P = _phys(_chem_rows(packed, CBo, CB, n=n, jb=jb, nb=nb))
    o = slice(None, nocc)
    v = slice(nocc, None)
    return P[:, o, v, v], P[:, v, o, v], P[:, o, v, o], P[:, o, o, o]


@partial(jax.jit, static_argnames=("n", "nocc", "nr", "jb", "nb"),
         donate_argnums=(2, 3))
def _virt_slices(packed, C, vvov, vvvv, *, n, nocc, nr, jb, nb):
    """Fill the two virtual-leading slices by scanning MO row chunks of
    size nr (nr | nvirt) — ONE program, the chunk loop inside."""
    nchunk = (n - nocc) // nr

    def step(carry, c):
        vvov, vvvv = carry
        r0 = nocc + c * nr
        rows = jax.lax.dynamic_slice(C, (r0, jnp.int32(0)), (nr, n))
        CBr = digitize_B(rows.T)
        P = _phys(_chem_rows(packed, CBr, CB, n=n, jb=jb, nb=nb))
        o = slice(None, nocc)
        v = slice(nocc, None)
        z = jnp.int32(0)
        vvov = jax.lax.dynamic_update_slice(vvov, P[:, v, o, v], (c * nr, z, z, z))
        vvvv = jax.lax.dynamic_update_slice(vvvv, P[:, v, v, v], (c * nr, z, z, z))
        return (vvov, vvvv), None

    CB = digitize_B(C.T)
    (vvov, vvvv), _ = jax.lax.scan(
        step, (vvov, vvvv), jnp.arange(nchunk, dtype=jnp.int32)
    )
    return vvov, vvvv


def _pick_chunk(nvirt: int, n: int, budget_bytes: float = 2.6e9) -> int:
    """Largest divisor of nvirt whose (nr, n^3) f64 stage buffer fits the
    budget (two are live at once; see module docstring)."""
    cap = max(1, int(budget_bytes / (8.0 * n**3)))
    divs = [d for d in range(1, nvirt + 1) if nvirt % d == 0 and d <= cap]
    return max(divs)


def ao_to_mo_slices(packed_dev, C, *, n: int, nocc: int) -> Slices:
    """Tri-packed AO ERI (device) + MO coefficients C (rows = MO,
    sys%canon_coeff layout) -> physicist Slices, f64 throughout except
    that nothing dense ever materialises (see module docstring).

    The returned Slices carries v_vvvv in f64; large-basis callers
    digitize it for the hybrid CCSD solve and drop the f64 copy (see
    ccsd_spatial.spatial_presplit_external).
    """
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
    oovv, ovov, oovo, oooo = _occ_slices(
        packed_dev, CBo, CB, n=n, nocc=nocc, jb=jb, nb=nb
    )
    nr = _pick_chunk(nvirt, n)
    vvov = jnp.zeros((nvirt, nvirt, nocc, nvirt))
    vvvv = jnp.zeros((nvirt,) * 4)
    vvov, vvvv = _virt_slices(
        packed_dev, C, vvov, vvvv, n=n, nocc=nocc, nr=nr, jb=jb, nb=nb
    )
    return Slices(
        v_oovv=oovv, v_ovov=ovov, v_vvov=vvov, v_oovo=oovo,
        v_oooo=oooo, v_vvvv=vvvv,
    )
