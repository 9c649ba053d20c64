"""Spin-orbital antisymmetrised ERI slices.

The reference materialises the full (2n)^4 tensor
<pq||rs> = (PR|QS) d(sp,sr) d(sq,ss) - (PS|QR) d(sp,ss) d(sq,sr)
via a spin decision tree (ccsd.f90:106-148) and then slices it
(ccsd.f90:181-194).  Here each o/v slice is built directly as two
spatial einsums outer-multiplied with 2x2 spin identity masks — no
(2n)^4 intermediate ever exists, and each slice lands in HBM in its
final layout.

Spin-orbital ordering matches the reference: spinorb index p = 2P + sp
(0-based; alpha first), occupied = the first nel spin orbitals.
"""

from __future__ import annotations

import jax.numpy as jnp


def spinorb_slice(eri_mo: jnp.ndarray, blocks: str, nocc_spatial: int) -> jnp.ndarray:
    """Build the <b1 b2 || b3 b4> slice, blocks like "oovv".

    eri_mo: dense chemist (pq|rs) MO tensor.
    Returns a tensor over spin orbitals with dims (2*n_i) per position.
    """
    n = eri_mo.shape[0]
    sl = {"o": slice(0, nocc_spatial), "v": slice(nocc_spatial, n)}
    s1, s2, s3, s4 = (sl[b] for b in blocks)

    phys = jnp.transpose(eri_mo, (0, 2, 1, 3))  # <PQ|RS> = (PR|QS)
    A = phys[s1, s2, s3, s4]  # <PQ|RS>
    B = jnp.transpose(eri_mo, (0, 2, 3, 1))[s1, s2, s3, s4]  # <PQ|SR> = (PS|QR)

    # Assemble the 16 spin blocks (the Fortran decision tree,
    # ccsd.f90:133-138) in BLOCK spin order: within each occupied/virtual
    # space all alpha orbitals precede all beta.  (The reference
    # interleaves alpha/beta, but CC energies are invariant to orbital
    # ordering within the o/v spaces, and block layout avoids TPU tile
    # padding on tiny minor dimensions.)
    AmB = A - B
    Z = jnp.zeros_like(A)

    def blk(sp, sq, sr, ss):
        t = Z
        if sp == sr and sq == ss:
            t = AmB if (sp == ss and sq == sr) else A
        elif sp == ss and sq == sr:
            t = -B
        return t

    rows0 = []
    for sp in (0, 1):
        rows1 = []
        for sq in (0, 1):
            rows2 = []
            for sr in (0, 1):
                rows3 = [blk(sp, sq, sr, ss) for ss in (0, 1)]
                rows2.append(jnp.concatenate(rows3, axis=3))
            rows1.append(jnp.concatenate(rows2, axis=2))
        rows0.append(jnp.concatenate(rows1, axis=1))
    return jnp.concatenate(rows0, axis=0)


def spinorb_vvvv_blocks(
    eri_mo: jnp.ndarray, nocc_spatial: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The two UNIQUE spin blocks of the antisymmetrised <ab||cd> slice,
    built straight from the spatial MO tensor — the full (2 nvirt)^4
    tensor never exists (16.2 GB f64 at the 116-bf dimer, over one
    chip's HBM; the blocks are 1.0 GB each).

    Returns (aa, ab) with aa = <AB||CD>_aaaa = A - B and
    ab = <AB||CD>_abab = A, where A = (AC|BD), B = (AD|BC) over spatial
    virtuals (the ccsd.f90:133-138 decision tree evaluated at the only
    two distinct non-zero patterns; bbbb == aaaa and the remaining mixed
    blocks are +-transposes of ab — exactly the identities
    tau_vvvv_blocked already exploits)."""
    n = eri_mo.shape[0]
    v = slice(nocc_spatial, n)
    A = jnp.transpose(eri_mo, (0, 2, 1, 3))[v, v, v, v]
    B = jnp.transpose(eri_mo, (0, 2, 3, 1))[v, v, v, v]
    return A - B, A


def spin_symmetry_error_blocks(oooo, oovv, aa, ab) -> jnp.ndarray:
    """spin_symmetry_error_traceable for the block-compressed vvvv mode
    (vvvv held as its (aa, ab) spin blocks).  Both generators close
    within the aa block (it is a complete antisymmetrised tensor over
    the alpha virtuals); for ab only the pair-exchange generator c stays
    inside the stored block (<ab||cd>_abab <-> <cd||ab>_abab) — the
    swap-last-pair generator maps into the ba block, which is not
    stored, so it is checked via the aa/oovv channels instead (any
    spin-mask or assembly error that breaks b breaks it there too)."""
    oooo = oooo.astype(jnp.float32)
    oovv = oovv.astype(jnp.float32)
    aa = aa.astype(jnp.float32)
    ab = ab.astype(jnp.float32)

    def gen2(X):
        b = jnp.sum(jnp.abs(X + jnp.transpose(X, (0, 1, 3, 2))))
        c = jnp.sum(jnp.abs(X - jnp.transpose(X, (2, 3, 0, 1))))
        return b + c

    anti = jnp.sum(jnp.abs(oovv + jnp.transpose(oovv, (0, 1, 3, 2)))) + jnp.sum(
        jnp.abs(oovv + jnp.transpose(oovv, (1, 0, 2, 3)))
    )
    c_ab = jnp.sum(jnp.abs(ab - jnp.transpose(ab, (2, 3, 0, 1))))
    return (gen2(oooo) + gen2(aa) + c_ab + anti).astype(jnp.float64)


def spinorb_levels(levels: jnp.ndarray, nocc_spatial: int) -> jnp.ndarray:
    """Spin-orbital levels in block order: [occ-alpha, occ-beta,
    virt-alpha, virt-beta] (the reference interleaves, ccsd.f90:460-463;
    see spinorb_slice for why block order is used here)."""
    e_o = levels[:nocc_spatial]
    e_v = levels[nocc_spatial:]
    return jnp.concatenate([e_o, e_o, e_v, e_v])


def spin_expand_t1(t1):
    """Closed-shell spatial t1 -> block-spin spin-orbital t1."""
    import numpy as np

    no, nv = t1.shape
    out = np.zeros((2 * no, 2 * nv))
    out[:no, :nv] = t1
    out[no:, nv:] = t1
    return out


def spin_expand_t2(t2):
    """Closed-shell spatial t2 -> antisymmetrised block-spin t2:
    t2_so[(si I)(sj J)(sa A)(sb B)] = d(si,sa)d(sj,sb) t2[I,J,A,B]
                                     - d(si,sb)d(sj,sa) t2[I,J,B,A]."""
    import numpy as np

    no, _, nv, _ = t2.shape
    out = np.zeros((2 * no, 2 * no, 2 * nv, 2 * nv))
    t2swap = t2.transpose(0, 1, 3, 2)
    for si in (0, 1):
        for sj in (0, 1):
            for sa in (0, 1):
                for sb in (0, 1):
                    v = 0.0
                    if si == sa and sj == sb:
                        v = t2 - t2swap if (si == sb and sj == sa) else t2
                    elif si == sb and sj == sa:
                        v = -t2swap
                    else:
                        continue
                    out[
                        si * no : (si + 1) * no,
                        sj * no : (sj + 1) * no,
                        sa * nv : (sa + 1) * nv,
                        sb * nv : (sb + 1) * nv,
                    ] = v
    return out


def spin_symmetry_error_traceable(oooo, oovv, vvvv) -> jnp.ndarray:
    """Traceable core of the runtime self-check (ccsd.f90:150-173):
    deviation from
    <pq||rs> = -<pq||sr> = <rs||pq> = -<sr||pq> = <sr||qp>, evaluated on
    the stored oooo/vvvv slices (where the identities close within one
    slice) plus both antisymmetries of oovv.  The reference hard-errors
    above depsilon; callers should do the same.

    Only the two GENERATORS of the reference's identity set are summed:
    b = swap-last-pair (sign -) and c = exchange-pairs (sign +).  The
    other two checked permutations are products (X^(3,2,0,1) = (X^c)^b
    with sign -, X^(3,2,1,0) = ((X^b)^c)^b with sign +), so exact
    b/c-symmetry implies them, and any O(1) violation of a product is
    bounded below by a generator violation (triangle inequality) — the
    check detects exactly the same failures (wrong spin masks / block
    assembly) at half the traffic.  Both generators are plain 4-D
    transposes: XLA lowers those to its tiled transpose path, whereas
    the "clever" (n^2, n^2) matrix reshape forces a full re-tile for
    lane-unaligned n and measured 750-900 ms on the pVTZ v^4 slice
    (vs ~170-245 ms for the literal four-term permute form — measured
    r3, both on hardware).

    Evaluated in f32: the violations this check exists to catch are
    O(1), and an exactly-symmetric f64 tensor stays exactly symmetric
    under an elementwise cast (transpose commutes with cast), so the
    f32 evaluation cannot mask a real violation.  This function is
    meant to be traced INTO a larger program (spinorb_cc_init) so the
    slices it reads are already HBM-resident and no extra dispatch or
    readback round-trip is paid."""
    oooo = oooo.astype(jnp.float32)
    oovv = oovv.astype(jnp.float32)
    vvvv = vvvv.astype(jnp.float32)

    def gen2(X):
        b = jnp.sum(
            jnp.abs(X + jnp.transpose(X, (0, 1, 3, 2)))
        )  # b: <pq||rs> = -<pq||sr>
        c = jnp.sum(
            jnp.abs(X - jnp.transpose(X, (2, 3, 0, 1)))
        )  # c: <pq||rs> = <rs||pq>
        return b + c

    anti = jnp.sum(jnp.abs(oovv + jnp.transpose(oovv, (0, 1, 3, 2)))) + jnp.sum(
        jnp.abs(oovv + jnp.transpose(oovv, (1, 0, 2, 3)))
    )
    return (gen2(oooo) + gen2(vvvv) + anti).astype(jnp.float64)


def spin_slices_symmetry_error(oooo, oovv, vvvv) -> jnp.ndarray:
    """Standalone jitted wrapper of spin_symmetry_error_traceable (the
    production pipeline gets the check fused into spinorb_cc_init; this
    entry point serves tests and ad-hoc validation)."""
    import jax

    return jax.jit(spin_symmetry_error_traceable)(oooo, oovv, vvvv)


def permutational_symmetry_error(asym: jnp.ndarray) -> float:
    """The reference's runtime self-check (ccsd.f90:150-167): accumulated
    deviation from <pq||rs> = -<pq||sr> = <rs||pq> = -<sr||pq> = <sr||qp>
    over canonical index quadruples p>=q, r<=p, s<=min(r,p)."""
    import numpy as np

    a = np.asarray(asym)
    n = a.shape[0]
    err = 0.0
    for p in range(n):
        for q in range(p + 1):
            for r in range(p + 1):
                for s in range(min(r, p) + 1):
                    err += (
                        abs(a[p, q, r, s] + a[p, q, s, r])
                        + abs(a[p, q, r, s] - a[r, s, p, q])
                        + abs(a[p, q, r, s] + a[s, r, p, q])
                        + abs(a[p, q, r, s] - a[s, r, q, p])
                    )
    return err
