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

    eye = jnp.eye(2, dtype=eri_mo.dtype)
    out = jnp.einsum("PQRS,ac,bd->PaQbRcSd", A, eye, eye) - jnp.einsum(
        "PQRS,ad,bc->PaQbRcSd", B, eye, eye
    )
    d1, d2, d3, d4 = A.shape
    return out.reshape(2 * d1, 2 * d2, 2 * d3, 2 * d4)


def spinorb_levels(levels: jnp.ndarray) -> jnp.ndarray:
    """Duplicate each spatial level over both spins (ccsd.f90:460-463)."""
    return jnp.repeat(levels, 2)


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
