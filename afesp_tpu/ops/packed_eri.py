"""8-fold-symmetric packed ERI <-> dense, TPU-side unpack.

The reference stores the ERI packed triangular-of-triangular
(integrals.f90:10-45, `eri_ind`: pair index ij = i(i+1)/2 + j for i>=j,
quad index = ij(ij+1)/2 + kl for ij>=kl) and unpacks lazily per element.
Here the packed array is used as a *transfer* format: behind the remote
axon tunnel (~28 MB/s up) the dense 116-bf f64 ERI costs ~52 s to ship,
while the packed unique elements are 8x smaller (~6.6 s); the scatter to
the dense (n,n,n,n) tensor every downstream einsum wants then runs ON
DEVICE as one gather over a device-computed index map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pack_eri(eri: np.ndarray) -> np.ndarray:
    """Dense (n,n,n,n) chemist ERI -> packed unique elements, ordered by
    the reference's eri_ind (integrals.f90:196-210): position of the
    canonical quadruple (i>=j, k>=l, ij>=kl) is tri(ij) + kl with
    tri(x) = x(x+1)/2; np.tril_indices enumerates exactly that order."""
    n = eri.shape[0]
    I, J = np.tril_indices(n)  # pair p=(i,j), i>=j, at p = i(i+1)/2 + j
    IJ, KL = np.tril_indices(len(I))  # quad q=(ij,kl), ij>=kl
    return np.ascontiguousarray(eri[I[IJ], J[IJ], I[KL], J[KL]])


@partial(jax.jit, static_argnames=("n",))
def unpack_eri(packed: jnp.ndarray, *, n: int) -> jnp.ndarray:
    """Packed -> dense (n,n,n,n) as ONE device gather.

    The (n^2, n^2) index map is generated on device from iotas (uploading
    it would cost more than the dense tensor).  int32 index arithmetic is
    exact for n <= 300 (npair*(npair+1) < 2^31); the reference's packed
    store itself caps at ~99 basis functions (bignum=5000)."""
    assert n <= 300, "int32 packed-index arithmetic overflows beyond n=300"
    i = jnp.arange(n, dtype=jnp.int32)
    lo = jnp.minimum(i[:, None], i[None, :])
    hi = jnp.maximum(i[:, None], i[None, :])
    pair = (hi * (hi + 1) // 2 + lo).reshape(-1)  # (n^2,)
    ij = pair[:, None]
    kl = pair[None, :]
    plo = jnp.minimum(ij, kl)
    phi = jnp.maximum(ij, kl)
    ind = phi * (phi + 1) // 2 + plo  # (n^2, n^2)
    return packed[ind].reshape(n, n, n, n)
