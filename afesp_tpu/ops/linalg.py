"""Linear-algebra building blocks: DIIS and orthogonalisation.

The reference wraps LAPACK dsyev/dsysv (linalg.fpp:16-56); here the
eigensolves are `jnp.linalg.eigh` on device and the tiny (<=9x9) DIIS
system is solved on host.

DIIS (Pulay) is shared by the SCF (hf.f90:197-266, error = FDS-SDF) and
the CC amplitude iteration (ccsd.f90:617-676, error e_i = T_i - T'_{i-1}).
History lives in device HBM as a stacked (n_errmat, size) buffer with a
ring slot pointer; the Gram matrix is one tiny matmul per update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def symmetric_orthogonaliser(S: jnp.ndarray) -> jnp.ndarray:
    """X = S^{-1/2} = U s^{-1/2} U^T (hf.f90:48-66, Szabo-Ostlund 3.167)."""
    s, U = jnp.linalg.eigh(S)
    return (U / jnp.sqrt(s)) @ U.T


@jax.jit
def _gram(E: jnp.ndarray) -> jnp.ndarray:
    return E @ E.T


@jax.jit
def _lincomb(c: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    return jnp.tensordot(c, T, axes=1)


class Diis:
    """Ring-buffered DIIS extrapolator over flattened pytrees/arrays.

    Replicates the reference's ring-slot semantics exactly: slot index
    `iter` cycles 1..n_errmat (hf.f90:208-210, ccsd.f90:633-638) and the
    B matrix is built over *slot order* (which is immaterial to the
    solution).  `min_active` = 2 reproduces the SCF guard `if (n > 1)`
    (hf.f90:216); CC DIIS extrapolates from the first iteration
    (mathematically the identity when n_active == 1).
    """

    def __init__(self, n_errmat: int, size: int):
        self.use_diis = n_errmat >= 2
        self.n_errmat = n_errmat
        self.n_active = 0
        self.slot = -1
        if self.use_diis:
            self.T = jnp.zeros((n_errmat, size))
            self.E = jnp.zeros((n_errmat, size))

    def update(self, t_flat: jnp.ndarray, e_flat: jnp.ndarray) -> jnp.ndarray | None:
        """Push (vector, error) and return the extrapolated vector
        (or None when DIIS is off / not yet active)."""
        if not self.use_diis:
            return None
        self.slot = (self.slot + 1) % self.n_errmat
        self.n_active = min(self.n_active + 1, self.n_errmat)
        self.T = self.T.at[self.slot].set(t_flat)
        self.E = self.E.at[self.slot].set(e_flat)
        n = self.n_active
        if n < 2:
            return None

        gram = np.asarray(_gram(self.E))[:n, :n]
        # Augmented B matrix (hf.f90:217-233): symmetric, last row/col -1,
        # rhs (0,...,0,-1).  dsysv('L') sees the symmetric completion.
        B = np.zeros((n + 1, n + 1))
        B[:n, :n] = gram
        B[n, :n] = -1.0
        B[:n, n] = -1.0
        rhs = np.zeros(n + 1)
        rhs[n] = -1.0
        try:
            c = np.linalg.solve(B, rhs)
        except np.linalg.LinAlgError:
            c, *_ = np.linalg.lstsq(B, rhs, rcond=None)
        c_full = np.zeros(self.n_errmat)
        c_full[:n] = c[:n]
        return _lincomb(jnp.asarray(c_full), self.T)
