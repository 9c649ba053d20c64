"""afesp_tpu — a TPU-native electronic-structure stack.

A ground-up JAX/XLA/Pallas re-design of the capabilities of AFESP
(A Fortran Electronic Structure Programme): restricted Hartree-Fock with
DIIS, the O(N^5) AO->MO integral transformation + MP2, spin-orbital
(Stanton 1991) and spin-free (Piecuch 2002) CCSD with amplitude DIIS, and
the six-variant perturbative-triples family (CCSD[T]/(T), R-, CR-).

Everything runs in float64 (XLA f64 emulation on TPU for the
accuracy-critical path; optional split-precision fast paths for the hot
contractions).  Reference behaviour citations point into the upstream
Fortran sources as `file.f90:line`.
"""

import jax

# The 1e-8 Ha accuracy contract (BASELINE.md) requires f64 end-to-end.
jax.config.update("jax_enable_x64", True)
# All dot_generals default to the highest-precision algorithm available.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
