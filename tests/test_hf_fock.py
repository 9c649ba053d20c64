"""Threshold-boundary test for the TPU Fock build: fock_build_jax must
equal the host numpy path to roundoff (the nbasis >= _TPU_FOCK_NBASIS
gate in do_rhf switches between them, so they must be interchangeable)."""

import jax
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


def test_fock_packed_triangle_download_paths():
    """The packed-upper-triangle device download (the large-n tunnel
    optimisation in do_rhf) must reconstruct the full Fock to roundoff,
    and the early-iteration f32 variant must agree to f32 resolution.

    Roundoff, not bitwise: the packed and full builds are two different
    XLA programs, and the digit-GEMM recombination's single fused f64
    reduction (ops/exact_gemm._recombine) may associate differently
    under each program's fusion choices — a ~1-ulp effect."""
    from afesp_tpu.methods.hf import _fock_build_split

    n = 24
    H, eri, D = _random_scf_state(n, seed=7)
    consts = _fock_split_consts(jnp.asarray(eri))
    F_full = _build_fock(H, eri, D, consts)
    iu = np.triu_indices(n)
    iu_dev = (jnp.asarray(iu[0]), jnp.asarray(iu[1]))

    fp = np.asarray(
        _fock_build_split(jnp.asarray(H), jnp.asarray(D), consts, iu_dev),
        dtype=np.float64,
    )
    F = np.empty((n, n))
    F[iu] = fp
    F.T[iu] = fp
    scale_f = np.max(np.abs(F_full))
    np.testing.assert_allclose(F, F_full, rtol=0, atol=1e-14 * scale_f)

    fp32 = np.asarray(
        _fock_build_split(
            jnp.asarray(H), jnp.asarray(D), consts, iu_dev, packed_f32=True
        ),
        dtype=np.float64,
    )
    F32 = np.empty((n, n))
    F32[iu] = fp32
    F32.T[iu] = fp32
    scale = np.max(np.abs(F_full))
    assert np.max(np.abs(F32 - F_full)) < 1e-6 * scale


def test_scf_prelude_device_near_fixed_point(sample_data):
    """The device SCF prelude (large-n tunnel path) must land within the
    f32-eigh noise floor of the true f64 stationary point, so the host
    polish loop starts essentially converged."""
    from afesp_tpu.config import Config
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.hf import (
        _scf_prelude_device,
        do_rhf,
        symmetric_orthogonaliser_np,
    )
    import io

    d = sample_data / "h2o-cc-pvdz" / "1.80_104.45"
    sys_, ints = dat.read_integrals(d, restricted=True)
    cfg = Config()
    hf = do_rhf(sys_, ints, cfg, Reporter(stream=io.StringIO()))
    assert hf.converged

    n = sys_.nbasis
    nocc = sys_.nel // 2
    consts = _fock_split_consts(jnp.asarray(ints.eri))
    X = symmetric_orthogonaliser_np(ints.ovlp)
    iu = np.triu_indices(n)
    fp, iters = _scf_prelude_device(
        jnp.asarray(ints.core_hamil),
        jnp.asarray(ints.ovlp),
        jnp.asarray(X),
        consts,
        (jnp.asarray(iu[0]), jnp.asarray(iu[1])),
        nocc=nocc,
        nerr=6,
        maxiter=40,
    )
    assert int(iters) >= 2
    F = np.empty((n, n))
    F[iu] = np.asarray(fp, dtype=np.float64)
    F.T[iu] = F[iu]

    # one host diagonalisation of the prelude Fock: energy must sit at
    # the f32-eigh noise floor of the converged host energy
    Fp = X.T @ F @ X
    _, Cp = np.linalg.eigh(Fp)
    C = (X @ Cp).T
    D = C[:nocc].T @ C[:nocc]
    energy = float(np.sum(D * (ints.core_hamil + F)))
    assert abs(energy - hf.e_hf) < 1e-7


def test_purify_density_matches_eigh_projector():
    """Canonical purification must reproduce the occupied-subspace
    projector of a random symmetric matrix to f64 accuracy."""
    from afesp_tpu.methods.hf import purify_density

    rng = np.random.default_rng(3)
    m, nocc = 40, 7
    A = rng.standard_normal((m, m))
    A = (A + A.T) / 2
    # open a clear HOMO-LUMO gap so the projector is well defined
    w, V = np.linalg.eigh(A)
    w[nocc:] += 2.0
    A = (V * w) @ V.T
    D_ref = V[:, :nocc] @ V[:, :nocc].T

    D, n_it = jax.jit(purify_density, static_argnames=("nocc",))(
        jnp.asarray(A), nocc=nocc
    )
    assert int(n_it) < 100
    np.testing.assert_allclose(np.asarray(D), D_ref, rtol=0, atol=1e-10)
    assert abs(float(jnp.trace(D)) - nocc) < 1e-10
