"""Split-f32 MXU paths for the large-basis HF Fock build and AO->MO
transform (VERDICT r1 item 1), plus the packed-ERI device transfer
format: precision vs the all-f64 formulations, exactness of pack/unpack.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from afesp_tpu.methods.hf import _fock_build_split, _fock_split_consts
from afesp_tpu.methods.mp2 import _ao_to_mo_oneshot, _ao_to_mo_split, mp2_energy
from afesp_tpu.ops.packed_eri import pack_eri, unpack_eri


def _symmetric_eri(n: int, seed: int = 0) -> np.ndarray:
    """Random tensor with the full 8-fold permutational ERI symmetry."""
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, n, n, n))
    e = e + e.transpose(1, 0, 2, 3)
    e = e + e.transpose(0, 1, 3, 2)
    e = e + e.transpose(2, 3, 0, 1)
    return e / 8.0


def test_pack_unpack_roundtrip_exact():
    n = 11
    dense = _symmetric_eri(n)
    packed = pack_eri(dense)
    npair = n * (n + 1) // 2
    assert packed.shape == (npair * (npair + 1) // 2,)
    back = np.asarray(unpack_eri(jnp.asarray(packed), n=n))
    # pure gathers of identical values: bitwise equality, not tolerance
    assert np.array_equal(back, dense)


def test_ao_to_mo_split_matches_f64():
    # integer-limb exact GEMM: error is ~2^-49 of the row/col scale per
    # stage (digit products and int32 accumulations are exact), i.e.
    # f64-grade even on adversarial dense random data
    n = 18
    eri = _symmetric_eri(n, seed=1)
    rng = np.random.default_rng(2)
    C = rng.standard_normal((n, n)) / np.sqrt(n)
    ref = np.asarray(_ao_to_mo_oneshot(jnp.asarray(eri), jnp.asarray(C)))
    out = np.asarray(_ao_to_mo_split(jnp.asarray(eri), jnp.asarray(C)))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 1e-12 * max(scale, 1.0)


def test_ao_to_mo_split_mp2_energy_real_fixture():
    """End-to-end on real integrals (h2o/cc-pVDZ, 25 bf): the MP2
    correlation energy from the exact-GEMM transform must sit far inside
    the 1e-8 Ha contract of the all-f64 transform."""
    from pathlib import Path

    from afesp_tpu.config import parse_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.methods.hf import do_rhf

    fixture = Path("/root/reference/sample_data/h2o-cc-pvdz/1.80_104.45")
    if not (fixture / "eri.dat").exists():
        pytest.skip("reference fixture unavailable")
    cfg = parse_els_in('&elsinput\ncalc_type="MP2_spatial"\n/')
    sys_, ints = dat.read_integrals(fixture, restricted=True)
    hf = do_rhf(sys_, ints, cfg)
    C = jnp.asarray(hf.coeff)
    lv = jnp.asarray(hf.levels)
    eri = jnp.asarray(ints.eri)
    nocc = sys_.nel // 2
    e_ref = float(mp2_energy(_ao_to_mo_oneshot(eri, C), lv, nocc=nocc))
    e_out = float(mp2_energy(_ao_to_mo_split(eri, C), lv, nocc=nocc))
    assert abs(e_ref - e_out) < 1e-11


def test_fock_build_split_matches_f64():
    n = 16
    eri = _symmetric_eri(n, seed=3)
    rng = np.random.default_rng(4)
    H = rng.standard_normal((n, n))
    H = H + H.T
    C = rng.standard_normal((n // 2, n))
    D = C.T @ C
    J = np.einsum("ijkl,kl->ij", eri, D)
    K = np.einsum("ikjl,kl->ij", eri, D)
    ref = H + 2.0 * J - K
    consts = _fock_split_consts(jnp.asarray(eri))
    out = np.asarray(_fock_build_split(jnp.asarray(H), jnp.asarray(D), consts))
    assert np.abs(out - ref).max() < 1e-12 * max(np.abs(ref).max(), 1.0)


def test_fock_build_stream_matches_dense():
    """The gather-digitized stream Fock consts (packed-resident tier)
    must reproduce the dense einsum Fock to f64 grade."""
    from afesp_tpu.methods.hf import _fock_build_stream, _fock_stream_consts

    n = 14
    eri = _symmetric_eri(n, seed=5)
    packed = jnp.asarray(pack_eri(eri))
    rng = np.random.default_rng(6)
    H = rng.standard_normal((n, n))
    H = H + H.T
    C = rng.standard_normal((n // 2, n))
    D = C.T @ C
    ref = (
        H
        + 2.0 * np.einsum("ijkl,kl->ij", eri, D)
        - np.einsum("ikjl,kl->ij", eri, D)
    )
    tk, tl = (jnp.asarray(x.astype(np.int32)) for x in np.tril_indices(n))
    consts = _fock_stream_consts(packed, tk, tl, n=n)
    out = np.asarray(
        _fock_build_stream(jnp.asarray(H), jnp.asarray(D), consts, tk, tl)
    )
    assert np.abs(out - ref).max() < 1e-11 * max(np.abs(ref).max(), 1.0)
    # packed upper-triangle download path
    iu = np.triu_indices(n)
    fp = np.asarray(
        _fock_build_stream(
            jnp.asarray(H), jnp.asarray(D), consts, tk, tl,
            (jnp.asarray(iu[0]), jnp.asarray(iu[1])),
        )
    )
    assert np.abs(fp - ref[iu]).max() < 1e-11 * max(np.abs(ref).max(), 1.0)


def test_scf_prelude_stream_matches_dense_consts():
    """The device SCF prelude driven by stream consts converges to the
    same Fock as with the dense-digitized consts (same Fock map)."""
    from afesp_tpu.methods.hf import (
        _fock_split_consts,
        _fock_stream_consts,
        _scf_prelude_device,
    )

    n, nocc = 12, 3
    eri = _symmetric_eri(n, seed=13)
    # make it diagonally dominant enough to behave like a Fock operator
    rng = np.random.default_rng(14)
    Hd = np.diag(np.linspace(-3.0, 2.0, n))
    H = Hd + 0.05 * _sym(rng, n)
    S = np.eye(n) + 0.01 * _sym(rng, n)
    from afesp_tpu.methods.hf import symmetric_orthogonaliser_np

    X = symmetric_orthogonaliser_np(S)
    iu = np.triu_indices(n)
    iu_d = (jnp.asarray(iu[0]), jnp.asarray(iu[1]))
    args = (jnp.asarray(H), jnp.asarray(S), jnp.asarray(X))
    dense_c = _fock_split_consts(jnp.asarray(eri))
    fp_d, _ = _scf_prelude_device(
        *args, dense_c, iu_d, nocc=nocc, nerr=6, maxiter=40
    )
    tk, tl = (jnp.asarray(x.astype(np.int32)) for x in np.tril_indices(n))
    stream_c = _fock_stream_consts(jnp.asarray(pack_eri(eri)), tk, tl, n=n)
    fp_s, _ = _scf_prelude_device(
        *args, stream_c, iu_d, tk, tl, nocc=nocc, nerr=6, maxiter=40,
        stream=True,
    )
    a, b = np.asarray(fp_d), np.asarray(fp_s)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() < 1e-6 * max(np.abs(a).max(), 1.0)


def _sym(rng, n):
    A = rng.standard_normal((n, n))
    return (A + A.T) / 2.0


def test_pack_from_table_matches_dense_pack():
    """The table->packed fast path (io/dat.pack_from_table) must agree
    bitwise with packing the scattered dense tensor."""
    from pathlib import Path

    from afesp_tpu.io import dat

    fixture = Path("/root/reference/sample_data/h2o-cc-pvdz/1.80_104.45")
    if not (fixture / "eri.dat").exists():
        pytest.skip("reference fixture unavailable")
    sys_, ints = dat.read_integrals(fixture, restricted=True)
    assert np.array_equal(ints.eri_packed, pack_eri(ints.eri))
    back = np.asarray(
        unpack_eri(jnp.asarray(ints.eri_packed), n=sys_.nbasis)
    )
    assert np.array_equal(back, ints.eri)


def test_exact_gemm_prechunk_paths_bitwise():
    """A_pre/B_pre must be pure precomputation: the digit GEMM result is
    bitwise identical whichever side(s) are prechunked."""
    from afesp_tpu.ops.exact_gemm import (
        exact_gemm,
        prechunk_A,
        prechunk_B,
    )

    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((37, 700)))
    B = jnp.asarray(rng.standard_normal((700, 53)))
    full = np.asarray(exact_gemm(A, B, L=5, maxdeg=6))
    Ap, Bp = prechunk_A(A, L=5), prechunk_B(B, L=5)
    viaA = np.asarray(exact_gemm(B=B, A_pre=Ap, maxdeg=6))
    viaB = np.asarray(exact_gemm(A=A, B_pre=Bp, maxdeg=6))
    both = np.asarray(exact_gemm(A_pre=Ap, B_pre=Bp, maxdeg=6))
    assert np.array_equal(full, viaA)
    assert np.array_equal(full, viaB)
    assert np.array_equal(full, both)


def test_exact_gemm_chunkscaled_B():
    """Per-chunk-scaled B digitization: f64-grade accuracy (strictly
    tighter than flat scales on wide-dynamic-range operands), correct
    through both exact_gemm and exact_einsum with a shape-only operand,
    and a faithful f32 reconstruction."""
    from afesp_tpu.ops.exact_gemm import (
        exact_einsum,
        exact_gemm,
        prechunk_B_chunkscaled,
        reconstruct_f32_from_B_pre,
    )

    rng = np.random.default_rng(12)
    K, N, M = 1536, 29, 17  # kc=512, nc=3
    B = rng.standard_normal((K, N))
    # adversarial dynamic range: chunk 1 tiny, chunk 2 huge
    B[512:1024] *= 1e-6
    B[1024:] *= 1e4
    A = rng.standard_normal((M, K))
    ref = A @ B
    # L=6/maxdeg=7 is the production hybrid setting (spatial_presplit);
    # error ~2^-43-of-scale * sqrt(K) accumulation
    Bp = prechunk_B_chunkscaled(jnp.asarray(B), L=6)
    out = np.asarray(exact_gemm(A=jnp.asarray(A), B_pre=Bp, L=6, maxdeg=7))
    assert np.abs(out - ref).max() < 1e-11 * np.abs(ref).max()

    # shape-only operand through exact_einsum (the v_vvvv solve route)
    A4 = jnp.asarray(rng.standard_normal((3, 4, 32, 48)))  # (i,j,e,f)
    B4 = rng.standard_normal((32, 48, 6, 8))  # (e,f,a,b), K=1536
    Bp4 = prechunk_B_chunkscaled(jnp.asarray(B4.reshape(K, 48)), L=6)
    ref4 = np.einsum("ijef,efab->ijab", np.asarray(A4), B4)
    out4 = np.asarray(
        exact_einsum(
            "ijef,efab->ijab", A4, None, L=6, maxdeg=7,
            B_pre=Bp4, B_shape=(32, 48, 6, 8),
        )
    )
    assert np.abs(out4 - ref4).max() < 1e-11 * np.abs(ref4).max()

    # f32 reconstruction round trip
    back = np.asarray(reconstruct_f32_from_B_pre(Bp, K, N))
    assert np.abs(back - B).max() < 2e-7 * np.abs(B).max()
