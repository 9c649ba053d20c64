"""Multi-chip path tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from afesp_tpu.parallel.mesh import default_mesh
from afesp_tpu.parallel.triples_shard import triples_energy_sharded


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _random_spin_problem(no=4, nv=16, seed=0):
    from afesp_tpu.methods.ccsd_spinorb import SpinSlices

    rng = np.random.default_rng(seed)
    o, v = no, nv
    r = lambda *shape: jnp.asarray(rng.standard_normal(shape) * 0.05)
    slices = SpinSlices(
        oooo=r(o, o, o, o),
        ooov=r(o, o, o, v),
        ovoo=r(o, v, o, o),
        oovo=r(o, o, v, o),
        oovv=r(o, o, v, v),
        ovvo=r(o, v, v, o),
        ovvv=r(o, v, v, v),
        vovv=r(v, o, v, v),
        vvvv=r(v, v, v, v),
    )
    t1 = r(o, v) * 0.4
    t2 = r(o, o, v, v) * 0.4
    e = np.sort(rng.standard_normal(o + v))
    e[o:] += 4.0
    e_o, e_v = e[:o], e[o:]
    D_ia = jnp.asarray(e_o[:, None] - e_v[None, :])
    D_ijab = jnp.asarray(
        e_o[:, None, None, None]
        + e_o[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    return t1, t2, slices, D_ia, D_ijab


def test_sharded_ccsd_iteration_matches_unsharded():
    """GSPMD virtual-axis sharding must be numerically inert: the sharded
    CCSD iteration equals the single-device iteration to f64 roundoff."""
    from afesp_tpu.methods.ccsd_spinorb import ccsd_spinorb_iteration
    from afesp_tpu.parallel.ccsd_shard import ccsd_iteration_sharded

    t1, t2, slices, D_ia, D_ijab = _random_spin_problem()
    ref1, ref2 = ccsd_spinorb_iteration(t1, t2, slices, D_ia, D_ijab)

    mesh = default_mesh(8)
    sh1, sh2 = ccsd_iteration_sharded(mesh, t1, t2, slices, D_ia, D_ijab)
    np.testing.assert_allclose(np.asarray(sh1), np.asarray(ref1), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sh2), np.asarray(ref2), rtol=0, atol=1e-12)


def test_sharded_triples_matches_single(sample_data, tmp_path):
    from test_ccsd_spatial import run_pipeline
    from afesp_tpu.ops.spin import spin_expand_t1, spin_expand_t2
    from afesp_tpu.methods.ccsd_spinorb import make_spin_slices
    from afesp_tpu.methods.triples_spinorb import _triples_chunk
    from afesp_tpu.ops.spin import spinorb_levels

    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45"
    )
    slices = make_spin_slices(mp2.eri_mo, nocc_spatial=sys_.nel // 2)
    t1 = jnp.asarray(spin_expand_t1(cc.t1))
    t2 = jnp.asarray(spin_expand_t2(cc.t2))
    lv = spinorb_levels(jnp.asarray(hf.levels), sys_.nel // 2)
    nocc = sys_.nel
    e_o, e_v = lv[:nocc], lv[nocc:]

    # single-device value
    idx = np.arange(nocc)
    ii, jj, kk = (x.ravel() for x in np.meshgrid(idx, idx, idx, indexing="ij"))
    e_single = float(
        _triples_chunk(
            jnp.asarray(ii),
            jnp.asarray(jj),
            jnp.asarray(kk),
            t1,
            t2,
            slices.vovv,
            slices.ovoo,
            slices.oovv,
            e_o,
            e_v,
        )
    )

    mesh = default_mesh(8)
    e_sharded = triples_energy_sharded(
        mesh,
        nocc,
        t1,
        t2,
        slices.vovv,
        slices.ovoo,
        slices.oovv,
        e_o,
        e_v,
        inner_chunk=25,
    )
    assert abs(e_sharded - e_single) < 1e-12

    # and the PRODUCTION strict-triangle path, single-device + sharded
    from afesp_tpu.methods.triples_spinorb import (
        _triples_total_strict,
        strict_plan,
    )
    from afesp_tpu.parallel.triples_shard import triples_total_sharded

    args = (t1, t2, slices.vovv, slices.ovoo, slices.oovv, e_o, e_v)
    si, sj, sk, clen = strict_plan(nocc, len(e_v), "f64")
    e_prod = float(
        _triples_total_strict(
            *args,
            jnp.asarray(si), jnp.asarray(sj), jnp.asarray(sk),
            clen=clen, precision="f64",
        )
    )
    e_prod_sh = triples_total_sharded(mesh, *args, nocc=nocc, precision="f64")
    assert abs(e_prod - e_single) < 1e-10
    assert abs(e_prod_sh - e_prod) < 1e-11


def test_sharded_fused_solve_matches_unsharded():
    """The PRODUCTION whole-solve (lax.while_loop + on-device DIIS) under
    GSPMD virtual-axis sharding: same iteration count, same energy
    trajectory to f64 roundoff as the single-device solve."""
    import jax.numpy as jnp

    from afesp_tpu.methods.ccsd_spinorb import get_spinorb_solver
    from afesp_tpu.ops.cc_step import init_cc_state
    from afesp_tpu.parallel.ccsd_shard import ccsd_solve_sharded

    t1, t2, slices, D_ia, D_ijab = _random_spin_problem(no=4, nv=16)
    solver = get_spinorb_solver()
    nerr, maxiter = 6, 25
    state0 = init_cc_state(jnp.zeros_like(t1), t2, nerr)
    e0 = jnp.float64(0.0)
    tols = (jnp.float64(1e-10), jnp.float64(1e-10))

    st_ref, n_ref, done_ref, he_ref, hr_ref = solver(
        state0, slices, D_ia, D_ijab, slices.oovv, e0, *tols,
        nerr=nerr, maxiter=maxiter,
    )
    mesh = default_mesh(8)
    st_sh, n_sh, done_sh, he_sh, hr_sh = ccsd_solve_sharded(
        mesh, solver, state0, slices, D_ia, D_ijab, slices.oovv, e0, *tols,
        nerr=nerr, maxiter=maxiter,
    )
    assert int(n_sh) == int(n_ref) and bool(done_sh) == bool(done_ref)
    np.testing.assert_allclose(
        np.asarray(he_sh), np.asarray(he_ref), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(st_sh.t2_raw), np.asarray(st_ref.t2_raw), rtol=0, atol=1e-11
    )


def test_full_pipeline_multidevice_golden_n2(sample_data, tmp_path):
    """VERDICT r1 item 3(d): the complete user-facing pipeline (els.in
    knob mesh_devices=8) through the SHARDED solve + sharded spatial
    triples on the virtual CPU mesh, gated against the committed
    els_energy.dat goldens at 1e-8."""
    import shutil

    from afesp_tpu.config import read_els_in
    from afesp_tpu.driver import run_calculation
    from afesp_tpu.io.report import Reporter
    import io

    d = sample_data / "n2-cc-pvdz/2.00_0.00"
    for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "eri.dat", "guess_in.dat"):
        shutil.copy(d / f, tmp_path / f)
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.mesh_devices = 8
    res = run_calculation(tmp_path, Reporter(stream=io.StringIO()), cfg)

    e0 = res.e_hf + res.e_nuc
    tr = res.triples
    # els_energy.dat: all six variants + denominators
    assert abs(e0 - -108.3305827541) < 1e-8
    assert abs(res.e_ccsd + e0 - -108.9119092359) < 1e-8
    assert abs(tr.e_ccsd_t + e0 - -109.0299402389) < 1e-8
    assert abs(tr.e_ccsd_tt + e0 - -109.0154101572) < 1e-8
    assert abs(tr.e_rccsd_t + e0 - -108.9735444691) < 1e-8
    assert abs(tr.e_rccsd_tt + e0 - -108.9658259622) < 1e-8
    assert abs(tr.e_crccsd_t + e0 - -108.9593328220) < 1e-8
    assert abs(tr.e_crccsd_tt + e0 - -108.9543970939) < 1e-8
    assert abs(tr.D_T - 1.9149923969) < 1e-7
    assert abs(tr.D_TT - 1.9196440233) < 1e-7


def test_sharded_ext_solve_scales_memory_and_matches():
    """The streaming-tier (digit-limb v_vvvv) solve under the memory-
    scaling mesh: the dominant operand's per-device footprint shrinks
    1/n_dev, and the solve reproduces the unsharded external solve."""
    import jax.numpy as jnp

    from afesp_tpu.methods.ccsd_spatial import (
        ccsd_spatial_solver_ext,
        denominators,
        make_slices,
    )
    from afesp_tpu.methods.mp2 import _ao_to_mo_oneshot
    from afesp_tpu.ops.cc_step import init_cc_state
    from afesp_tpu.ops.exact_gemm import prechunk_B_chunkscaled
    from afesp_tpu.ops.packed_eri import pack_eri
    from afesp_tpu.parallel.ccsd_shard import ccsd_solve_sharded_ext

    n, nocc = 60, 12  # nvirt=48: K=2304 -> kc=288, nc=8 chunks
    rng = np.random.default_rng(21)
    e = rng.standard_normal((n, n, n, n)) * 0.02
    e = e + e.transpose(1, 0, 2, 3)
    e = e + e.transpose(0, 1, 3, 2)
    e = e + e.transpose(2, 3, 0, 1)
    eri = e / 8.0 + 4.0 * np.einsum(
        "ij,kl->ijkl", np.eye(n), np.eye(n)
    )  # diagonally dominant, CC-convergent
    C = np.linalg.qr(rng.standard_normal((n, n)))[0].T
    v = make_slices(_ao_to_mo_oneshot(jnp.asarray(eri), jnp.asarray(C)), nocc)
    levels = jnp.asarray(np.concatenate([-np.arange(1, nocc + 1)[::-1] - 1.0,
                                         2.0 + np.arange(n - nocc)]))
    D_ia, D_ijab = denominators(levels, nocc)
    nv = n - nocc
    vvvv_B = prechunk_B_chunkscaled(v.v_vvvv.reshape(nv * nv, nv * nv), L=6)
    assert vvvv_B[0][0].shape[0] == 6  # natural chunking; padded to 8 below
    v = v._replace(v_vvvv=None)
    t1 = jnp.zeros_like(D_ia)
    t2 = v.v_oovv / D_ijab
    nerr, maxiter = 6, 20
    state0 = init_cc_state(t1, t2, nerr)
    e0 = jnp.float64(0.0)
    tols = (jnp.float64(1e-10), jnp.float64(1e-10))

    st_ref, n_ref, done_ref, he_ref, _ = ccsd_spatial_solver_ext(
        state0, v, D_ia, D_ijab, v.v_oovv, e0, *tols, vvvv_B,
        nerr=nerr, maxiter=maxiter,
    )
    mesh = default_mesh(8)
    # shard the padded operand (exactly what the production path places)
    # and inspect placement: each device must hold 1/8 of the limb bytes
    # (the memory-scaling claim, VERDICT r2 item 3)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from afesp_tpu.parallel.ccsd_shard import _pad_chunk_axis

    padded = _pad_chunk_axis(vvvv_B, 8)
    assert padded[0][0].shape[0] == 8
    sh = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    probe = jax.device_put(padded[0][0], sh)
    shard_bytes = probe.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == probe.nbytes
    assert len({s.device for s in probe.addressable_shards}) == 8

    # fresh state: the ext solver DONATES its state argument
    state0b = init_cc_state(t1, t2, nerr)
    st_sh, n_sh, done_sh, he_sh, _ = ccsd_solve_sharded_ext(
        mesh, ccsd_spatial_solver_ext, state0b, v, D_ia, D_ijab, v.v_oovv,
        e0, *tols, vvvv_B, nerr=nerr, maxiter=maxiter,
    )
    assert int(n_sh) == int(n_ref) and bool(done_sh) == bool(done_ref)
    np.testing.assert_allclose(
        np.asarray(he_sh)[: int(n_ref)], np.asarray(he_ref)[: int(n_ref)],
        rtol=0, atol=1e-10,
    )
    # amplitudes see cross-chunk psum reduction-order noise (~2e-9 max);
    # the energy history above is the 1e-10 agreement gate
    np.testing.assert_allclose(
        np.asarray(st_sh.t2_raw), np.asarray(st_ref.t2_raw), rtol=0, atol=1e-8
    )


def test_cr_vvvv_term_from_limbs_sharded_matches_dense():
    """Round-4 memory scaling through the CR stage: the chain's single
    v_vvvv contraction (ccsd.f90:2513's es("ecba,ie->ciab") analog)
    computed straight from chunk-SHARDED digit limbs matches the dense
    einsum, with each device holding 1/8 of the limb bytes — the full
    v_vvvv (f64 or f32) never exists on any device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from afesp_tpu.methods.ccsd_spatial import _cr_vvvv_term_from_B
    from afesp_tpu.ops.exact_gemm import prechunk_B_chunkscaled
    from afesp_tpu.parallel.ccsd_shard import _pad_chunk_axis

    nv, o = 24, 6
    rng = np.random.default_rng(7)
    vvvv = jnp.asarray(rng.standard_normal((nv, nv, nv, nv)) * 0.1)
    t1 = jnp.asarray(rng.standard_normal((o, nv)) * 0.3)

    dense = np.asarray(jnp.einsum("ecba,ie->ciab", vvvv, t1))

    vvvv_B = prechunk_B_chunkscaled(vvvv.reshape(nv * nv, nv * nv), L=6)
    got = np.asarray(_cr_vvvv_term_from_B(t1, vvvv_B, nv=nv))
    assert got.shape == (nv, o, nv, nv)
    np.testing.assert_allclose(got, dense, rtol=0, atol=1e-7)

    # sharded over the chunk axis, exactly as ccsd_solve_sharded_ext
    # places the solve operand
    mesh = default_mesh(8)
    padded = _pad_chunk_axis(vvvv_B, 8)
    sh = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    chunks, s = padded
    vvvv_B_sh = ([jax.device_put(c, sh) for c in chunks], jax.device_put(s, sh))
    probe = vvvv_B_sh[0][0]
    assert probe.addressable_shards[0].data.nbytes * 8 == probe.nbytes
    assert len({sd.device for sd in probe.addressable_shards}) == 8
    got_sh = np.asarray(
        _cr_vvvv_term_from_B(t1, vvvv_B_sh, nv=nv, streamed=False)
    )
    np.testing.assert_allclose(got_sh, dense, rtol=0, atol=1e-7)
