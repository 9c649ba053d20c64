"""Unit tests for the device-side CC machinery: the spin-blocked vvvv
contraction and the one-dispatch while_loop solver, checked against their
straightforward counterparts."""

import numpy as np
import jax.numpy as jnp

from afesp_tpu.methods.ccsd_spinorb import (
    SpinSlices,
    ccsd_spinorb_iteration,
    cc_energy_spinorb,
    tau_vvvv_blocked,
)
from afesp_tpu.ops.spin import spinorb_slice, spin_expand_t1, spin_expand_t2
from afesp_tpu.ops.cc_step import init_cc_state, make_fused_cc_step, make_cc_solver


def _spin_problem(seed=0, no_sp=2, nv_sp=4):
    """Random but physically structured spin-orbital tensors: an 8-fold
    symmetric spatial ERI expanded through the production antisymmetriser,
    plus closed-shell-expanded amplitudes (proper spin blocks and
    antisymmetry — required for the blocked-contraction identities)."""
    rng = np.random.default_rng(seed)
    n = no_sp + nv_sp
    eri = rng.standard_normal((n, n, n, n)) * 0.1
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    eri = jnp.asarray(eri)
    slices = SpinSlices(
        *(
            spinorb_slice(eri, b, no_sp)
            for b in SpinSlices._fields
            if b != "vvvv_blocks"  # optional block-compressed form
        )
    )
    t1 = jnp.asarray(spin_expand_t1(rng.standard_normal((no_sp, nv_sp)) * 0.05))
    t2sp = rng.standard_normal((no_sp, no_sp, nv_sp, nv_sp)) * 0.05
    t2sp = t2sp + t2sp.transpose(1, 0, 3, 2)
    t2 = jnp.asarray(spin_expand_t2(t2sp))
    e = np.sort(rng.standard_normal(n))
    e[no_sp:] += 4.0
    lv = np.concatenate([e[:no_sp], e[:no_sp], e[no_sp:], e[no_sp:]])
    o, v = 2 * no_sp, 2 * nv_sp
    D_ia = jnp.asarray(lv[:o, None] - lv[None, o:])
    D_ijab = jnp.asarray(
        lv[:o, None, None, None]
        + lv[None, :o, None, None]
        - lv[None, None, o:, None]
        - lv[None, None, None, o:]
    )
    return t1, t2, slices, D_ia, D_ijab


def test_tau_vvvv_blocked_matches_dense():
    t1, t2, v, _, _ = _spin_problem()
    x = jnp.einsum("ia,jb->ijab", t1, t1)
    tau = t2 + x - jnp.transpose(x, (0, 1, 3, 2))
    dense = 0.5 * jnp.einsum("ijef,efab->ijab", tau, v.vvvv)
    blocked = tau_vvvv_blocked(tau, v.vvvv)
    assert np.abs(np.asarray(blocked) - np.asarray(dense)).max() < 1e-13


def test_tau_vvvv_blocked_after_iterations():
    """The identity must keep holding on *iterated* amplitudes (general
    spin-orbital t2 with proper block structure, not just the
    closed-shell-expanded guess)."""
    t1, t2, v, D_ia, D_ijab = _spin_problem(seed=5)
    for _ in range(3):
        t1, t2 = ccsd_spinorb_iteration(t1, t2, v, D_ia, D_ijab)
    x = jnp.einsum("ia,jb->ijab", t1, t1)
    tau = t2 + x - jnp.transpose(x, (0, 1, 3, 2))
    dense = 0.5 * jnp.einsum("ijef,efab->ijab", tau, v.vvvv)
    blocked = tau_vvvv_blocked(tau, v.vvvv)
    assert np.abs(np.asarray(blocked) - np.asarray(dense)).max() < 1e-13


def test_while_loop_solver_matches_host_loop():
    """make_cc_solver must reproduce the host loop over make_fused_cc_step
    exactly: same iteration count, same per-iteration energies/RMS, same
    final (raw and extrapolated) amplitudes."""
    t1, t2, v, D_ia, D_ijab = _spin_problem(seed=7)
    nerr, maxiter = 4, 50
    e_tol, t_tol = 1e-8, 1e-7

    step = make_fused_cc_step(ccsd_spinorb_iteration, cc_energy_spinorb)
    e0, _ = cc_energy_spinorb(t1, t2, jnp.zeros_like(t2), v.oovv)
    state = init_cc_state(t1, t2, nerr)
    energy = float(e0)
    host_hist = []
    host_it = 0
    for it in range(1, maxiter + 1):
        state, e, r2 = step(state, v, D_ia, D_ijab, v.oovv, nerr=nerr)
        e, r2 = float(e), float(r2)
        host_hist.append((e, r2))
        host_it = it
        if np.sqrt(r2) < t_tol and abs(e - energy) < e_tol:
            break
        energy = e
    host_state = state

    state0 = init_cc_state(t1, t2, nerr)
    solver = make_cc_solver(ccsd_spinorb_iteration, cc_energy_spinorb)
    st, n_iter, done, hist_e, hist_rms = solver(
        state0, v, D_ia, D_ijab, v.oovv, e0, e_tol, t_tol, nerr=nerr, maxiter=maxiter
    )
    assert host_it < maxiter, "problem must converge for the test to bite"
    assert int(n_iter) == host_it
    assert bool(done)
    for k, (e, r2) in enumerate(host_hist):
        assert abs(float(hist_e[k]) - e) < 1e-12
        assert abs(float(hist_rms[k]) - r2) < 1e-14
    np.testing.assert_allclose(
        np.asarray(st.t1_raw), np.asarray(host_state.t1_raw), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.t2_raw), np.asarray(host_state.t2_raw), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.t2), np.asarray(host_state.t2), rtol=0, atol=1e-12
    )


def test_hybrid_precision_ccsd(sample_data, tmp_path):
    """ccsd_precision='hybrid' (Ozaki-split f32 vvvv GEMMs with chunked
    f64 accumulation) must converge to the f64 answer within the 1e-8
    contract, with the same iteration count."""
    import io

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb

    d = sample_data / "h2o-cc-pvdz/1.80_104.45"
    results = {}
    for prec in ("f64", "hybrid"):
        cfg = read_els_in(d)
        cfg.scf_write_guess = False
        cfg.restricted = False
        cfg.ccsd_precision = prec
        sys_, ints = dat.read_integrals(d, cfg.restricted)
        rep = Reporter(stream=io.StringIO())
        hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
        mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
        cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, tmp_path)
        assert cc.converged
        results[prec] = cc
    assert abs(results["hybrid"].e_ccsd - results["f64"].e_ccsd) < 5e-9
    assert results["hybrid"].iterations == results["f64"].iterations


def test_spin_blocked_einsum_matches_dense():
    """The generic Sz-block-sparse einsum must equal the dense einsum on
    physically structured tensors, across representative contraction
    shapes from the CCSD iteration."""
    from afesp_tpu.ops.spin_einsum import spin_blocked_einsum

    t1, t2, v, D_ia, D_ijab = _spin_problem(seed=11)
    # iterate once so t2 is a general spin-orbital tensor
    t1, t2 = ccsd_spinorb_iteration(t1, t2, v, D_ia, D_ijab)
    cases = [
        ("miea,mbej->ijab", t2, v.ovvo),
        ("mnef,jnfb->mbej", v.oovv, t2),
        ("ijef,maef->ijma", t2, v.ovvv),
        ("mnef,ijef->mnij", v.oovv, t2),
        ("mnaf,mnfe->ae", t2, v.oovv),
        ("ne,nmie->mi", t1, v.ooov),
    ]
    for spec, a, b in cases:
        dense = jnp.einsum(spec, a, b, optimize=True)
        blocked = spin_blocked_einsum(spec, a, b)
        assert np.abs(np.asarray(blocked) - np.asarray(dense)).max() < 1e-13, spec


def test_permutational_selfcheck_detects_corruption():
    """The runtime self-check (ccsd.f90:150-173 analogue) must be ~0 on
    production slices and fire on a corrupted tensor."""
    from afesp_tpu.ops.spin import spin_slices_symmetry_error

    _, _, v, _, _ = _spin_problem()
    err = float(spin_slices_symmetry_error(v.oooo, v.oovv, v.vvvv))
    assert err < 1e-10
    bad = v.vvvv.at[0, 1, 2, 3].add(1e-3)
    err_bad = float(spin_slices_symmetry_error(v.oooo, v.oovv, bad))
    assert err_bad > 1e-4


def test_split_einsum_matches_dense():
    """split_einsum (Ozaki-split f32 GEMM evaluation of a two-operand
    contraction) must agree with the f64 einsum to f32-accumulation
    accuracy on amplitude-scaled data — the hybrid CCSD iteration routes
    its O(o^3 v^3) terms through it."""
    from afesp_tpu.methods.ccsd_spinorb import split_einsum

    t1, t2, v, D_ia, D_ijab = _spin_problem(seed=7)
    t1, t2 = ccsd_spinorb_iteration(t1, t2, v, D_ia, D_ijab)
    cases = [
        ("mnef,jnfb->mbej", v.oovv, 0.5 * t2),
        ("miea,mbej->ijab", t2, v.ovvo),
        ("ijef,maef->ijma", t2, v.ovvv),
    ]
    for spec, a, b in cases:
        dense = np.asarray(jnp.einsum(spec, a, b, optimize=True))
        split = np.asarray(split_einsum(spec, a, b))
        scale = max(np.abs(dense).max(), 1e-30)
        assert np.abs(split - dense).max() / scale < 1e-6, spec
