"""The >=140-bf streaming tier (AFESP_FORCE_STREAM exercises it at small
n): packed-resident transform (methods/mo_slices.py), v_vvvv as per-chunk
digit limbs only, external-slices CCSD solve, f32 v_vvvv reconstruction
feeding the CR-CC triples.  Oracle: the dense hybrid pipeline on the same
fixture (itself golden-tested against els.out).
"""

import io

import pytest

from afesp_tpu.config import read_els_in
from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
from afesp_tpu.methods.hf import do_rhf
from afesp_tpu.methods.mp2 import do_mp2_spatial
from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial


def _run(sample_data, tmp_path, stream: bool, monkeypatch):
    import shutil

    d = sample_data / "n2-cc-pvdz/2.00_0.00"
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    # stage the SCF guess the reference run used (the stretched-N2 core
    # guess converges to a different SCF solution)
    shutil.copy(d / "guess_in.dat", tmp_path / "guess_in.dat")
    cfg.ccsd_precision = "hybrid"
    if stream:
        monkeypatch.setenv("AFESP_FORCE_STREAM", "1")
    else:
        monkeypatch.delenv("AFESP_FORCE_STREAM", raising=False)
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc = do_ccsd_spatial(
        sys_, mp2.eri_mo, cfg, hf, rep,
        slices=mp2.slices, vvvv_B=mp2.vvvv_B,
    )
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    return hf, mp2, cc, tr


def test_stream_tier_matches_dense_n2(sample_data, tmp_path, monkeypatch):
    hf_d, mp2_d, cc_d, tr_d = _run(sample_data, tmp_path, False, monkeypatch)
    hf_s, mp2_s, cc_s, tr_s = _run(sample_data, tmp_path, True, monkeypatch)

    # the stream MP2 path must route through slices (no dense MO tensor)
    assert mp2_s.eri_mo is None and mp2_s.slices is not None
    assert mp2_s.slices.v_vvvv is None and mp2_s.vvvv_B is not None

    # digit-GEMM transform is f64-grade: MP2 energies agree to ~1e-11
    assert abs(mp2_s.e_mp2 - mp2_d.e_mp2) < 1e-10

    # external-slices solve: same fixed point as the dense hybrid solve
    assert cc_s.converged
    assert abs(cc_s.e_ccsd - cc_d.e_ccsd) < 1e-8, (cc_s.e_ccsd, cc_d.e_ccsd)

    # CR triples family from the reconstructed-f32 v_vvvv: all six
    # variant energies match the dense hybrid run; the denominators are
    # f32-path quantities (reconstruct-vs-cast differ by ~2^-23 relative)
    for f in ("e_ccsd_t", "e_ccsd_tt", "e_rccsd_t", "e_rccsd_tt",
              "e_crccsd_t", "e_crccsd_tt"):
        a, b = getattr(tr_s, f), getattr(tr_d, f)
        assert abs(a - b) < 5e-8, (f, a, b)
    for f in ("D_T", "D_TT"):
        a, b = getattr(tr_s, f), getattr(tr_d, f)
        assert abs(a - b) < 1e-6, (f, a, b)

    # and the committed golden (els_energy.dat): CR-CCSD(T) total
    total_cr = tr_s.e_crccsd_tt + hf_s.e_hf + 12.96484166135794
    assert abs(total_cr - -108.9543970939) < 1e-7
