"""The headline H2O/cc-pVTZ spin-orbital CCSD + (T) golden, in-suite
(VERDICT r1 item 7): previously this 1e-8 gate lived only in bench.py,
so a regression was caught only when the TPU bench ran.  Marked slow
(~10-25 min on the 1-core CPU host); run with `pytest -m slow`.

Golden values from the reference's own run,
/root/reference/sample_data/h2o-cc-pvtz/2.00_104.45/els_cpu.out:
CCSD corr -0.399789132814, CCSD(T) corr total -0.434032756.
"""

import io
import shutil
from pathlib import Path

import pytest

REFERENCE_FIXTURE = Path("/root/reference/sample_data/h2o-cc-pvtz/2.00_104.45")
GENERATED_ERI = Path(__file__).resolve().parent.parent / "data" / "h2o-cc-pvtz" / "eri.dat"


@pytest.mark.slow
def test_h2o_ccpvtz_spinorb_ccsd_t_golden(tmp_path):
    if not REFERENCE_FIXTURE.exists():
        pytest.skip("reference fixture unavailable")
    eri = REFERENCE_FIXTURE / "eri.dat"
    if not eri.exists():
        eri = GENERATED_ERI  # the committed eri.dat is a missing large blob
    if not eri.exists():
        pytest.skip("pVTZ ERI not generated (run the native integral engine)")

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb

    for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "els.in"):
        shutil.copy(REFERENCE_FIXTURE / f, tmp_path / f)
    shutil.copy(eri, tmp_path / "eri.dat")

    cfg = read_els_in(tmp_path)
    cfg.scf_read_guess = cfg.scf_write_guess = False
    sys_, ints = dat.read_integrals(tmp_path, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, tmp_path)
    assert abs(hf.e_hf + ints.e_nuc - -75.5955554164) < 1e-8
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, tmp_path)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep)
    assert cc.converged and cc.iterations == 19
    assert abs(cc.e_ccsd - -0.399789132814) < 1e-8
    e_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep)
    assert abs(e_t - -0.434032756) < 1e-8


@pytest.mark.slow
def test_h2o_ccpvtz_spinorb_hybrid_golden(tmp_path):
    """Same golden in the BENCH configuration (ccsd_precision="hybrid",
    the all-digit-GEMM iteration): measured fixed point sits 6.8e-11
    (CCSD) / 4.1e-10 ((T)) from els_cpu.out."""
    if not REFERENCE_FIXTURE.exists():
        pytest.skip("reference fixture unavailable")
    eri = REFERENCE_FIXTURE / "eri.dat"
    if not eri.exists():
        eri = GENERATED_ERI
    if not eri.exists():
        pytest.skip("pVTZ ERI not generated (run the native integral engine)")

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb

    for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "els.in"):
        shutil.copy(REFERENCE_FIXTURE / f, tmp_path / f)
    shutil.copy(eri, tmp_path / "eri.dat")

    cfg = read_els_in(tmp_path)
    cfg.scf_read_guess = cfg.scf_write_guess = False
    cfg.calc_type = "CCSD(T)_spinorb"
    cfg.ccsd_precision = "hybrid"
    sys_, ints = dat.read_integrals(tmp_path, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, tmp_path)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep)
    assert cc.converged
    assert abs(cc.e_ccsd - -0.399789132814) < 1e-8
    e_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep, precision="hybrid")
    assert abs(e_t - -0.434032756) < 1e-8
