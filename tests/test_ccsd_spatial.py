"""Spin-free CCSD golden tests vs els.out trajectories and final energies."""

import io

import numpy as np
import pytest

from afesp_tpu.config import read_els_in
from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
from afesp_tpu.methods.hf import do_rhf
from afesp_tpu.methods.mp2 import do_mp2_spatial


def run_pipeline(sample_data, tmp_path, name):
    import shutil

    d = sample_data / name
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    if cfg.scf_read_guess:
        shutil.copy(d / "guess_in.dat", tmp_path / "guess_in.dat")
    buf = io.StringIO()
    rep = Reporter(stream=buf)
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep)
    return sys_, ints, cfg, hf, mp2, cc, buf


def test_ccsd_n2(sample_data, tmp_path):
    sys_, ints, cfg, hf, mp2, cc, buf = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    assert cc.converged
    # els.out: 22 iterations, corr -0.581326481865, total -108.9119092359
    assert cc.iterations == 22
    assert abs(cc.e_ccsd - -0.581326481865) < 1e-8
    assert abs(cc.e_ccsd + hf.e_hf + ints.e_nuc - -108.9119092359) < 1e-8
    assert abs(cc.t1_diagnostic - 0.032353402) < 1e-7
    # trajectory spot checks (els.out CC iterations 1, 2, 8, 15)
    rows = {}
    for line in buf.getvalue().split("\n"):
        parts = line.split()
        if len(parts) == 5 and parts[0].isdigit() and "." in parts[1]:
            rows[int(parts[0])] = float(parts[1])
    traj = {
        1: -0.059028077267,
        2: -1.178991111609,
        8: -0.576228702861,
        15: -0.581326745583,
    }
    for it, e_ref in traj.items():
        if it in rows and abs(rows[it]) < 2:  # CC rows only (HF rows are ~-121)
            assert abs(rows[it] - e_ref) < 1e-9, (it, rows[it], e_ref)


def test_ccsd_f2(sample_data, tmp_path):
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "f2-cc-pvdz/1.75_0.00"
    )
    assert cc.converged
    # els_energy.dat: CCSD total -199.0662953019, T1 diag 0.0137594955
    assert abs(cc.e_ccsd + hf.e_hf + ints.e_nuc - -199.0662953019) < 1e-8
    assert abs(cc.t1_diagnostic - 0.0137594955) < 1e-7


def test_ccsd_h2o_pvdz_vs_ref_out_and_psi4(sample_data, tmp_path):
    """The committed ref_out for this fixture is from the reference's
    2022-02 revision, which ran the *spin-orbital* CCSD (its timing line
    says "unrestricted CCSD" despite the CRCCSD(T)_spatial input) with
    the literature F_mi (Stanton Eq. 5).  The current reference binary
    transposed that contraction (ccsd.f90:792-795) — a bug that shifts
    every converged CCSD energy by 1e-6..1e-5 Ha away from Psi4.  Run
    the faithful configuration (spin-orbital path, paper equations):
    it must land on BOTH the old-revision ref_out and Psi4 to 1e-8."""
    import io

    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb

    d = sample_data / "h2o-cc-pvdz/1.80_104.45"
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.restricted = False
    cfg.ccsd_spinorb_equations = "paper"
    cfg.ccsd_e_tol = 1e-9
    cfg.ccsd_t_tol = 1e-8
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, tmp_path)
    assert cc.converged
    total = cc.e_ccsd + hf.e_hf + ints.e_nuc
    assert abs(total - -75.8879259297) < 1e-8  # ref_out:124
    assert abs(total - -75.88792592638362) < 1e-8  # reference.dat (Psi4)


def test_ccsd_paper_equations_match_psi4_f2(sample_data, tmp_path):
    """Same check on a second fixture: paper-form spin-orbital CCSD must
    agree with Psi4's independent CCSD (reference.dat) to 1e-8 — the
    'code' form lands ~9e-6 away (the reproduced reference bug)."""
    import io

    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb

    d = sample_data / "f2-cc-pvdz/1.75_0.00"
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.scf_read_guess = False
    cfg.restricted = False
    cfg.ccsd_spinorb_equations = "paper"
    cfg.ccsd_e_tol = 1e-9
    cfg.ccsd_t_tol = 1e-8
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, tmp_path)
    assert cc.converged
    total = cc.e_ccsd + hf.e_hf + ints.e_nuc
    assert abs(total - -199.06630847929324) < 1e-8  # reference.dat (Psi4)


def test_spatial_hybrid_solve_matches_f64(sample_data, tmp_path):
    """ccsd_precision='hybrid' now routes the heavyweight intermediates
    through pre-digitized bf16 digit GEMMs (~2^-35-of-scale) on top of
    the split-f32 vvvv — the converged CCSD energy must stay within the
    1e-8 contract of the all-f64 solve."""
    sys_, ints, cfg, hf, mp2, cc64, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    cfg.ccsd_precision = "hybrid"
    rep = Reporter(stream=io.StringIO())
    cch = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep)
    assert cch.converged
    assert abs(cch.e_ccsd - cc64.e_ccsd) < 1e-8, (cch.e_ccsd, cc64.e_ccsd)
