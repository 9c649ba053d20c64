"""Spin-orbital path tests.

There is no committed current-code spin-orbital fixture with integrals
(h2o-cc-pvtz/eri.dat is a missing blob), so validation is by internal
consistency:

  1. the antisymmetrised slices satisfy the reference's permutational
     self-check (ccsd.f90:150-167);
  2. E(T)_spinorb evaluated on spin-expanded *spatial* CCSD amplitudes
     equals the spatial CCSD(T) correction e_TT - e_ccsd (same theory,
     two formulations);
  3. regression lock on the N2 spin-orbital CCSD energy (the spin-orbital
     fixed point deliberately reproduces the reference's F_oo tau~
     transposition, ccsd.f90:792-795, so it differs from the spatial one
     by ~5e-5 on stretched N2).
"""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from afesp_tpu.config import read_els_in
from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spinorb import (
    CCSDSpinorbResult,
    do_ccsd_spinorb,
    make_spin_slices,
)
from afesp_tpu.methods.hf import do_rhf
from afesp_tpu.methods.mp2 import do_mp2_spatial
from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb
from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial
from afesp_tpu.ops.spin import permutational_symmetry_error, spinorb_slice


from afesp_tpu.ops.spin import spin_expand_t1, spin_expand_t2  # block-spin order


def test_permutational_self_check(sample_data, tmp_path):
    """Mirror of the reference's runtime assertion on a small slice."""
    from test_ccsd_spatial import run_pipeline

    *_, mp2, cc, _ = run_pipeline(sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45")
    # build the tiny full spinorb tensor over occupied space only
    oooo = spinorb_slice(mp2.eri_mo, "oooo", 5)
    err = permutational_symmetry_error(np.asarray(oooo))
    assert err < 1e-10


def test_spinorb_triples_equals_spatial_tt(sample_data, tmp_path):
    """E(T) from the spin-orbital kernel on spin-expanded spatial
    amplitudes == spatial CCSD(T) correction (e_TT)."""
    from test_ccsd_spatial import run_pipeline

    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "f2-cc-pvdz/1.75_0.00"
    )
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    e_tt_corr = tr.e_ccsd_tt - cc.e_ccsd  # spatial (T) correction

    # spin-orbital bookkeeping
    so_sys = dat.System(
        natoms=sys_.natoms,
        nel=sys_.nel,
        nbasis=sys_.nbasis,
        nocc=sys_.nel,
        nvirt=(sys_.nbasis - sys_.nel // 2) * 2,
    )
    slices = make_spin_slices(mp2.eri_mo, nocc_spatial=sys_.nel // 2)
    so_cc = CCSDSpinorbResult(
        e_ccsd=0.0,
        t1=spin_expand_t1(cc.t1),
        t2=spin_expand_t2(cc.t2),
        converged=True,
        iterations=0,
        slices=slices,
    )
    rep = Reporter(stream=io.StringIO())
    e_t_corr = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep)
    assert abs(e_t_corr - e_tt_corr) < 1e-9


def test_spinorb_ccsd_n2_regression(sample_data, tmp_path):
    import shutil

    d = sample_data / "n2-cc-pvdz/2.00_0.00"
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.restricted = False
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    shutil.copy(d / "guess_in.dat", tmp_path / "guess_in.dat")
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep)
    assert cc.converged
    # regression lock (see module docstring); spatial value: -0.581326481865
    assert abs(cc.e_ccsd - -0.581372126224) < 1e-8
