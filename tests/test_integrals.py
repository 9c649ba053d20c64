"""Integral engine validation against the committed fixture matrices.

The fixture bases were recovered exactly from s/t/v.dat (see
tools/solve_fixture_basis.py); the ERI comparison below is then a fully
independent test of the two-electron engine (eri.dat was never used in
the fit).
"""

import numpy as np
import pytest

from afesp_tpu.integrals.engine import build_basis, kinetic, nuclear, overlap
from afesp_tpu.io import dat

# n2/f2 ship complete integral files, so no basis recovery is needed for
# them (and their N/F core contractions are rank-deficient against the
# available cross-center data).
CASES = [
    ("h2o-cc-pvdz/1.80_104.45", "fixture-def2-svp", 24),
    ("h2o-cc-pvtz/2.00_104.45", "fixture-cc-pvtz", 58),
]


@pytest.mark.parametrize("name,basis,nbf", CASES)
def test_one_electron_matrices(sample_data, name, basis, nbf):
    d = sample_data / name
    _, charges, coords = dat.read_geometry(d / "geom.dat")
    b = build_basis(charges, coords, basis)
    assert b.nbf == nbf
    S = overlap(b)
    assert np.abs(S - dat.read_dat_matrix(d / "s.dat")).max() < 5e-8
    T = kinetic(b)
    assert np.abs(T - dat.read_dat_matrix(d / "t.dat")).max() < 5e-7
    V = nuclear(b, charges, coords)
    assert np.abs(V - dat.read_dat_matrix(d / "v.dat")).max() < 5e-7


def test_eri_vs_committed_h2o(sample_data):
    """Independent two-electron validation: eri.dat was never used in the
    basis recovery."""
    from afesp_tpu.integrals.engine import eri_tensor

    d = sample_data / "h2o-cc-pvdz/1.80_104.45"
    _, charges, coords = dat.read_geometry(d / "geom.dat")
    b = build_basis(charges, coords, "fixture-def2-svp")
    eri = eri_tensor(b)
    eri_ref = dat.read_eri_dense(d / "eri.dat", 24)
    assert np.abs(eri - eri_ref).max() < 5e-8
