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


# ---------------------------------------------------------------------------
# Independent-algorithm cross-validation (round-2 verdict residue #3):
# the production McMurchie-Davidson engine vs a pure Obara-Saika oracle
# (tests/oracle_integrals.py) that shares none of its integral algebra
# (no Hermite E/R tables, different Boys evaluation).  Covers every
# angular-momentum class through f — including classes no committed
# fixture exercises — on synthetic shells with distinct centers.
# ---------------------------------------------------------------------------

from afesp_tpu.integrals.engine import Shell, _shell_pair_1e, eri_shell_quartet

try:  # repo root on sys.path (python -m pytest)
    from tests import oracle_integrals as oi
except ImportError:  # bare pytest rootdir import modes: tests/ itself is on sys.path
    import oracle_integrals as oi


def _toy_shells():
    mk = lambda l, ctr, e, c: Shell(
        l, np.asarray(ctr, float), np.asarray(e, float), np.asarray(c, float)
    )
    return {
        0: mk(0, (0.0, 0.0, 0.0), [13.0, 2.0, 0.4], [0.3, 0.5, 0.8]),
        1: mk(1, (0.0, 1.4, 1.1), [1.2, 0.35], [0.6, 0.5]),
        2: mk(2, (0.2, -1.4, 1.1), [0.9], [1.0]),
        3: mk(3, (0.5, 0.3, -0.9), [0.6, 1.8], [0.7, 0.3]),
    }


def test_md_vs_os_one_electron():
    sh = _toy_shells()
    # one point charge ON a shell center exercises the small-T Boys branch
    charges = [8.0, 1.2]
    coords = [np.array([0.0, 0.0, 0.0]), np.array([1.9, -0.4, 0.3])]
    for la in range(4):
        for lb in range(4):
            a, b = sh[la], sh[lb]
            for kind, oracle in (
                ("S", oi.os_overlap_block(a, b)),
                ("T", oi.os_kinetic_block(a, b)),
                ("V", oi.os_nuclear_block(a, b, charges, coords)),
            ):
                got = _shell_pair_1e(a, b, charges, coords, kind=kind)
                scale = max(np.abs(oracle).max(), 1e-3)
                assert np.abs(got - oracle).max() < 1e-11 * scale, (kind, la, lb)


def test_md_vs_os_eri():
    sh = _toy_shells()
    quartets = [
        (0, 0, 0, 0),
        (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1),
        (1, 1, 1, 1),
        (2, 1, 0, 0), (0, 0, 2, 1), (1, 2, 0, 1),
        (2, 2, 2, 2),
        (3, 0, 0, 0), (0, 3, 0, 0), (0, 0, 0, 3),
        (3, 1, 2, 0), (2, 0, 3, 1), (1, 3, 1, 0),
        (3, 3, 0, 0), (0, 0, 3, 3), (3, 2, 3, 0), (3, 3, 3, 1),
    ]
    for q in quartets:
        a, b, c, d = (sh[l] for l in q)
        got = eri_shell_quartet(a, b, c, d)
        want = oi.os_eri_shell_quartet(a, b, c, d)
        scale = max(np.abs(want).max(), 1e-3)
        assert np.abs(got - want).max() < 1e-11 * scale, q
