"""MP2 golden tests: correlation energies vs sample_data breakdowns."""

import io

import numpy as np
import pytest

from afesp_tpu.config import read_els_in
from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.hf import do_rhf
from afesp_tpu.methods.mp2 import do_mp2_spatial

# MP2 correlation energies from els.out / ref_out breakdowns
CASES = [
    ("n2-cc-pvdz/2.00_0.00", -0.8459445164),
    ("f2-cc-pvdz/1.75_0.00", -0.4373493658),  # -199.0533039551 - -198.6159545893
    ("h2o-cc-pvdz/1.80_104.45", -0.2885875159),
]


def _run_hf_mp2(sample_data, tmp_path, name):
    import shutil

    d = sample_data / name
    cfg = read_els_in(d)
    cfg.scf_write_guess = False
    cfg.write_fcidump = False
    sys_, ints = dat.read_integrals(d, cfg.restricted)
    if cfg.scf_read_guess:
        shutil.copy(d / "guess_in.dat", tmp_path / "guess_in.dat")
    rep = Reporter(stream=io.StringIO())
    hf = do_rhf(sys_, ints, cfg, rep, workdir=tmp_path)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir=tmp_path)
    return sys_, ints, cfg, hf, mp2


@pytest.mark.parametrize("name,e_corr", CASES)
def test_mp2_energy(sample_data, tmp_path, name, e_corr):
    *_, mp2 = _run_hf_mp2(sample_data, tmp_path, name)
    assert abs(mp2.e_mp2 - e_corr) < 1e-8


def test_mo_eri_symmetry(sample_data, tmp_path):
    """The MO ERI keeps full 8-fold permutational symmetry (the reference
    relies on this when it repacks, mp2.f90:388-410)."""
    *_, mp2 = _run_hf_mp2(sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45")
    eri = np.asarray(mp2.eri_mo)
    for perm in [(1, 0, 2, 3), (0, 1, 3, 2), (2, 3, 0, 1)]:
        assert np.abs(eri - eri.transpose(perm)).max() < 1e-10


def test_fcidump(sample_data, tmp_path):
    sys_, ints, cfg, hf, mp2 = _run_hf_mp2(
        sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45"
    )
    from afesp_tpu.io.fcidump import write_fcidump

    path = tmp_path / "FCIDUMP"
    write_fcidump(path, np.asarray(mp2.eri_mo))
    lines = path.read_text().strip().split("\n")
    assert len(lines) > 1000
    # canonical ordering and threshold
    p, q, r, s, v = lines[0].split()
    assert (int(p), int(q), int(r), int(s)) == (1, 1, 1, 1)
    assert abs(float(v)) > 1e-7


def test_mp2_spinorb_formulation_equals_spatial(sample_data, tmp_path):
    """do_mp2_spinorb counterpart (mp2.f90:82-259, dead upstream): the
    spin-orbital 1/4 sum |<ij||ab>|^2/D equals the spatial closed-shell
    formulation exactly."""
    import jax.numpy as jnp

    from afesp_tpu.methods.mp2 import mp2_energy_spinorb

    sys_, ints, cfg, hf, mp2 = _run_hf_mp2(
        sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45"
    )
    e_so = float(
        mp2_energy_spinorb(
            mp2.eri_mo, jnp.asarray(hf.levels), nocc_spatial=sys_.nel // 2
        )
    )
    assert abs(e_so - mp2.e_mp2) < 1e-10


def test_mp2_naive_formulation_matches(sample_data, tmp_path):
    """do_mp2_naive counterpart (mp2.f90:9-80, dead upstream): straight
    from the AO integrals, no staged transform in user code."""
    import jax.numpy as jnp

    from afesp_tpu.methods.mp2 import mp2_energy_naive

    sys_, ints, cfg, hf, mp2 = _run_hf_mp2(
        sample_data, tmp_path, "h2o-cc-pvdz/1.80_104.45"
    )
    e_naive = float(
        mp2_energy_naive(
            jnp.asarray(ints.eri),
            jnp.asarray(hf.coeff),
            jnp.asarray(hf.levels),
            nocc=sys_.nel // 2,
        )
    )
    assert abs(e_naive - mp2.e_mp2) < 1e-9
