"""I/O layer golden tests against the els.out headers in sample_data."""

import numpy as np
import pytest

from afesp_tpu.config import CalcType, parse_els_in, read_els_in
from afesp_tpu.io import dat


def test_parse_els_in_n2(sample_data):
    cfg = read_els_in(sample_data / "n2-cc-pvdz/2.00_0.00")
    assert cfg.calc_type is CalcType.CCSD_T
    assert cfg.restricted
    assert cfg.ccsd_t_paren and cfg.ccsd_t_comp_renorm and not cfg.ccsd_t_renorm
    assert cfg.scf_e_tol == 1e-6
    assert cfg.scf_d_tol == 1e-7
    assert cfg.scf_diis_n_errmat == 6
    assert cfg.ccsd_diis_n_errmat == 8
    assert cfg.scf_maxiter == 150
    assert cfg.ccsd_maxiter == 200
    assert cfg.scf_read_guess and cfg.scf_write_guess and not cfg.write_fcidump


def test_parse_defaults():
    cfg = parse_els_in('&elsinput\ncalc_type="RHF"\n/\n')
    assert cfg.calc_type is CalcType.HARTREE_FOCK
    assert cfg.restricted
    assert cfg.scf_maxiter == 50 and cfg.ccsd_diis_n_errmat == 8


def test_read_integrals_n2(sample_data):
    sys_, ints = dat.read_integrals(sample_data / "n2-cc-pvdz/2.00_0.00", True)
    # Header values from els.out
    assert sys_.nbasis == 28
    assert sys_.nel == 14
    assert sys_.nocc == 7
    assert sys_.nvirt == 21
    assert abs(ints.e_nuc - 1.29648417e01) < 5e-7  # E_nuc: 1.29648417E+01
    assert abs(ints.e_nuc - 12.9648416614) < 1e-9  # breakdown line
    # Symmetries of the dense ERI
    eri = ints.eri
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3))
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1))
    assert np.allclose(eri, eri.transpose(0, 1, 3, 2))
    # Overlap diagonal is 1
    assert np.allclose(np.diag(ints.ovlp), 1.0)


def test_read_integrals_spinorb_bookkeeping(sample_data):
    sys_, _ = dat.read_integrals(
        sample_data / "h2o-cc-pvtz/2.00_104.45", False, require_eri=False
    )
    # els_cpu.out header: 58 bf, 10 el, nocc=10, nvirt=106 (spin-orbital)
    assert sys_.nbasis == 58
    assert sys_.nocc == 10
    assert sys_.nvirt == 106


def test_guess_roundtrip(tmp_path, sample_data):
    src = sample_data / "n2-cc-pvdz/2.00_0.00/guess_in.dat"
    mat = dat.read_scf_guess(src, 28)
    out = tmp_path / "guess_out.dat"
    dat.write_scf_guess(out, mat)
    # Byte-compatible round trip (format ES16.9, hf.f90:185)
    mat2 = dat.read_scf_guess(out, 28)
    assert np.array_equal(mat, mat2)
    # Spot-check first line formatting parity with the reference file
    ref_first = src.read_text().split("\n")[0]
    new_first = out.read_text().split("\n")[0]
    assert ref_first == new_first


def test_fastparse_matches_numpy_on_fixture(sample_data):
    """The native C table scanner is bit-identical to the NumPy splitter
    on a real fixture (every value round-trips the Clinger fast path)."""
    from afesp_tpu.io import fastparse

    if not fastparse.available():
        import pytest

        pytest.skip("no C compiler in this environment")
    path = sample_data / "n2-cc-pvdz/2.00_0.00/eri.dat"
    native = fastparse.parse_doubles_file(path, 5)
    ref = np.array(path.read_text().split(), dtype=np.float64).reshape(-1, 5)
    assert native.shape == ref.shape
    assert np.array_equal(native, ref)


def test_fastparse_grammar_corners(tmp_path):
    """Exponent forms (e/E/d/D), signs, >16-digit mantissas (strtod slow
    path), CRLF and mixed whitespace — all bit-identical to float()."""
    from afesp_tpu.io import fastparse

    if not fastparse.available():
        import pytest

        pytest.skip("no C compiler in this environment")
    tokens = [
        "1", "-1", "+3.5", "0.000124", "-4.122252734918149",
        "1.0e3", "2.5E-7", "3.25d2", "-7.5D-3", "123456789012345678901.5",
        "-0.12345678901234567890", "9e300", "1e-300", "42.", ".5", "-.25",
    ]
    text = "\t".join(tokens[:4]) + "\r\n" + "  ".join(tokens[4:8]) + "\n" \
        + " ".join(tokens[8:12]) + "\n" + " ".join(tokens[12:]) + "\n"
    p = tmp_path / "corner.dat"
    p.write_text(text)
    native = fastparse.parse_doubles_file(p, 4).ravel()
    expect = np.array(
        [float(t.replace("d", "e").replace("D", "e")) for t in tokens]
    )
    assert np.array_equal(native, expect)


def test_fastparse_rejects_garbage(tmp_path):
    from afesp_tpu.io import fastparse

    if not fastparse.available():
        import pytest

        pytest.skip("no C compiler in this environment")
    p = tmp_path / "bad.dat"
    p.write_text("1 2 three 4\n")
    import pytest

    with pytest.raises(ValueError, match="malformed"):
        fastparse.parse_doubles_file(p, 4)


def test_pack_chunked_equals_reference_pack(sample_data):
    """pack_from_quadruple_table (chunked, memmap-friendly) is bit-equal
    to the plain pack_from_table over a real fixture table."""
    from afesp_tpu.io.dat import (
        pack_from_quadruple_table,
        pack_from_table,
        read_eri_table,
    )

    tab = read_eri_table(sample_data / "n2-cc-pvdz" / "2.00_0.00" / "eri.dat")
    n = 28
    i, j, k, l = (tab[:, c].astype(np.int64) - 1 for c in range(4))
    ref = pack_from_table(i, j, k, l, tab[:, 4], n)
    chk = pack_from_quadruple_table(tab, n)
    assert np.array_equal(ref, chk)


def test_packed_sidecar_cache_roundtrip(tmp_path, sample_data):
    """The packed sidecar cache must round-trip bit-exactly and reject a
    modified source file via the content fingerprint."""
    import shutil

    from afesp_tpu.io.dat import (
        load_packed_cache,
        pack_from_quadruple_table,
        read_eri_table,
        save_packed_cache,
    )

    src = tmp_path / "eri.dat"
    shutil.copyfile(
        sample_data / "n2-cc-pvdz" / "2.00_0.00" / "eri.dat", src
    )
    n = 28
    packed = pack_from_quadruple_table(read_eri_table(src), n)
    save_packed_cache(src, n, packed)
    back = load_packed_cache(src, n)
    assert back is not None and np.array_equal(back, packed)
    assert load_packed_cache(src, n + 1) is None  # wrong nbasis
    # mtime-preserving content change must invalidate (fingerprint, not
    # mtime): flip one digit in the head
    data = src.read_bytes()
    st = src.stat()
    src.write_bytes(b"9" + data[1:])
    import os

    os.utime(src, (st.st_atime, st.st_mtime))
    assert load_packed_cache(src, n) is None


def test_binary_eri_fixture_roundtrip(tmp_path, sample_data):
    """eri.npy binary-native fixtures (the >99-bf path written by
    tools/make_trimer.py) must read identically to the text eri.dat
    fixture, on both the packed store and the host dense tensor."""
    import shutil

    from afesp_tpu.io.dat import pack_from_quadruple_table, read_eri_table
    from afesp_tpu.ops.packed_eri import pack_eri

    src = sample_data / "n2-cc-pvdz/2.00_0.00"
    for f in ("s.dat", "t.dat", "v.dat", "geom.dat"):
        shutil.copy(src / f, tmp_path / f)
    n = 28
    packed = pack_from_quadruple_table(read_eri_table(src / "eri.dat"), n)
    np.save(tmp_path / "eri.npy", packed)

    sys_b, ints_b = dat.read_integrals(tmp_path, True)
    sys_t, ints_t = dat.read_integrals(src, True)
    assert np.array_equal(ints_b.eri_packed, ints_t.eri_packed)
    assert np.array_equal(ints_b.eri, ints_t.eri)

    # pack_eri (the writer make_trimer uses) and unpack_eri_host (the
    # reader) must be exact inverses through the eri_ind order
    assert np.array_equal(pack_eri(ints_t.eri), packed)
    assert np.array_equal(dat.unpack_eri_host(packed, n), ints_t.eri)

    # a size-inconsistent eri.npy must hard-error, never truncate
    np.save(tmp_path / "eri.npy", packed[:-1])
    with pytest.raises(ValueError, match="eri.npy"):
        dat.read_integrals(tmp_path, True)
