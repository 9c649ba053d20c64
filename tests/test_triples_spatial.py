"""Triples family golden tests: all 9 energies + D[T]/D(T) vs els_energy.dat."""

import pytest

from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial
from test_ccsd_spatial import run_pipeline

# els_energy.dat values (totals incl. E_nuc)
N2 = dict(
    ccsd_t=-109.0299402389,
    ccsd_tt=-109.0154101572,
    rccsd_t=-108.9735444691,
    rccsd_tt=-108.9658259622,
    crccsd_t=-108.959332822,
    crccsd_tt=-108.9543970939,
    D_T=1.9149923969,
    D_TT=1.9196440233,
)
F2 = dict(
    ccsd_t=-199.0869337653,
    ccsd_tt=-199.0859454726,
    rccsd_t=-199.0834465765,
    rccsd_tt=-199.0826217789,
    crccsd_t=-199.0820229437,
    crccsd_tt=-199.0812536836,
    D_T=1.2033195175,
    D_TT=1.2035769057,
)


@pytest.mark.parametrize(
    "name,ref",
    [("n2-cc-pvdz/2.00_0.00", N2), ("f2-cc-pvdz/1.75_0.00", F2)],
)
def test_triples_all_variants(sample_data, tmp_path, name, ref):
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(sample_data, tmp_path, name)
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    base = hf.e_hf + ints.e_nuc
    tol = 2e-8
    assert abs(tr.e_ccsd_t + base - ref["ccsd_t"]) < tol, "CCSD[T]"
    assert abs(tr.e_ccsd_tt + base - ref["ccsd_tt"]) < tol, "CCSD(T)"
    assert abs(tr.e_rccsd_t + base - ref["rccsd_t"]) < tol, "R-CCSD[T]"
    assert abs(tr.e_rccsd_tt + base - ref["rccsd_tt"]) < tol, "R-CCSD(T)"
    assert abs(tr.e_crccsd_t + base - ref["crccsd_t"]) < tol, "CR-CCSD[T]"
    assert abs(tr.e_crccsd_tt + base - ref["crccsd_tt"]) < tol, "CR-CCSD(T)"
    assert abs(tr.D_T - ref["D_T"]) < 1e-7, "D[T]"
    assert abs(tr.D_TT - ref["D_TT"]) < 1e-7, "D(T)"
    assert tr.calcname == "completely renormalised CCSD(T)"


def test_triples_spatial_hybrid_matches_f64(sample_data, tmp_path):
    """precision='hybrid' (f32 MXU panel GEMMs, f64 denominators and
    reductions) must reproduce the f64 spatial triples within the 1e-8
    contract on every variant — the >=100-bf workloads run hybrid
    because emulated-f64 panel GEMMs are ~50x slower and ~5x the HBM."""
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    tr64 = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    cfg.ccsd_precision = "hybrid"
    trh = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    for k in ("e_ccsd_t", "e_ccsd_tt", "e_rccsd_t", "e_rccsd_tt",
              "e_crccsd_t", "e_crccsd_tt"):
        assert abs(getattr(trh, k) - getattr(tr64, k)) < 1e-8, k
    assert abs(trh.D_T - tr64.D_T) < 1e-6
    assert abs(trh.D_TT - tr64.D_TT) < 1e-6


def test_triples_spatial_pallas_matches_f64(sample_data, tmp_path):
    """precision='pallas' (fused VMEM finale: t3/xbar/z3/y built and
    reduced in-kernel, ops/triples_pallas.triples_finale_spatial) must
    reproduce the f64 spatial triples within the 1e-8 contract on every
    variant.  Off-TPU the kernel runs in interpret mode — same math."""
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    tr64 = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    cfg.ccsd_precision = "pallas"
    trp = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    for k in ("e_ccsd_t", "e_ccsd_tt", "e_rccsd_t", "e_rccsd_tt",
              "e_crccsd_t", "e_crccsd_tt"):
        assert abs(getattr(trp, k) - getattr(tr64, k)) < 1e-8, k
    assert abs(trp.D_T - tr64.D_T) < 1e-6
    assert abs(trp.D_TT - tr64.D_TT) < 1e-6


def test_triples_spatial_fused_matches_f64(sample_data, tmp_path):
    """precision='fused' (sorted-triples M-operator kernel: the 24
    numerator GEMMs AND the finale run VMEM-resident per i<=j<=k triple,
    ops/triples_pallas.triples_fused_spatial) must reproduce the f64
    spatial triples within the 1e-8 contract on every variant."""
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    tr64 = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    trf = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, precision="fused")
    for k in ("e_ccsd_t", "e_ccsd_tt", "e_rccsd_t", "e_rccsd_tt",
              "e_crccsd_t", "e_crccsd_tt"):
        assert abs(getattr(trf, k) - getattr(tr64, k)) < 1e-8, k
    assert abs(trf.D_T - tr64.D_T) < 1e-6
    assert abs(trf.D_TT - tr64.D_TT) < 1e-6


def test_triples_spatial_tiled_matches_f64(sample_data, tmp_path):
    """precision='tiled' (sorted-triple batched GEMM cubes + the
    a-panel-tiled Pallas M-finale, ops/triples_tiled.py — the
    nvirt > 128 tier, exercised here on a real molecule) must reproduce
    the f64 spatial triples within the 1e-8 contract on every
    variant."""
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    tr64 = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    trt = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, precision="tiled")
    assert trt.precision_used == "tiled"
    for k in ("e_ccsd_t", "e_ccsd_tt", "e_rccsd_t", "e_rccsd_tt",
              "e_crccsd_t", "e_crccsd_tt"):
        assert abs(getattr(trt, k) - getattr(tr64, k)) < 1e-8, k
    assert abs(trt.D_T - tr64.D_T) < 1e-6
    assert abs(trt.D_TT - tr64.D_TT) < 1e-6


def test_plain_paren_t_bug_compat_flag(sample_data, tmp_path):
    """Plain CCSD(T)_spatial bit-parity documentation (VERDICT r1 item
    8): the reference only forms z3_bar for renormalised variants
    (ccsd.f90:2211-2215), so ITS plain CCSD(T) output equals CCSD[T].
    Default mode computes the correct Piecuch (T); the bug-compat flag
    reproduces the reference.  Both numbers recorded here on N2."""
    from test_ccsd_spatial import run_pipeline

    from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial

    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    cfg.ccsd_t_paren = True
    cfg.ccsd_t_renorm = False
    cfg.ccsd_t_comp_renorm = False

    cfg.ccsd_t_spatial_bug_compat = False
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    # correct (T): the z3_bar contribution is real (els_energy.dat's CR
    # run shows the same split: [T] -0.6993574848 vs (T) -0.6848274031)
    assert abs(tr.e_ccsd_t - -0.6993574848) < 1e-8
    assert abs(tr.e_ccsd_tt - -0.6848274031) < 1e-8

    cfg.ccsd_t_spatial_bug_compat = True
    tr_bug = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    # reference behaviour: plain (T) silently prints the [T] value
    assert tr_bug.e_ccsd_tt == tr_bug.e_ccsd_t
    assert abs(tr_bug.e_ccsd_t - tr.e_ccsd_t) < 1e-12


def test_triples_spatial_fused_plain_t_matches_f64(sample_data, tmp_path):
    """The has_m=False variant of the fused sorted-triples kernel (plain
    CCSD[T]/(T), no CR moment) against f64 on the N2 fixture."""
    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
    )
    cfg.ccsd_t_renorm = False
    cfg.ccsd_t_comp_renorm = False
    tr64 = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels)
    trf = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, precision="fused")
    for k in ("e_ccsd_t", "e_ccsd_tt"):
        assert abs(getattr(trf, k) - getattr(tr64, k)) < 1e-8, k
