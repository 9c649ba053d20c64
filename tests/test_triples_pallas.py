"""Pallas triples-finale kernel: interpret-mode correctness vs both the
hybrid XLA path and full f64 on a real fixture."""

import io

import numpy as np

from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spinorb import CCSDSpinorbResult, make_spin_slices
from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb
from afesp_tpu.ops.spin import spin_expand_t1, spin_expand_t2


def test_pallas_finale_matches(sample_data, tmp_path):
    from test_ccsd_spatial import run_pipeline

    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "f2-cc-pvdz/1.75_0.00"
    )
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
    e64 = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep, precision="f64")
    ep = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep, precision="pallas")
    assert abs(ep - e64) < 5e-9, (e64, ep)
