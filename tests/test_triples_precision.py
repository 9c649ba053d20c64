"""Hybrid-precision triples: the f32-MXU/f64-elementwise path must agree
with full f64 to well under the 1e-8 Ha contract."""

import io

import jax.numpy as jnp
import numpy as np

from afesp_tpu.io import dat
from afesp_tpu.io.report import Reporter
from afesp_tpu.methods.ccsd_spinorb import CCSDSpinorbResult, make_spin_slices
from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb


def test_hybrid_matches_f64(sample_data, tmp_path):
    from test_ccsd_spatial import run_pipeline
    from afesp_tpu.ops.spin import spin_expand_t1, spin_expand_t2

    sys_, ints, cfg, hf, mp2, cc, _ = run_pipeline(
        sample_data, tmp_path, "n2-cc-pvdz/2.00_0.00"
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
    e32 = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep, precision="hybrid")
    # N2 at stretched geometry has large amplitudes — a worst case for
    # the all-f32 panel path (observed ~2.2e-9; the 1e-8 Ha contract has
    # 4x margin; near-equilibrium systems sit well below 1e-9)
    assert abs(e64 - e32) < 5e-9, (e64, e32, e64 - e32)
