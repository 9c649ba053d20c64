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


def test_fused_kernel_matches_f64_oracle():
    """The fully-fused triples kernel (GEMMs + finale in VMEM,
    ops/triples_pallas.triples_fused) vs the f64 strict-chunk path on a
    random antisymmetry-respecting problem, interpret mode."""
    import jax.numpy as jnp

    from afesp_tpu.methods import triples_spinorb as T
    from afesp_tpu.ops.triples_pallas import triples_fused

    rng = np.random.default_rng(7)
    o, v = 6, 10
    t1 = jnp.asarray(rng.standard_normal((o, v)) * 0.02)
    t2 = rng.standard_normal((o, o, v, v)) * 0.02
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = jnp.asarray(t2 - t2.transpose(0, 1, 3, 2))
    oovv = rng.standard_normal((o, o, v, v)) * 0.02
    oovv = oovv - oovv.transpose(1, 0, 2, 3)
    oovv = jnp.asarray(oovv - oovv.transpose(0, 1, 3, 2)) / 2
    ovoo = rng.standard_normal((o, v, o, o)) * 0.02
    ovoo = jnp.asarray(ovoo - ovoo.transpose(0, 1, 3, 2))
    vovv = rng.standard_normal((v, o, v, v)) * 0.02
    vovv = jnp.asarray(vovv - vovv.transpose(0, 1, 3, 2))
    e = np.sort(rng.standard_normal(o + v))
    e[o:] += 4.0
    e_o, e_v = jnp.asarray(e[:o]), jnp.asarray(e[o:])
    args = (t1, t2, vovv, ovoo, oovv, e_o, e_v)

    si, sj, sk, clen = T.strict_plan(o, v, "f64")
    idx = tuple(jnp.asarray(x) for x in (si, sj, sk))
    e64 = float(
        T._triples_total_strict(*args, *idx, clen=clen, precision="f64")
    )
    ef = float(triples_fused(*args, *idx)) / 6.0
    assert abs(ef - e64) < 5e-8 * max(1.0, abs(e64)), (e64, ef)
