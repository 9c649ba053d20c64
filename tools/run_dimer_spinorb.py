"""Run the 116-bf water dimer's SPIN-ORBITAL (T) stage on real hardware
at nvirt = 212 — the round-4 directive-#7 artifact: a real molecule
through the spin-orbital machinery above the 128-lane panel, where only
synthetic random tensors had ever run (SPINORB_FALLBACK_r04).

Scope (and why): the full spin-orbital CCSD SOLVE at (o=20, v=212) does
NOT fit one 16 GB chip — measured twice, OOM reports committed below:
21.73 GB reserved with the ovvv-family digit prechunks resident, and
25.36 GB with them digitized in-loop (the X64-split copies of the f64
o*v^3 operands cost more than the limbs they replaced).  The identified
fix — spin-block-compressing ovvv/vovv the way r5 compressed vvvv
(SpinSlices.vvvv_blocks) — is a cross-cutting redesign left for the
next round; PERF.md records the budget arithmetic.  (The reference has
no analogue either: its packed store caps near 99 bf.)

What DOES run at production scale, on hardware, end to end:
  * spatial RHF -> MP2 -> CCSD (the validated dimer pipeline),
  * spin expansion of the converged amplitudes (block spin order),
  * the blockwise permutational self-check on the spin slices,
  * do_ccsd_t_spinorb at nvirt=212: the chunked-hybrid tier with
    _pick_clen/_pick_jlen at the sizes the r4 validator only saw
    synthetically.
Physics gate: the spin-orbital E(T) on spin-expanded spatial amplitudes
equals the spatial (T) correction EXACTLY (same theory, two
formulations; tests/test_ccsd_spinorb.py proves the identity at 1e-9 on
the 58-bf fixture) — so this run carries a real pass/fail energy check,
not just walls.

Writes SPINORB_DIMER_r05.json at the repo root.
"""

import io
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
FIXTURE = REPO / "data" / "h2o-dimer-cc-pvtz"


def main():
    import jax

    cache_dir = REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.io.report import Reporter
    from afesp_tpu.methods.ccsd_spatial import do_ccsd_spatial
    from afesp_tpu.methods.ccsd_spinorb import (
        CCSDSpinorbResult,
        make_spin_slices,
    )
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.triples_spatial import do_ccsd_t_spatial
    from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb
    from afesp_tpu.ops.spin import (
        spin_expand_t1,
        spin_expand_t2,
        spin_slices_symmetry_error,
    )

    float(np.asarray(jnp.zeros(8)[0]))  # tunnel handshake off the clock

    cfg = read_els_in(FIXTURE)
    sys_, ints = dat.read_integrals(FIXTURE, cfg.restricted)
    rep = Reporter(stream=io.StringIO())

    t_all = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, FIXTURE)
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, FIXTURE)
    cc = do_ccsd_spatial(sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE)
    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep)
    e_tt_spatial = tr.e_ccsd_tt - cc.e_ccsd  # the (T) correction

    # spin-orbital bookkeeping at (o=20, v=212)
    no_sp = sys_.nel // 2
    so_sys = dat.System(
        natoms=sys_.natoms, nel=sys_.nel, nbasis=sys_.nbasis,
        nocc=sys_.nel, nvirt=(sys_.nbasis - no_sp) * 2,
    )
    # Pull the small spatial amplitudes to host, then FREE everything
    # the (T) stage does not consume: the spatial slices (incl. the
    # 1.0 GB v_vvvv), the dense MO tensor and the cached device ERI —
    # together ~5 GB of dead weight that OOM'd the first attempt at
    # this scope alongside the full spin-slice set.
    t1_sp = np.asarray(cc.t1)
    t2_sp = np.asarray(cc.t2)
    eri_mo = mp2.eri_mo
    cc.slices = None
    cc.t1 = cc.t2 = cc.t1_prev = cc.t2_prev = None
    mp2.eri_mo = None
    ints.free_device_eri()

    t0 = time.perf_counter()
    slices = make_spin_slices(
        eri_mo, nocc_spatial=no_sp, block_vvvv=True
    )
    # blockwise permutational self-check (ccsd.f90:150-173 analogue) at
    # production scale
    from afesp_tpu.ops.spin import spin_symmetry_error_blocks

    sym_err = float(
        jax.jit(spin_symmetry_error_blocks)(
            slices.oooo, slices.oovv,
            slices.vvvv_blocks[0], slices.vvvv_blocks[1],
        )
    )
    slices_wall = time.perf_counter() - t0
    # keep only what the triples stage reads (vovv, ovoo, oovv):
    # the ovvv slice (1.45 GB) and the vvvv blocks (2.0 GB) are
    # CC-solve operands, not (T) operands
    del eri_mo
    slices = slices._replace(
        ovvv=None, vvvv=None, vvvv_blocks=None, ooov=None,
        oooo=None, oovo=None, ovvo=None,
    )
    so_cc = CCSDSpinorbResult(
        e_ccsd=0.0,
        t1=jnp.asarray(spin_expand_t1(t1_sp)),
        t2=jnp.asarray(spin_expand_t2(t2_sp)),
        converged=True, iterations=0, slices=slices,
    )
    t0 = time.perf_counter()
    e_t_so = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep)
    t_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    e_t_so = do_ccsd_t_spinorb(so_sys, so_cc, cfg, hf.levels, rep)
    t_wall_warm = time.perf_counter() - t0

    res = {
        "metric": "h2o_dimer_ccpvtz_spinorb_triples",
        "unit": "s",
        "nbasis": sys_.nbasis,
        "n_spinorb_occ": so_sys.nocc,
        "n_spinorb_virt": so_sys.nvirt,
        "block_vvvv": bool(slices.vvvv is None),
        "spin_symmetry_err": sym_err,
        "slices_wall": round(slices_wall, 3),
        "t_wall": round(t_wall, 3),
        "t_wall_warm": round(t_wall_warm, 3),
        "total_wall": round(time.perf_counter() - t_all, 3),
        "e_ccsd_corr_spatial": round(cc.e_ccsd, 10),
        "e_t_spinorb": round(float(e_t_so), 10),
        "e_tt_spatial": round(e_tt_spatial, 10),
        "diff": float(e_t_so) - e_tt_spatial,
        # the identity is exact in theory; hybrid f32 panels at this
        # size carry ~1e-7-scale noise
        "ok_matches_spatial": bool(abs(float(e_t_so) - e_tt_spatial) < 5e-7),
        "ok_selfcheck": bool(sym_err < 1e-4),
        # the spin-orbital SOLVE does not fit this chip (see docstring)
        "solve_oom_prechunked_gb": 21.73,
        "solve_oom_inloop_gb": 25.36,
        "hbm_gb": 15.75,
    }
    (REPO / "SPINORB_DIMER_r05.json").write_text(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
