"""Run the 116-bf water dimer through the SPIN-ORBITAL CCSD(T)
formulation on real hardware — the round-4 directive-#7 artifact.

This is the production pipeline (RHF -> MP2 -> spin-orbital CCSD ->
(T)) at 232 spin orbitals / nvirt = 212: the chunked-hybrid triples
fallback, _pick_clen/_pick_jlen and the (blockwise) spin self-check at
a scale where the dense <ab||cd> slice alone would be 16.2 GB — the
block-compressed vvvv mode is what makes the run possible on one 16 GB
chip.  Physics cross-check: the spin-orbital CCSD correlation energy of
a closed-shell system equals the spatial-path value (same theory, two
formulations; the dimer spatial number is -0.5629046417, BENCH_LARGE).

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
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb
    from afesp_tpu.methods.hf import do_rhf
    from afesp_tpu.methods.mp2 import do_mp2_spatial
    from afesp_tpu.methods.triples_spinorb import do_ccsd_t_spinorb

    float(np.asarray(jnp.zeros(8)[0]))  # tunnel handshake off the clock

    cfg = read_els_in(FIXTURE)
    cfg.restricted = False  # the spin-orbital formulation (CCSD(T)_spinorb)
    sys_, ints = dat.read_integrals(FIXTURE, cfg.restricted)
    rep = Reporter(stream=io.StringIO())

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    hf = do_rhf(sys_, ints, cfg, rep, FIXTURE)
    hf_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp2 = do_mp2_spatial(sys_, ints, cfg, hf, rep, FIXTURE)
    mp2_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE)
    ccsd_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, FIXTURE)
    ccsd_wall_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    e_ccsd_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep)
    t_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    e_ccsd_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep)
    t_wall_warm = time.perf_counter() - t0

    spatial_e_ccsd = -0.5629046417  # BENCH_LARGE dimer, spatial path
    res = {
        "metric": "h2o_dimer_ccpvtz_spinorb_ccsd_t",
        "unit": "s",
        "nbasis": sys_.nbasis,
        "n_spinorb_occ": sys_.nocc,
        "n_spinorb_virt": sys_.nvirt,
        "block_vvvv": bool(cc.slices.vvvv is None),
        "hf_wall": round(hf_wall, 3),
        "mp2_wall": round(mp2_wall, 3),
        "ccsd_wall": round(ccsd_wall, 3),
        "ccsd_wall_warm": round(ccsd_wall_warm, 3),
        "t_wall": round(t_wall, 3),
        "t_wall_warm": round(t_wall_warm, 3),
        "total_wall": round(time.perf_counter() - t_all, 3),
        "ccsd_iters": cc.iterations,
        "e_ccsd_corr": round(cc.e_ccsd, 10),
        "e_ccsd_t": round(e_ccsd_t, 10),
        "ccsd_converged": bool(cc.converged),
        # same physics, two formulations: the spin-orbital fixed point
        # reproduces the reference's F_oo tau~ transposition quirk
        # (ccsd.f90:792-795) so agreement is ~1e-5-level, not 1e-8 —
        # exactly the deviation documented on stretched N2
        "spatial_e_ccsd_corr": spatial_e_ccsd,
        "ccsd_vs_spatial": round(cc.e_ccsd - spatial_e_ccsd, 10),
        "ok_ccsd_vs_spatial": bool(abs(cc.e_ccsd - spatial_e_ccsd) < 5e-4),
    }
    (REPO / "SPINORB_DIMER_r05.json").write_text(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
