"""Per-op profile of the hybrid CCSD iteration on the TPU.

Runs the production jitted iteration (the same executable the fused
while_loop solver dispatches) a few times under jax.profiler.trace and
aggregates the device-side op durations from the perfetto trace, so the
per-iteration wall decomposes into named XLA ops instead of guesses.

Usage:
  PYTHONPATH=/root/repo python tools/profile_ccsd.py            # spinorb pVTZ
  PYTHONPATH=/root/repo python tools/profile_ccsd.py spatial    # spatial dimer
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import tempfile
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def main():
    import sys as _sys

    import jax
    import jax.numpy as jnp

    spatial = len(_sys.argv) > 1 and _sys.argv[1] == "spatial"

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.methods import hf as hf_mod
    from afesp_tpu.methods import mp2 as mp2_mod

    rng = np.random.default_rng(0)
    if spatial:
        from afesp_tpu.methods.ccsd_spatial import (
            ccsd_iteration_hybrid,
            denominators,
            make_slices,
            spatial_presplit,
        )

        workdir = REPO / "data" / "h2o-dimer-cc-pvtz"
        cfg = read_els_in(workdir)
        sys_, ints = dat.read_integrals(workdir, cfg.restricted)
        hf = hf_mod.do_rhf(sys_, ints, cfg, workdir=workdir)
        mp2 = mp2_mod.do_mp2_spatial(sys_, ints, cfg, hf, workdir=workdir)
        nocc = sys_.nel // 2
        slices = make_slices(jnp.asarray(mp2.eri_mo), nocc)
        D_ia, D_ijab = denominators(jnp.asarray(hf.levels), nocc)
        t1 = jnp.asarray(rng.standard_normal(D_ia.shape) * 0.01)
        t2 = jnp.asarray(slices.v_oovv / D_ijab)
        consts = spatial_presplit(slices)
        jax.block_until_ready(consts)

        def step(t1, t2):
            return ccsd_iteration_hybrid(t1, t2, slices, D_ia, D_ijab, consts)
    else:
        from afesp_tpu.methods.ccsd_spinorb import (
            get_spinorb_iteration,
            make_spin_slices,
            presplit_consts,
            spinorb_denominators,
        )
        from afesp_tpu.ops.spin import spinorb_levels

        fixture = Path("/root/reference/sample_data/h2o-cc-pvtz/2.00_104.45")
        eri = REPO / "data" / "h2o-cc-pvtz" / "eri.dat"
        workdir = Path(tempfile.mkdtemp())
        for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "els.in"):
            shutil.copy(fixture / f, workdir / f)
        shutil.copy(eri, workdir / "eri.dat")
        cfg = read_els_in(workdir)
        cfg.calc_type = "CCSD_spinorb"
        sys_, ints = dat.read_integrals(workdir, cfg.restricted)
        hf = hf_mod.do_rhf(sys_, ints, cfg, workdir=workdir)
        mp2 = mp2_mod.do_mp2_spatial(sys_, ints, cfg, hf, workdir=workdir)

        no_sp = sys_.nel // 2
        slices = make_spin_slices(mp2.eri_mo, nocc_spatial=no_sp)
        nocc = sys_.nel
        lv = spinorb_levels(jnp.asarray(hf.levels), no_sp)
        D_ia, D_ijab = spinorb_denominators(lv, nocc)
        t1 = jnp.asarray(rng.standard_normal(D_ia.shape) * 0.01)
        t2 = jnp.asarray(slices.oovv / D_ijab)

        it_hybrid = get_spinorb_iteration(vvvv_split=True)
        consts = presplit_consts(slices)
        jax.block_until_ready(consts)

        def step(t1, t2):
            return it_hybrid(t1, t2, slices, D_ia, D_ijab, consts)

    t1n, t2n = step(t1, t2)
    jax.block_until_ready(t2n)
    t0 = time.perf_counter()
    for _ in range(10):
        t1n, t2n = step(t1n, t2n)
    jax.block_until_ready(t2n)
    wall = (time.perf_counter() - t0) / 10
    print(f"hybrid iteration steady wall: {wall*1e3:.1f} ms")

    tdir = tempfile.mkdtemp()
    with jax.profiler.trace(tdir):
        for _ in range(4):
            t1n, t2n = step(t1n, t2n)
        jax.block_until_ready(t2n)

    # aggregate device-lane op durations from the perfetto trace
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace found under {tdir}"
    with gzip.open(paths[0], "rt") as fh:
        tr = json.load(fh)
    events = tr["traceEvents"]
    # find device lanes (pid names containing TPU/device)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = {
        p for p, n in pid_name.items()
        if "TPU" in n or "tpu" in n or "Device" in n or "axon" in n.lower()
    }
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tname = tid_name.get((e["pid"], e["tid"]), "")
            if "step" in tname.lower():
                continue
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # -> ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
    print(f"\ndevice op time total {total:.1f} ms over 4 iterations; top 25:")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms/4:8.3f} ms/it x{cnt[name]//4:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
