"""AOT compile-probe for the spatial triples + CR-intermediates programs
at trimer shapes (see compile_probe_ext.py for the rationale: validate
HBM fit in ~2 min instead of a ~40 min pipeline re-run).

Usage: python tools/compile_probe_triples.py [nbasis [nel [precision]]]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 174
    nel = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    prec = sys.argv[3] if len(sys.argv) > 3 else "hybrid"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.methods.ccsd_spatial import Slices
    from afesp_tpu.methods.triples_spatial import (
        _triples_total_spatial,
        cr_intermediates,
        pick_spatial_jlen,
    )

    nocc = nel // 2
    nv = n - nocc
    f64 = jnp.float64
    sds = lambda *shape: jax.ShapeDtypeStruct(shape, f64)
    v_s = Slices(
        v_oovv=sds(nocc, nocc, nv, nv),
        v_ovov=sds(nocc, nv, nocc, nv),
        v_vvov=sds(nv, nv, nocc, nv),
        v_oovo=sds(nocc, nocc, nv, nocc),
        v_oooo=sds(nocc, nocc, nocc, nocc),
        v_vvvv=None,
    )
    out = {"nbasis": n, "nvirt": nv, "precision": prec}
    try:
        t0 = time.perf_counter()
        cr_intermediates.lower(
            sds(nocc, nv), sds(nocc, nocc, nv, nv),
            sds(nocc, nv), sds(nocc, nocc, nv, nv),
            v_s, nocc=nocc,
            precision="hybrid" if prec != "f64" else "f64",
            vvvv_term=sds(nv, nocc, nv, nv),
        ).compile()
        out["cr_wall"] = round(time.perf_counter() - t0, 1)

        jlen = pick_spatial_jlen(nocc, nv, prec)
        out["jlen"] = jlen
        t0 = time.perf_counter()
        c = _triples_total_spatial.lower(
            sds(nocc, nv), sds(nocc, nocc, nv, nv),
            sds(nv, nv, nocc, nv), sds(nocc, nocc, nv, nocc),
            sds(nocc, nocc, nv, nv),
            sds(nocc), sds(nv),
            sds(nv, nocc, nv, nv), sds(nocc, nocc, nocc, nv),
            nocc=nocc, jlen=jlen,
            doing_T=True, doing_R=True, doing_CR=True, precision=prec,
        ).compile()
        out["t_wall"] = round(time.perf_counter() - t0, 1)
        try:
            ma = c.memory_analysis()
            out["t_temp_gb"] = round(ma.temp_size_in_bytes / 2**30, 2)
            out["t_arg_gb"] = round(ma.argument_size_in_bytes / 2**30, 2)
        except Exception:
            pass
        out["ok"] = True
        print(json.dumps(out))
    except Exception as e:
        msg = str(e)
        print(msg[:2500], file=sys.stderr)
        print("...[elided]...", file=sys.stderr)
        print(msg[-8000:], file=sys.stderr)
        out.update(ok=False, error=msg[:300])
        print(json.dumps(out))


if __name__ == "__main__":
    main()
