"""Hardware-validate the spin-orbital triples FALLBACK tier (nvirt > 128).

The fused VMEM kernel hard-asserts nvirt <= 128; above that,
do_ccsd_t_spinorb drops to the strict-triangle chunk path
(_triples_total_strict, precision="hybrid" — the Pallas finale's v^3
window pads past 128 lanes above nvirt=128 and blows the VMEM budget,
so the jnp finale is the production tier) whose _pick_clen budget
heuristic had never run on the chip at the sizes it exists for.  This
tool runs that exact path on the TPU at (nocc=4, nvirt=140) — clen lands
at 1, exercising the chunk loop — against an all-f64 CPU oracle of the
same strict-list formula on identical (f32-cast) operands, and records
wall + relative error.

Usage (real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_spinorb_fallback.py
  ... [--size NOxNV]   # default 4x140; e.g. --size 10x192 runs the
                       # production-scale shape (dimer-like spin-orbital
                       # dims: nocc=20 halved for runtime, nvirt=192)
                       # where _pick_clen/_pick_jlen actually budget

Prints one JSON line; rel_err must sit at the f32-GEMM noise floor
(~1e-5 on random data; the production chemistry magnitudes land ~1e-9
absolute, cf. tests/test_triples_precision.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _size_arg() -> tuple[int, int]:
    if "--size" in sys.argv:
        no, nv = sys.argv[sys.argv.index("--size") + 1].split("x")
        return int(no), int(nv)
    return 4, 140


def _make_problem(no: int, nv: int):
    """Deterministic f32-representable operands shared by the TPU run and
    the f64 oracle subprocess (same seed, same construction)."""
    rng = np.random.default_rng(42)

    def asym4(x):
        x = x - x.transpose(1, 0, 2, 3)
        return x - x.transpose(0, 1, 3, 2)

    t1 = rng.standard_normal((no, nv)).astype(np.float32).astype(np.float64) * 0.01
    t2 = asym4(rng.standard_normal((no, no, nv, nv))) * 0.01
    t2 = t2.astype(np.float32).astype(np.float64)
    vovv = rng.standard_normal((nv, no, nv, nv))
    vovv = (vovv - vovv.transpose(0, 1, 3, 2)).astype(np.float32).astype(np.float64)
    ovoo = rng.standard_normal((no, nv, no, no))
    ovoo = (ovoo - ovoo.transpose(0, 1, 3, 2)).astype(np.float32).astype(np.float64)
    oovv = asym4(rng.standard_normal((no, no, nv, nv)))
    oovv = oovv.astype(np.float32).astype(np.float64)
    e_o = -1.0 - np.arange(no)[::-1] * 0.1
    e_v = 0.5 + np.arange(nv) * 0.02
    return t1, t2, vovv, ovoo, oovv, e_o, e_v


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.methods.triples_spinorb import (
        _pick_clen,
        _triples_total_strict,
        strict_plan,
    )

    no, nv = _size_arg()  # nv > 128: the fused kernel refuses, fallback runs
    # f32-cast operands so TPU (f32 GEMMs) and the f64 oracle see
    # identical inputs; antisymmetrise t2/oovv in (a,b) and (i,j) like
    # the real amplitudes so magnitudes behave
    args_np = _make_problem(no, nv)
    t1, t2, vovv, ovoo, oovv, e_o, e_v = args_np

    ii, jj, kk, clen = strict_plan(no, nv, "hybrid")

    # TPU fallback path (the production dispatch for nvirt > 128)
    args = tuple(jnp.asarray(x) for x in args_np)
    iii, jjj, kkk = (jnp.asarray(x) for x in (ii, jj, kk))
    run = lambda: float(
        _triples_total_strict(
            *args, iii, jjj, kkk, clen=clen, precision="hybrid"
        )
    )
    e_tpu = run()  # compile + first-exec
    t0 = time.perf_counter()
    e_tpu = run()
    wall = time.perf_counter() - t0

    # all-f64 oracle of the same strict-list formula (host CPU)
    import subprocess

    oracle = subprocess.run(
        [sys.executable, __file__, "--oracle", "--size", f"{no}x{nv}"],
        capture_output=True, text=True, env=_cpu_env(),
    )
    e_ref = float(oracle.stdout.strip().splitlines()[-1])

    rel = abs(e_tpu - e_ref) / max(abs(e_ref), 1e-300)
    print(
        json.dumps(
            {
                "metric": "spinorb_fallback_nvgt128",
                "nocc": no,
                "nvirt": nv,
                "clen": clen,
                "pick_clen": _pick_clen(nv, "hybrid", len(ii)),
                "e_tpu": e_tpu,
                "e_f64_oracle": e_ref,
                "rel_err": rel,
                "wall": round(wall, 4),
                "ok": bool(rel < 3e-5),
            }
        )
    )


def _cpu_env():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = str(REPO)
    return env


def _oracle():
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from afesp_tpu.methods.triples_spinorb import (
        _triples_total_strict,
        strict_plan,
    )

    no, nv = _size_arg()
    ii, jj, kk, clen = strict_plan(no, nv, "f64")
    import jax.numpy as jnp

    args = tuple(jnp.asarray(x) for x in _make_problem(no, nv))
    e = float(
        _triples_total_strict(
            *args, jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            clen=clen, precision="f64",
        )
    )
    print(repr(e))


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        _oracle()
    else:
        main()
