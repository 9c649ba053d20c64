"""Compile-cache fingerprinting.

The repo ships `.jax_cache/` (the serialized XLA executables for the
production programs) so a fresh checkout pays seconds of deserialisation
instead of minutes of local compilation (PERF.md "Cold start, killed").
XLA's cache keys include the backend/compiler state, so a jaxlib or
topology mismatch does not break anything — it silently recompiles,
which turns the README's "seconds" promise into minutes with no
explanation.  This module records the environments the committed entries
were built for (`.jax_cache/FINGERPRINT.json`) and warns loudly when the
running environment is not among them (round-3 verdict, weak #7).

Writer CLI (run after refreshing the cache on a new environment):
    python -m afesp_tpu.cachemeta [cache_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

FINGERPRINT_NAME = "FINGERPRINT.json"


def current_env() -> dict:
    """The cache-relevant identity of the running environment.  Initialises
    the JAX backend (callers invoke this at pipeline start, where the
    backend is about to be initialised anyway)."""
    import jax
    import jaxlib

    dev = jax.devices()[0]
    return {
        "jax": jax.__version__,
        "jaxlib": getattr(jaxlib, "__version__", "?"),
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", "?"),
        "n_devices": jax.device_count(),
        "x64": bool(jax.config.jax_enable_x64),
    }


def read_fingerprint(cache_dir: str | Path) -> list[dict]:
    path = Path(cache_dir) / FINGERPRINT_NAME
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return []
    envs = data.get("environments", [])
    return envs if isinstance(envs, list) else []


def record(cache_dir: str | Path) -> dict:
    """Append the current environment to the cache fingerprint (idempotent)."""
    path = Path(cache_dir) / FINGERPRINT_NAME
    envs = read_fingerprint(cache_dir)
    env = current_env()
    if env not in envs:
        envs.append(env)
        path.write_text(json.dumps({"environments": envs}, indent=1) + "\n")
    return env


def check(cache_dir: str | Path, stream=None) -> bool:
    """True when the current environment matches a recorded one (or no
    fingerprint exists — nothing to promise against).  On mismatch print
    a one-line warning naming both sides: the run still works, it just
    pays full XLA compiles the shipped cache was supposed to cover."""
    envs = read_fingerprint(cache_dir)
    if not envs:
        return True
    env = current_env()
    if env in envs:
        return True
    stream = stream if stream is not None else sys.stderr
    rec = envs[0]
    diff = ", ".join(
        f"{k}: {rec.get(k)!r} -> {env.get(k)!r}"
        for k in env
        if env.get(k) != rec.get(k)
    )
    print(
        f" WARNING: compile cache {cache_dir} was built for a different "
        f"environment ({diff}); expect full XLA compiles instead of "
        f"cached deserialisation on first use.",
        file=stream,
    )
    return False


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    cache = argv[0] if argv else str(
        Path(__file__).resolve().parent.parent / ".jax_cache"
    )
    env = record(cache)
    print(json.dumps({"recorded": env, "cache": cache}))


if __name__ == "__main__":
    main()
