"""Compile-cache GC: prune .jax_cache/ to the entries the CURRENT
production paths actually touch (round-4 verdict, weak #7 / directive
#8: 410 MB across 38 blobs in r4, growing every round, superseded
program shapes never collected — and one 128 MB blob exceeded GitHub's
per-file limit, r4 advisor medium finding).

Mechanism: the persistent-cache key IS the entry filename, and jax logs
every hit ("Persistent compilation cache hit for ... with key ...") and
write ("Writing ... to persistent compilation cache with key ...").
`collect` attaches a logging handler, runs the production workloads
in-process (headline bench, dimer bench, trimer bench — the three tiers
whose programs the driver/CLI share), and records the touched keys to
.jax_cache/KEEP.json.  `prune` deletes every *-cache entry not in the
keep list (FINGERPRINT.json / PALLAS_BROKEN.json / KEEP.json survive).

Usage (on the TPU, with the cache warm so collect costs ~bench walls):
    python tools/cache_gc.py collect bench bench_large bench_xl
    python tools/cache_gc.py prune          # add --dry-run to preview
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
CACHE = REPO / ".jax_cache"
KEEP = CACHE / "KEEP.json"
_SPECIAL = {"FINGERPRINT.json", "PALLAS_BROKEN.json", "KEEP.json"}


class _KeyCollector(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.keys: set[str] = set()

    def emit(self, record):
        msg = record.getMessage()
        for marker in ("with key '", 'with key "'):
            if marker in msg:
                key = msg.split(marker, 1)[1][:-1]
                self.keys.add(key)
                return


def collect(workloads: list[str]) -> None:
    col = _KeyCollector()
    for name in ("jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(col)

    for w in workloads:
        print(f"[cache_gc] running workload: {w}", file=sys.stderr)
        if w == "bench":
            import bench

            bench.main()
        elif w == "bench_large":
            import bench_large

            bench_large.main()
        elif w == "bench_xl":
            import bench_xl

            bench_xl.main()
        elif w == "spinorb_dimer":
            import importlib

            importlib.import_module("tools.run_dimer_spinorb").main()
        else:
            raise SystemExit(f"unknown workload {w!r}")

    # on-disk entry name = "<key>-cache"
    existing = {p.name for p in CACHE.iterdir()}
    names = {k if k in existing else k + "-cache" for k in col.keys}
    keys = sorted(k for k in names if k in existing)
    missing = sorted(k for k in names if k not in existing)
    prev = json.loads(KEEP.read_text())["keep"] if KEEP.exists() else []
    keep = sorted(set(prev) | set(keys))
    KEEP.write_text(json.dumps(
        {"keep": keep, "workloads": workloads, "not_on_disk": missing},
        indent=1,
    ) + "\n")
    print(json.dumps({"collected": len(keys), "keep_total": len(keep),
                      "not_on_disk": len(missing)}))


def prune(dry: bool) -> None:
    keep = set(json.loads(KEEP.read_text())["keep"]) | _SPECIAL
    victims = [
        p for p in CACHE.iterdir() if p.is_file() and p.name not in keep
    ]
    freed = sum(p.stat().st_size for p in victims)
    kept = sum(
        p.stat().st_size
        for p in CACHE.iterdir() if p.is_file() and p.name in keep
    )
    for p in victims:
        print(f"[cache_gc] {'would drop' if dry else 'drop'} "
              f"{p.name} ({p.stat().st_size >> 20} MB)", file=sys.stderr)
        if not dry:
            p.unlink()
    print(json.dumps({
        "dropped": len(victims), "freed_mb": freed >> 20,
        "kept_mb": kept >> 20, "dry_run": dry,
    }))


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("collect", "prune"):
        raise SystemExit(__doc__)
    if sys.argv[1] == "collect":
        collect(sys.argv[2:] or ["bench", "bench_large", "bench_xl"])
    else:
        prune(dry="--dry-run" in sys.argv)


if __name__ == "__main__":
    main()
