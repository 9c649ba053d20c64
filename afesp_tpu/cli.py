"""`els` console entry point — drop-in CLI for the reference's els.x.

Runs the calculation described by ./els.in (or a directory argument)
against the .dat integral files in that directory and prints the
reference-format report to stdout.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="els",
        description="TPU-native AFESP: RHF / MP2 / CCSD / CCSD(T) family",
    )
    p.add_argument(
        "workdir",
        nargs="?",
        default=".",
        help="directory containing els.in and the .dat integral files",
    )
    p.add_argument(
        "--device",
        choices=["auto", "cpu", "tpu"],
        default="auto",
        help="computation device for the post-HF stages (default: auto)",
    )
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from . import warmup
    from .driver import run_calculation

    try:
        run_calculation(args.workdir)
    except (FileNotFoundError, ValueError, RuntimeError) as e:
        # error() analogue (error_handling.f90:7-20): code 999
        print(" ERROR.", file=sys.stderr)
        print(f" Reason: {e}.", file=sys.stderr)
        print(" EXITING...", file=sys.stderr)
        # a compile-ahead prefetch may still be in flight; exiting while
        # XLA compiles on a daemon thread aborts the whole process with
        # SIGABRT instead of our exit code — wait it out first
        warmup.join()
        return 999
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
