"""End-to-end output parity: the final energy-breakdown block must match
the committed els.out line-for-line (these labels/values are scraped by
els_wrapper.py, so they are the program's public API)."""

import io
import shutil

import pytest

from afesp_tpu.driver import run_calculation
from afesp_tpu.io.report import Reporter


def _breakdown_block(text: str) -> list[str]:
    lines = text.split("\n")
    try:
        start = next(i for i, l in enumerate(lines) if "Final energy breakdown" in l)
    except StopIteration:
        return []
    out = []
    for line in lines[start:]:
        out.append(line.rstrip())
        if line.lstrip().startswith("Total energy:"):
            break
    return out


@pytest.mark.parametrize(
    "name", ["f2-cc-pvdz/1.75_0.00", "n2-cc-pvdz/2.00_0.00"]
)
def test_breakdown_matches_reference(sample_data, tmp_path, name):
    src = sample_data / name
    for f in src.glob("*.dat"):
        shutil.copy(f, tmp_path / f.name)
    shutil.copy(src / "els.in", tmp_path / "els.in")
    if (src / "guess_in.dat").exists():
        shutil.copy(src / "guess_in.dat", tmp_path / "guess_in.dat")

    buf = io.StringIO()
    run_calculation(tmp_path, Reporter(stream=buf))

    mine = _breakdown_block(buf.getvalue())
    ref = _breakdown_block((src / "els.out").read_text())
    assert mine and ref
    assert len(mine) == len(ref)
    for m, r in zip(mine, ref):
        assert m == r, f"mismatch:\n  mine: {m!r}\n  ref:  {r!r}"
