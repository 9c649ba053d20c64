"""GAMESS comparator tests (utils/run_gamess.py equivalent).

No GAMESS binary ships anywhere near this environment, so the scraper is
exercised against a committed archived-output fixture (its stated second
role), and the input-deck generator against GAMESS's namelist grammar.
"""

from pathlib import Path

import numpy as np

from afesp_tpu.utils.gamess import generate_input, scrape_output

FIXTURE = Path(__file__).parent / "fixtures" / "gamess_crcc.out"


def test_scrape_archived_output():
    vec = scrape_output(FIXTURE.read_text().splitlines())
    expected = np.array(
        [
            -198.7017590776,  # REFERENCE
            -199.0531786921,  # MBPT(2)
            -199.0662953019,  # CCSD
            -199.0873411267,  # CCSD[T]
            -199.0859454726,  # CCSD(T)
            -199.0837170825,  # R-CCSD[T]
            -199.0824806241,  # R-CCSD(T)
            -199.0823582434,  # CR-CCSD[T]
            -199.0812536836,  # CR-CCSD(T)
            0.01376109,  # T1 diagnostic
            1.06641438,  # R-CCSD[T] denominator D[T]
            1.06641438,  # R-CCSD(T) denominator D(T)
        ]
    )
    np.testing.assert_allclose(vec, expected, rtol=0, atol=0)


def test_scrape_all_slots_filled():
    # every one of the 12 scrape slots must be hit by the fixture —
    # a silent zero means a label drifted from run_gamess.py:36-59
    vec = scrape_output(FIXTURE.read_text().splitlines())
    assert np.all(vec != 0.0)


def test_generate_input_deck(tmp_path):
    path = generate_input(1.75, tmp_path, "f2_1.750", "accd", symbol="F")
    text = path.read_text()
    assert "cctyp=cr-cc" in text
    assert "$basis  accd $end" in text
    assert "F 1 1.75" in text
    # namelist groups are balanced
    assert text.count("$end") == 6  # 5 groups + $data terminator
