"""Pin the T1/T2 normalization semantics with hand-written expectations and
keep the scalar (oracle) and vectorized (engine) implementations in lockstep.
"""

import pandas as pd
import pytest
from hypothesis import given, strategies as st

from mivaa_pdf_extractor_spark.core.constants import GLYPH_REPLACEMENTS
from mivaa_pdf_extractor_spark.core.normalize import (normalize_series,
                                                      normalize_text)

CASES = [
    # glyph table entries (extractor.py:30-59 semantics)
    ("price /nine.LP/nine.LP/percent.LP", "price 99%"),
    ("a/emdash.cap b", "a— b"),
    ("/quotedblleft hi/quotedblright", "“ hi”"),
    # ligature passes in order (extractor.py:68-73)
    ("a/f_ter", "after"),
    ("pa/t_terns", "patterns"),
    # /a/t_tentive: first regex consumes /t_tentive -> '/attentive' stays
    # (pass order pinned; the second regex no longer matches)
    ("/a/t_tentive", "/attentive"),
    ("/f lag", "f lag"),
    # whitespace rules (extractor.py:76-82)
    ("a\n\n\n\nb", "a\n\nb"),
    ("a  \nb", "a\nb"),
    ("a   b", "a b"),
    # combined
    ("x/slash.LP y  z\n\n\n\nw", "x/ y z\n\nw"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_scalar(raw, expected):
    assert normalize_text(raw) == expected


def test_series_matches_scalar_on_cases():
    s = pd.Series([raw for raw, _ in CASES])
    out = normalize_series(s).tolist()
    assert out == [normalize_text(raw) for raw, _ in CASES]


@given(st.text(
    alphabet=st.sampled_from(list("ab /_.\nLP9") + list("/f_t")),
    max_size=60))
def test_series_matches_scalar_fuzz(raw):
    assert normalize_series(pd.Series([raw]))[0] == normalize_text(raw)


def test_all_glyphs_replaced():
    raw = " ".join(GLYPH_REPLACEMENTS.keys())
    out = normalize_text(raw)
    for glyph in GLYPH_REPLACEMENTS:
        assert glyph not in out
