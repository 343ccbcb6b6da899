"""Text normalization (SURVEY.md T1/T2).

Two independent implementations of the same pinned behavior tables
(core/constants.py): a scalar one for the oracle and a pandas-Series one for
the vectorized engine. Both apply, in order:

1. the GLYPH_REPLACEMENTS literal substitutions (reference first pass,
   app/core/extractor.py:61-63),
2. the LIGATURE_AND_WS_PASSES regexes (reference passes 2-4 plus the
   whitespace rules, extractor.py:68-82).

The pass order is semantic: e.g. ``/a/t_tentive`` is consumed by the *first*
ligature regex (matching ``/t_tentive``), yielding ``/attentive`` — the
second regex then no longer applies. We pin that exact behavior.
"""

from __future__ import annotations

import re

import pandas as pd

from .constants import GLYPH_REPLACEMENTS, LIGATURE_AND_WS_PASSES

_COMPILED_PASSES = [(re.compile(p), r) for p, r in LIGATURE_AND_WS_PASSES]


def normalize_text(text: str) -> str:
    """Scalar implementation (oracle side)."""
    for glyph, char in GLYPH_REPLACEMENTS.items():
        text = text.replace(glyph, char)
    for pattern, repl in _COMPILED_PASSES:
        text = pattern.sub(repl, text)
    return text


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized implementation (engine side). One pass per table entry over
    the whole Arrow batch — stays in pandas' C string kernels.

    Gated on cheap ``contains`` masks: the glyph/ligature passes only touch
    rows containing ``/``, the whitespace passes only rows containing a
    newline or double space — identical semantics (the passes are no-ops on
    the excluded rows), ~10x fewer kernel launches on clean corpora."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = s.astype("object").fillna("")
    arr = pa.array(s, type=pa.string())

    def _contains(sub: str) -> pd.Series:
        # C-level substring scan; pandas' object-dtype contains is a
        # per-row Python call
        return pd.Series(
            pc.match_substring(arr, sub).to_numpy(zero_copy_only=False),
            index=s.index)

    has_slash = _contains("/")
    if has_slash.any():
        sub = s[has_slash]
        for glyph, char in GLYPH_REPLACEMENTS.items():
            sub = sub.str.replace(glyph, char, regex=False)
        for pattern, repl in _COMPILED_PASSES[:3]:
            sub = sub.str.replace(pattern, repl, regex=True)
        s = s.copy()
        s[has_slash] = sub
    if has_slash.any():
        arr = pa.array(s, type=pa.string())  # re-scan post-substitution
    has_ws = _contains("\n") | _contains("  ")
    if has_ws.any():
        sub = s[has_ws]
        for pattern, repl in _COMPILED_PASSES[3:]:
            sub = sub.str.replace(pattern, repl, regex=True)
        s = s.copy()
        s[has_ws] = sub
    return s
