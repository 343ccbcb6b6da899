"""Input span ``kind`` attribute codec.

FIXTURES.md §1.1 packs the geometry/media attributes the reference derives
from pixels into the raw ``kind`` string: ``base[;k=v;...]`` — e.g.
``text;page=1;y=120;x=40;size=11`` or
``image;page=2;y=300;x=60;w=200;h=100;edpi=250;phash=a1b2c3d4e5f60718``.

Scalar parser here (used by the oracle and by the synthetic generator);
the engine parses the same grammar vectorized with pandas ``str.extract``
(operators/extract.py) — keep the two in sync via tests/test_kinds.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SpanAttrs:
    base: str
    page: int = 1
    y: float = 0.0
    x: float = 0.0
    size: float = 10.0
    mono: int = 0
    col: int = 0
    w: float = 0.0
    h: float = 0.0
    edpi: int = 0
    phash: str = ""
    extra: dict = field(default_factory=dict)


_FLOAT_KEYS = {"y", "x", "size", "w", "h"}
_INT_KEYS = {"page", "mono", "col", "edpi"}


def parse_kind(kind: str) -> SpanAttrs:
    """Parse ``base;k=v;...``. Lenient: missing attrs keep defaults;
    unparseable values keep defaults (the engine treats *None* kind as a
    document failure, not a bad attribute)."""
    parts = kind.split(";")
    attrs = SpanAttrs(base=parts[0])
    for part in parts[1:]:
        if "=" not in part:
            continue
        k, _, v = part.partition("=")
        try:
            if k in _FLOAT_KEYS:
                setattr(attrs, k, float(v))
            elif k in _INT_KEYS:
                setattr(attrs, k, int(v))
            elif k == "phash":
                attrs.phash = v
            else:
                attrs.extra[k] = v
        except ValueError:
            continue
    return attrs


def make_kind(base: str, **attrs) -> str:
    """Inverse of :func:`parse_kind` for the synthetic generator."""
    parts = [base]
    for k, v in attrs.items():
        if isinstance(v, float) and v == int(v):
            v = int(v)
        parts.append(f"{k}={v}")
    return ";".join(parts)
