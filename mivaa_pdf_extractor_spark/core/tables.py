"""Table grid normalization + markdown pipe-table serialization.

Models the reference's grid semantics (SURVEY.md G1/G4 and M3):

- grid normalize — drop all-blank rows, pad ragged rows to a rectangle,
  require >= 2x2 (table_extraction.py:154-166, minimums :32-33);
- pipe-table serialization — GitHub pipe table with a ``| --- |`` alignment
  row after the header, matching the golden-fixture shape the reference pins
  in tests/unit/test_table_extraction.py:61-65.

Pure formatting leaves — shared verbatim by oracle and engine (like the
constant tables, these are data-shaped; the *assembly* of grids from spans is
implemented twice).
"""

from __future__ import annotations


def normalize_grid(grid: list[list[str]]) -> list[list[str]] | None:
    """Drop blank rows, pad ragged rows, enforce minimum size.

    Returns None when the grid does not qualify as a table (< 2 rows or
    < 2 cols after normalization) — "None is not an empty table"
    (table_extraction.py:136-151).
    """
    rows = [r for r in grid if any(c.strip() for c in r)]
    if not rows:
        return None
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    if len(rows) < 2 or width < 2:
        return None
    return rows


def grid_to_pipe_table(grid: list[list[str]]) -> str:
    """Serialize a normalized rectangular grid to a GitHub pipe table."""
    def row(cells: list[str]) -> str:
        return "| " + " | ".join(c.strip() for c in cells) + " |"

    header = row(grid[0])
    align = "| " + " | ".join("---" for _ in grid[0]) + " |"
    body = [row(r) for r in grid[1:]]
    return "\n".join([header, align, *body])
