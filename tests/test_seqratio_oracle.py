"""The DuckDB twin of difflib.SequenceMatcher.ratio is char-exact.

``text_similarity_seqratio`` was rows-only for three rounds ("no
native/SQL equivalent"); ``seqratio_oracle_sql`` closes it with a
recursive-CTE implementation of Ratcliff-Obershelp INCLUDING CPython's
autojunk heuristic (chars occurring more than ``len(b)//100 + 1``
times in a ``b`` of length >= 200 cannot seed a match but are still
consumed by the greedy extension loops — the subtle part: the
threshold is ``n//100 + 1``, not ``n//100``, and popular chars are
excluded from ``b2j`` but NOT in ``bjunk``).

Pure duckdb-vs-difflib — no SparkSession needed.
"""

import random
from difflib import SequenceMatcher

import duckdb

from mivaa_pdf_extractor_spark.operators.text_analysis import (
    seqratio_oracle_sql)

PAIRS_CTE = "SELECT * FROM fuzz_pairs"


def duck_ratios(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_pairs (id_a BIGINT, id_b BIGINT, "
                "text_a VARCHAR, text_b VARCHAR)")
    con.executemany("INSERT INTO fuzz_pairs VALUES (?,?,?,?)", pairs)
    rows = con.execute(
        seqratio_oracle_sql(PAIRS_CTE) + " ORDER BY id_a").fetchall()
    return [(r[0], r[1], r[2]) for r in rows]


def py_ratios(pairs):
    return sorted((ia, ib, round(SequenceMatcher(None, a, b).ratio(), 6))
                  for ia, ib, a, b in pairs)


def test_corpus_pairs_match_difflib():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, doc_id + 100000, text, text || ' zzzextra' "
        "FROM '/root/testdata/sf0.01/documents.parquet' "
        "WHERE doc_id % 100 = 0").fetchall()
    assert rows, "corpus pairs missing"
    assert duck_ratios(rows) == py_ratios(rows)


def test_fuzz_matches_difflib():
    rng = random.Random(7)
    alphabets = ["ab cde", "abcdefghijklmnopqrstuvwxyz ",
                 "ab", "abcdefgh  "]
    fuzz = []
    for t in range(80):
        alpha = rng.choice(alphabets)
        la = rng.choice([0, 1, 5, 50, 199, 200, 201, 230, 400])
        lb = rng.choice([0, 1, 5, 50, 199, 200, 201, 230, 400])
        sa = "".join(rng.choice(alpha) for _ in range(la))
        if rng.random() < 0.4 and la > 10:
            # near-duplicate with point edits — the realistic shape
            sb = list(sa)
            for _ in range(rng.randrange(1, 8)):
                p = rng.randrange(len(sb))
                op = rng.random()
                if op < 0.4:
                    sb[p] = rng.choice(alpha)
                elif op < 0.7:
                    sb.insert(p, rng.choice(alpha))
                else:
                    del sb[p]
            sb = "".join(sb)
        else:
            sb = "".join(rng.choice(alpha) for _ in range(lb))
        fuzz.append((t, t + 1000, sa, sb))
    got, want = duck_ratios(fuzz), py_ratios(fuzz)
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, bad[:5]


def test_autojunk_edges():
    # popularity threshold boundary: count == n//100 + 1 is NOT junk,
    # count == n//100 + 2 is; plus empty-vs-empty = 1.0
    base = ("abcdefghij" * 20)          # len 200, each char count 20
    cases = [
        (0, 1000, "", ""),               # ratio 1.0 by definition
        (1, 1001, "xyz", ""),
        (2, 1002, base, base),           # all chars popular (20 > 3)
        (3, 1003, base, base[:100]),     # b < 200: autojunk off
        (4, 1004, "q" * 3 + "z" * 197, "q" * 3 + "z" * 197),
        # 'q' count 3 == 200//100+1: seeds allowed; 'z' 197: junk
    ]
    assert duck_ratios(cases) == py_ratios(cases)
