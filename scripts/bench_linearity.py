"""Scale-linearity bench: top-10 steady queries at 1x vs 10x data.

Round-4 verdict item 5: all correctness runs at sf0.01 and all bench
at sf0.1 — nothing empirically rules out quadratic candidate-pair
growth hiding in the LSH / Hamming / inverted-index tiers. This runs
the steady-query set on two corpora produced by the SAME generator
(scripts/gen_sf.py) at 1x (5k docs / 2k vecs) and 10x (50k / 20k),
so the only variable is data volume, and reports wall ratios.

A plan is linear-ish if wall(10x) <= ~12x wall(1x) (constant factors
amortize; >20x flags superlinear candidate growth).

Usage: python scripts/bench_linearity.py [dir_1x] [dir_10x] [q ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from mivaa_pdf_extractor_spark.core.cache import release_cached  # noqa: E402
from mivaa_pdf_extractor_spark.session import build_session  # noqa: E402

STEADY = [
    "chunk_layout_spans", "embedding_topk_lsh", "media_dedup_hamming",
    "dedup_ngram_jaccard", "embedding_near_dups", "ngram_lm_perplexity",
    "kb_chunk_expand", "chunks_indexed", "decontaminate", "doc_winnowing",
]
REPS = int(os.environ.get("SPARK_GRAFT_STEADY_REPEATS", "3"))


def median_wall(fn, spark, sf_dir: str) -> tuple[float, int]:
    walls, rows = [], -1
    for _ in range(REPS):
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = df.count()
        walls.append(time.time() - t0)
        release_cached()
    return sorted(walls)[len(walls) // 2], rows


def main() -> None:
    d1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfA"
    d10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    only = sys.argv[3:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="linearity", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers
    spark.range(256).repartition(256).mapInPandas(
        lambda it: it, "id long").count()

    queries = entrymod.queries()
    out = {}
    for name in (only or STEADY):
        fn = queries[name]
        w1, r1 = median_wall(fn, spark, d1)
        w10, r10 = median_wall(fn, spark, d10)
        ratio = round(w10 / w1, 2) if w1 > 0 else float("inf")
        out[name] = {"wall_1x": round(w1, 3), "wall_10x": round(w10, 3),
                     "ratio": ratio, "rows_1x": r1, "rows_10x": r10}
        print(f"{name:28s} 1x {w1:7.2f}s ({r1} rows)   "
              f"10x {w10:7.2f}s ({r10} rows)   ratio {ratio:5.1f}"
              f"{'  <-- SUPERLINEAR' if ratio > 20 else ''}",
              flush=True)
    print(json.dumps({"linearity": out, "reps": REPS, "cpus": int(cpus)}))
    spark.stop()


if __name__ == "__main__":
    main()
