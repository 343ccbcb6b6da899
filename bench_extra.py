"""Per-query isolation bench (guide §1.4): times declared queries with
the noop sink on a warm session, optionally repeats, and can dump
``explain("formatted")`` for plan evidence.

Usage:
    python bench_extra.py q1 q2 ...            # time each query
    python bench_extra.py --reps 3 q1          # repeat (min + median)
    python bench_extra.py --explain plans/r06/suffix q1
                                               # also write <q>_<suffix>.txt

Never used by the driver: bench.py stays the frozen measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from mivaa_pdf_extractor_spark.core.cache import release_cached  # noqa: E402
from mivaa_pdf_extractor_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="dir/suffix: write <dir>/<query>_<suffix>.txt")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="bench_extra",
                          master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm Python workers + JIT the Arrow path once
    spark.range(256).repartition(256).mapInPandas(
        lambda it: it, "id long").count()

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(f"!! no such query: {name}", file=sys.stderr)
            continue
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            release_cached()
        spark.sparkContext.setJobDescription(None)
        if args.explain:
            d, _, suffix = args.explain.partition(":")
            os.makedirs(d, exist_ok=True)
            df = fn(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    d, f"{name}_{suffix or 'plan'}.txt"), "w") as fh:
                fh.write(txt)
            release_cached()
        out[name] = {"walls": walls, "min": min(walls),
                     "median": sorted(walls)[len(walls) // 2]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
