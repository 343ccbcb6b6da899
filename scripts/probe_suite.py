"""Round-6 measurement probe: per-query wall split into plan-build
(Python DataFrame construction) vs execution (noop sink), over the
bench query list. Writes JSON to /tmp/probe_suite.json.

Usage: python scripts/probe_suite.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as em  # noqa: E402
import bench as benchmod  # noqa: E402
from mivaa_pdf_extractor_spark.core.cache import release_cached  # noqa: E402
from mivaa_pdf_extractor_spark.session import build_session  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_suite.json"
    only = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="probe_suite", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(256).repartition(256).mapInPandas(
        lambda it: it, "id long").count()
    qs = em.queries()
    names = only or benchmod.BENCH_QUERIES
    res = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            t0 = time.time()
            df = fn(spark, sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            res[name] = {"build": round(t1 - t0, 3),
                         "exec": round(t2 - t1, 3),
                         "total": round(t2 - t0, 3)}
        except Exception as exc:  # noqa: BLE001
            res[name] = {"error": str(exc)[:200]}
        finally:
            release_cached()
        print(json.dumps({name: res[name]}), flush=True)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1, sort_keys=True)
    tot = sum(r.get("total", 0) for r in res.values())
    b = sum(r.get("build", 0) for r in res.values())
    print(f"TOTAL {tot:.1f}s  build {b:.1f}s  n={len(res)}")
    spark.stop()


if __name__ == "__main__":
    main()
