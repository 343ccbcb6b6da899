"""Driver-shaped correctness sweep over the FULL contract registry.

The per-round driver samples ~50 of the 545 registered queries and
canonicalizes with a stricter recipe than scripts/check_contract.py:
it sorts rows by the RAW column values (pandas ``sort_values`` /
hash-based uniquing) before hashing — which throws
``TypeError: unhashable type: 'list'`` on any top-level array column
(the only red rows in CORRECTNESS_r04 were exactly this).  The
in-repo checker's ``canon`` masked that class of failure by
``astype(str)``-ing object columns FIRST.

This sweep replicates the driver's shape so canonicalization
divergence surfaces before the driver's next sample:

1. **Canonicalizability probe** (the crash class): on the raw pandas
   frame, run ``sort_values`` over every column and
   ``pd.util.hash_pandas_object`` — any unhashable/unsortable dtype
   (list, dict, ndarray) fails the query even if values would match.
2. **Value hash**: after the probe passes, both frames are
   canonicalized tolerantly (float round to 9, datetime to string,
   column-name sort, row sort) and compared cell-for-cell.

Usage: python scripts/driver_twin_sweep.py [sf_dir] [query ...]
Writes a one-line JSON summary to stdout at the end; non-zero exit on
any failure.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from mivaa_pdf_extractor_spark.session import build_session  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def driver_probe(df: pd.DataFrame) -> str | None:
    """The driver's crash surface: raw sort + hash. Returns an error
    string, or None if the frame is canonicalizable."""
    try:
        s = df[sorted(df.columns)]
        s = s.sort_values(list(s.columns))
        pd.util.hash_pandas_object(s, index=False)
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e}"
    return None


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_rows_only = 0
    failures: list[str] = []
    uncanon: list[str] = []
    t_start = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        probe_err = driver_probe(sdf)
        if probe_err:
            print(f"FAIL {name}: NOT driver-canonicalizable: {probe_err}")
            uncanon.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows, "
                  f"canonicalizable ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        o_probe = driver_probe(ddf)
        if o_probe:
            print(f"FAIL {name}: oracle NOT canonicalizable: {o_probe}")
            uncanon.append(name)
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} "
                  f"vs {list(b.columns)}")
            failures.append(name)
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
            continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; "
                  "first:")
            idx = diff.idxmax()
            print("  spark:", a.loc[idx].to_dict())
            print("  duck :", b.loc[idx].to_dict())
            failures.append(name)
            continue
        print(f"PASS {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
        n_pass += 1

    summary = {
        "sweep": "driver_twin",
        "sf_dir": sf_dir,
        "queries": len(queries) if not only else len(only),
        "value_matched": n_pass,
        "rows_only_canonicalizable": n_rows_only,
        "not_canonicalizable": uncanon,
        "failed": failures,
        "wall_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary))
    spark.stop()
    return 1 if (failures or uncanon) else 0


if __name__ == "__main__":
    raise SystemExit(main())
