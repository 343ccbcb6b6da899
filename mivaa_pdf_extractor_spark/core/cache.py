"""Persist-lifecycle registry for operator-internal cached DataFrames.

Several operators persist an intermediate (bucketed corpora, minhash
signature tables) because the plan references it from multiple join sides.
The operators are lazy — they return a DataFrame, so they cannot unpersist
before the caller materializes it. Instead every internal persist goes
through ``track``, and a long-lived session (REPL, service, bench loop)
calls ``release_cached()`` once the results of a call are materialized.
Short-lived jobs can ignore this entirely: executor storage is LRU-evicted
and dropped with the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def track(df: DataFrame,
          level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df.persist(level)
    _LIVE.append(df)
    return df


def release_cached() -> int:
    """Unpersist every operator-internal cached DataFrame registered since
    the last release. Returns the number released. Safe to call anytime
    after the dependent results are materialized (collected/written)."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _LIVE.clear()
    return n
