"""Persist-lifecycle registry for operator-internal cached DataFrames.

Several operators persist an intermediate (bucketed corpora, minhash
signature tables) because the plan references it from multiple join sides.
The operators are lazy — they return a DataFrame, so they cannot unpersist
before the caller materializes it. Instead every internal persist goes
through ``track``, and a long-lived session (REPL, service, bench loop)
calls ``release_cached()`` once the results of a call are materialized.
Short-lived jobs can ignore this entirely: executor storage is LRU-evicted
and dropped with the session.

Concurrency (ADVICE r3): the registry is lock-guarded, and jobs that run
concurrently on one SparkSession should scope their persists with
``cache_scope()`` — releasing a scope unpersists only the DataFrames
tracked inside it, so a parallel query's still-needed intermediates are
never dropped mid-flight. The process-global ``release_cached()`` remains
for single-job sessions and releases only globally-tracked frames (it does
not reach into open scopes).
"""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
_GLOBAL: list[DataFrame] = []
# innermost-first stack of open scopes, per thread: track() in a thread
# with an open scope registers there instead of globally
_SCOPES = threading.local()


def _current_registry() -> list[DataFrame]:
    stack = getattr(_SCOPES, "stack", None)
    return stack[-1] if stack else _GLOBAL


def track(df: DataFrame,
          level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for later release (in the innermost
    open ``cache_scope()`` of this thread, else the global registry)."""
    df.persist(level)
    with _LOCK:
        _current_registry().append(df)
    return df


def _drain(registry: list[DataFrame]) -> int:
    with _LOCK:
        drained = registry[:]
        registry.clear()
    for df in drained:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    return len(drained)


@contextlib.contextmanager
def cache_scope() -> Iterator[None]:
    """Scope operator-internal persists to this block: on exit, unpersist
    exactly the DataFrames tracked inside it — concurrent jobs on the same
    session are unaffected."""
    registry: list[DataFrame] = []
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    stack.append(registry)
    try:
        yield
    finally:
        stack.pop()
        _drain(registry)


def release_cached() -> int:
    """Unpersist every GLOBALLY-tracked cached DataFrame registered since
    the last release (frames inside open ``cache_scope()`` blocks are left
    to their scopes). Returns the number released. Safe to call anytime
    after the dependent results are materialized (collected/written)."""
    return _drain(_GLOBAL)
