"""Training-sequence packing.

The last step before a corpus feeds a trainer: short documents are packed
back-to-back into fixed token-budget sequences (next-fit, order-preserving)
so the training batch carries ~0 padding. This is the standard
pack-into-2048/4096-token-windows pass (T5's "pack examples" /
GPT-style pretraining batching); here the budget is a knob because the
contract corpus has ~55-word documents.

Scale design: packing is a sequential recurrence (the bin boundary depends
on the running fill, which prefix sums cannot express through the reset),
but it is sequential only WITHIN a pack partition — partitions pack
independently and a sequence never spans two of them, so the operator is
embarrassingly parallel across ``part_col``. At 100 TB you pick
``part_col`` = the corpus's physical partitioning (shard id), which makes
the groupBy a no-op co-partitioned exchange, and the per-group kernel a
single linear numpy pass. Global sequence ids are (part, seq_id) pairs —
no cross-partition coordination, by construction. The alternative — one
global next-fit stream — would serialize the whole corpus through one
task and is exactly what this design rejects.

Sequence ids are deterministic: docs pack in ``id_col`` order within each
part, so reruns reproduce byte-identical assignments (the property the
resume path needs, same argument as plans/pipeline.py J1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def next_fit_bins(t: np.ndarray, budget: int) -> np.ndarray:
    """The pure next-fit recurrence: bin index per item, in order.

    A separate function so the property suite can fuzz it directly
    against a naive reference without a Spark round-trip per example.
    The ``fill > 0`` guard: an empty current sequence always accepts the
    next item, even an oversize one (it gets the sequence to itself
    rather than an empty sequence appearing in the output). The ``x > 0``
    guard (property-pinned): zero-token items NEVER open a sequence —
    they ride the current one as weightless passengers (without the
    guard, a zero-token item following an oversize sequence would open
    an empty sequence of its own), so an oversize sequence holds exactly
    one non-zero item plus any zero-token riders.
    """
    bins = np.zeros(len(t), dtype=np.int32)
    fill = 0
    b = 0
    for i, x in enumerate(t):
        if fill > 0 and x > 0 and fill + x > budget:
            b += 1
            fill = 0
        fill += int(x)
        bins[i] = b
    return bins


def pack_sequences(df: DataFrame, tokens_col: str = "tokens",
                   id_col: str = "doc_id", part_col: str = "part",
                   budget: int = 128) -> DataFrame:
    """Next-fit pack documents into token-budget training sequences.

    Input rows: ``(id_col, part_col, tokens_col)``. Within each part,
    documents are taken in ascending ``id_col`` order; a document that
    would overflow the current sequence starts a new one. A document
    larger than ``budget`` occupies a sequence alone (it is never split —
    splitting is the chunker's job, operators/chunking.py).

    Returns ``(id_col, part_col, seq_id, tokens)`` — one row per input
    document with its assigned sequence. ``seq_id`` is per-part, 0-based.

    The kernel is an Arrow-batched pandas groupBy-apply: one linear pass
    per part over numpy arrays (the recurrence is inherently sequential;
    the loop is per-part, not per-corpus — see module docstring).
    """
    budget = int(budget)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(part_col, T.IntegerType()),
        T.StructField("seq_id", T.IntegerType()),
        T.StructField("tokens", T.IntegerType()),
    ])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        t = pdf[tokens_col].to_numpy()
        bins = next_fit_bins(t, budget)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            part_col: pdf[part_col].to_numpy().astype(np.int32),
            "seq_id": bins,
            "tokens": t.astype(np.int32),
        })

    return (df.select(F.col(id_col), F.col(part_col).cast("int"),
                      F.col(tokens_col).alias(tokens_col))
            .groupBy(part_col).applyInPandas(_pack, schema))
