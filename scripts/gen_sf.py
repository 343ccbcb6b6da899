"""Deterministic sf1.0 corpus generator for the scale-linearity bench.

/root/testdata is read-only and tops out at sf0.1 (5,000 documents);
the round-4 verdict asks for an empirical 10x-data point on the
steady queries to rule out hidden quadratic candidate growth in the
LSH / Hamming / inverted-index tiers. This synthesizes a 10x corpus
with the SAME distributional shape as the driver's tables (measured
from sf0.1):

- documents: doc_id 0..49,999; text = uniform draws from the same
  31-word vocabulary with word counts drawn from sf0.1's empirical
  [10, 100] distribution; lang ~ {en 41%, zh/es/fr/de ~15% each};
  source = src{doc_id % 20}; n_chars = len(text).  Replicating sf0.1
  rows verbatim would create 10-way exact-dup clusters that
  quadratically inflate pair counts — fresh draws keep per-bucket
  occupancy constant, which is the honest linearity test.
- embeddings: vec_id 0..19,999; 64-dim unit-norm vectors around 10
  cluster centroids (mixture like the original: label = centroid id).
- events: event_id 0..999,999 with the same column shapes.

Seeded numpy throughout — bit-identical across runs.

Usage: python scripts/gen_sf.py [out_dir=/tmp/sf1.0] [scale=10]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SQL = ("SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
             "FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY w")
LENGTHS_SQL = ("SELECT len(string_split(text, ' ')) AS c "
               "FROM '/root/testdata/sf0.1/documents.parquet'")


def gen_documents(out: str, n_docs: int, rng: np.random.Generator) -> None:
    con = duckdb.connect()
    vocab = np.array([r[0] for r in con.execute(VOCAB_SQL).fetchall()])
    lengths_pool = np.array([r[0] for r in
                             con.execute(LENGTHS_SQL).fetchall()])
    lengths = rng.choice(lengths_pool, size=n_docs, replace=True)
    langs = rng.choice(np.array(["en", "zh", "es", "fr", "de"]),
                       size=n_docs, p=[0.412, 0.150, 0.149, 0.148, 0.141])
    texts = []
    for i in range(n_docs):
        words = vocab[rng.integers(0, len(vocab), size=lengths[i])]
        texts.append(" ".join(words.tolist()))
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"),
                   row_group_size=4096)


def gen_embeddings(out: str, n_vecs: int, rng: np.random.Generator,
                   dim: int = 64, k: int = 10) -> None:
    centroids = rng.normal(size=(k, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n_vecs)
    vecs = centroids[labels] + 0.35 * rng.normal(size=(n_vecs, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"),
                   row_group_size=4096)


def gen_events(out: str, n_events: int, rng: np.random.Generator) -> None:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    ts = base + np.sort(
        rng.integers(0, 90 * 24 * 3600 * 10 ** 6,
                     size=n_events)).astype("timedelta64[us]")
    types = rng.choice(np.array(["view", "click", "purchase", "error"]),
                       size=n_events, p=[0.5, 0.3, 0.1, 0.1])
    tbl = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, 2000, size=n_events),
                            pa.int64()),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 500, size=n_events), 2),
                          pa.float64()),
        "props": pa.array([f'{{"k": {int(v)}}}' for v in
                           rng.integers(0, 100, size=n_events)],
                          pa.string()),
    })
    pq.write_table(tbl, os.path.join(out, "events.parquet"),
                   row_group_size=65536)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(out, 5000 * scale, rng)
    gen_embeddings(out, 2000 * scale, rng)
    gen_events(out, 100000 * scale, rng)
    print(f"wrote documents/embeddings/events x{scale} to {out}")


if __name__ == "__main__":
    main()
