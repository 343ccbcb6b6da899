"""S2: PDF-from-URL source (pdf_processor.py:381-428 semantics).

Spark-first shape: the URL table is a DataFrame; fetching is an
IO-bound ``mapInPandas`` pass with an INJECTABLE transport callable, so
the Spark plumbing (schema, batching, partition fan-out, status
taxonomy) is real and tested while the network itself stays out of this
environment — the default transport raises NotImplementedError, tests
and the contract query inject deterministic fakes.

Pinned reference semantics:

- a transport error or non-2xx status (``raise_for_status``) maps to the
  terminal ``download_failed`` status with the error recorded — the
  reference's ``PDFDownloadError`` path (pdf_processor.py:421-425);
- the content-type check only WARNS: a payload is flagged
  ``content_type_ok = false`` iff the header lacks ``application/pdf``
  AND the url does not end in ``.pdf`` (case-insensitive), but the bytes
  still flow downstream (pdf_processor.py:414-417);
- fetched bytes feed the S1 from-bytes pipeline (size gate, extraction)
  unchanged (pdf_processor.py:428).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

STATUS_FETCHED = "fetched"
STATUS_DOWNLOAD_FAILED = "download_failed"

FETCH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("url", T.StringType()),
    T.StructField("status", T.StringType(), False),
    T.StructField("content_type_ok", T.BooleanType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("error", T.StringType()),
])

# transport contract: (url, timeout_s) -> (http_status, content_type,
# payload_bytes); raise for transport-level failures (DNS, timeout)
Transport = Callable[[str, float], tuple[int, str, bytes]]


def _default_transport(url: str, timeout_s: float
                       ) -> tuple[int, str, bytes]:
    raise NotImplementedError(
        "network transport is not available in this environment; inject a "
        "fetcher (e.g. an httpx/requests wrapper on a real deployment, or "
        "fake_transport in tests)")


def fake_transport(url: str, timeout_s: float) -> tuple[int, str, bytes]:
    """Deterministic stand-in transport for tests and the contract query:
    everything is derived from the url string. URLs containing '#404'
    return HTTP 404; '#ct=html' returns a text/html content type;
    '#boom' raises (a transport-level failure); payload = utf-8 url."""
    if "#boom" in url:
        raise IOError(f"simulated transport failure for {url}")
    status = 404 if "#404" in url else 200
    ctype = "text/html" if "#ct=html" in url else "application/pdf"
    return status, ctype, url.encode("utf-8")


def content_type_ok(url_col, ctype_col) -> F.Column:
    """The reference's warn-only validation (pdf_processor.py:414-417):
    ok iff 'application/pdf' in the (lowercased) header OR the url ends
    with '.pdf' (lowercased). Native expression so the gate is
    twin-checkable independent of the transport."""
    lc_ct = F.lower(F.coalesce(ctype_col, F.lit("")))
    lc_url = F.lower(F.coalesce(url_col, F.lit("")))
    return lc_ct.contains("application/pdf") | lc_url.endswith(".pdf")


def fetch_documents_from_urls(
    urls: DataFrame,
    transport: Transport = _default_transport,
    timeout_s: float = 30.0,
    url_col: str = "url",
    id_col: str = "doc_id",
    fetch_partitions: int | None = None,
) -> DataFrame:
    """Fetch every URL through ``transport`` and emit one row per URL
    with the reference's status taxonomy. Fetching is IO-bound, not
    CPU-bound, so ``fetch_partitions`` (default 4x parallelism) fans the
    URL list wider than the CPU count — on a real cluster this is the
    concurrent-connection count, the analog of the reference's asyncio
    client concurrency."""
    spark = urls.sparkSession
    fan = fetch_partitions or 4 * spark.sparkContext.defaultParallelism
    slim = (urls.select(F.col(id_col).cast("string").alias("doc_id"),
                        F.col(url_col).alias("url"))
            .repartition(fan))

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                try:
                    code, ctype, payload = transport(url, timeout_s)
                    if not 200 <= code < 300:
                        raise IOError(f"HTTP {code}")
                except Exception as exc:  # noqa: BLE001 — status, not crash
                    rows.append((doc_id, url, STATUS_DOWNLOAD_FAILED,
                                 None, None, None,
                                 f"Failed to download PDF from {url}: "
                                 f"{exc}"))
                    continue
                lc = (ctype or "").lower()
                ok = ("application/pdf" in lc
                      or (url or "").lower().endswith(".pdf"))
                rows.append((doc_id, url, STATUS_FETCHED, ok, payload,
                             len(payload), None))
            yield pd.DataFrame(rows, columns=[f.name for f in FETCH_SCHEMA])

    return slim.mapInPandas(_fetch, schema=FETCH_SCHEMA)


def fetched_to_spans(fetched: DataFrame) -> DataFrame:
    """Bridge fetched payloads into the S1 from-bytes shape: successful
    rows become (doc_id, spans) with ONE text span holding the payload
    decoded as utf-8 — the synthetic analog of handing pdf_bytes to
    process_pdf_from_bytes (pdf_processor.py:428). Failed rows are
    dropped here; their statuses live in the fetch table for the
    checkpoint sink."""
    return (fetched.filter(F.col("status") == STATUS_FETCHED)
            .select("doc_id", F.array(F.struct(
                F.lit("text").alias("kind"),
                F.decode("content", "utf-8").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"))).alias("spans")))


def deterministic_urls(docs: DataFrame, id_col: str = "doc_id"
                       ) -> DataFrame:
    """Deterministic URL table for tests/benchmarks: every doc gets a
    url whose failure modes are decided by its id (mod 13 -> 404,
    mod 17 -> non-pdf content type served at a non-.pdf url, mod 19 ->
    transport failure), mirroring the corpus-synthesis conventions used
    by the other contract queries."""
    i = F.col(id_col).cast("bigint")
    frag = (F.when(i % 13 == 0, F.lit("#404"))
            .when(i % 19 == 0, F.lit("#boom"))
            .otherwise(F.lit("")))
    ext = F.when(i % 17 == 0, F.lit("#ct=html")).otherwise(F.lit(".pdf"))
    return docs.select(
        F.col(id_col),
        F.concat(F.lit("https://corpus.example/doc/"),
                 i.cast("string"), ext, frag).alias("url"))
