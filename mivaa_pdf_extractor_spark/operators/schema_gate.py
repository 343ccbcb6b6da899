"""Request-schema validation folds (app/schemas/common.py,
app/schemas/images.py).

Pydantic executes these gates per request; the rules themselves are
deterministic data logic (file:line):

* ``PaginationResponse.calculate_pagination_fields``
  (common.py:108-121): ``total_pages = max(1, ceil(total/size))``
  via the add-and-floor-div idiom — an EMPTY result still reports 1
  page (pin); has_next = page < total_pages; has_previous = page > 1.
* ``ProcessingOptions.validate_timeout`` (common.py:236-242):
  valid range is [10, 3600] INCLUSIVE (``v < 10 or v > 3600``
  rejects); None passes the validator untouched (Optional default).
* ``PaginationParams`` sort_order ∈ {asc, desc}; quality ∈
  {fast, standard, high} (regex-anchored Field patterns).
* ``ImageAnalysisRequest.validate_analysis_types``
  (images.py:37-44): each entry must be in the 7-type bank; the
  error quotes the FIRST offending type.
* ``validate_image_source`` (images.py:46-54): image_id XOR
  image_url — neither and BOTH are errors with distinct messages
  (pin).
* ``BoundingBox.validate_coordinates`` (images.py:77-81):
  [0, 1] inclusive per coordinate.

Map-side projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ANALYSIS_TYPES = ("description", "ocr", "objects", "faces",
                  "landmarks", "logos", "text_detection")


def derive_pagination(pages: DataFrame) -> DataFrame:
    """(total_count, page, page_size) -> derived response fields."""
    total_pages = F.greatest(
        F.lit(1),
        F.floor((F.col("total_count") + F.col("page_size") - 1)
                / F.col("page_size")).cast("int"))
    return pages.select(
        "row_id", "total_count", "page", "page_size",
        total_pages.cast("int").alias("total_pages"),
        (F.col("page") < total_pages).alias("has_next"),
        (F.col("page") > 1).alias("has_previous"))


def validate_requests(reqs: DataFrame) -> DataFrame:
    """(row_id, sort_order nullable, quality nullable, timeout int
    nullable, analysis_type nullable, has_image_id, has_image_url,
    bbox_v double nullable) -> first validation error or NULL."""
    bad_sort = (F.col("sort_order").isNotNull()
                & ~F.col("sort_order").isin("asc", "desc"))
    bad_quality = (F.col("quality").isNotNull()
                   & ~F.col("quality").isin("fast", "standard",
                                            "high"))
    bad_timeout = (F.col("timeout").isNotNull()
                   & ((F.col("timeout") < 10)
                      | (F.col("timeout") > 3600)))
    bad_atype = (F.col("analysis_type").isNotNull()
                 & ~F.col("analysis_type").isin(*ANALYSIS_TYPES))
    neither = ~F.col("has_image_id") & ~F.col("has_image_url")
    both = F.col("has_image_id") & F.col("has_image_url")
    bad_bbox = (F.col("bbox_v").isNotNull()
                & ((F.col("bbox_v") < 0) | (F.col("bbox_v") > 1)))
    err = (
        F.when(bad_sort,
               F.lit('sort_order must be either "asc" or "desc"'))
        .when(bad_quality, F.lit("quality pattern mismatch"))
        .when(bad_timeout,
              F.lit("timeout_seconds must be between 10 and 3600"))
        .when(bad_atype,
              F.concat(F.lit("Invalid analysis type: "),
                       F.col("analysis_type")))
        .when(neither,
              F.lit("Either image_id or image_url must be provided"))
        .when(both,
              F.lit("Provide either image_id or image_url, not both"))
        .when(bad_bbox,
              F.lit("Coordinates must be normalized between 0 and 1")))
    return reqs.select("row_id", err.alias("validation_error"),
                       err.isNull().alias("valid"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_pages(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        (e % 2050).cast("long").alias("total_count"),
        ((e % 40) + 1).cast("int").alias("page"),
        F.when(e % 5 == 0, 1).when(e % 5 == 1, 20).when(e % 5 == 2, 50)
        .otherwise(100).cast("int").alias("page_size"))


SYNTH_PAGES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CAST(event_id % 2050 AS BIGINT) AS total_count,
           CAST(event_id % 40 + 1 AS INT) AS page,
           CAST(CASE event_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 20
                WHEN 2 THEN 50 ELSE 100 END AS INT) AS page_size
    FROM events
"""


def pagination_sql() -> str:
    return f"""
        WITH p AS ({SYNTH_PAGES_SQL}),
        d AS (SELECT *, CAST(greatest(1,
                   (total_count + page_size - 1) // page_size)
                   AS INT) AS total_pages
              FROM p)
        SELECT row_id, total_count, page, page_size, total_pages,
               page < total_pages AS has_next,
               page > 1 AS has_previous
        FROM d
    """


def synth_validation_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, "asc").when(e % 5 == 2, "desc")
        .when(e % 5 == 3, "ASC").otherwise("descending")
        .alias("sort_order"),
        F.when(e % 4 == 0, "fast").when(e % 4 == 1, "standard")
        .when(e % 4 == 2, "ultra").otherwise(F.lit(None).cast("string"))
        .alias("quality"),
        F.when(e % 7 == 0, F.lit(None).cast("int"))
        .when(e % 7 == 1, 9).when(e % 7 == 2, 10)
        .when(e % 7 == 3, 3600).when(e % 7 == 4, 3601)
        .otherwise((e % 500 + 10).cast("int")).alias("timeout"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, "ocr").when(e % 6 == 2, "objects")
        .when(e % 6 == 3, "sentiment").otherwise("description")
        .alias("analysis_type"),
        (e % 3 != 0).alias("has_image_id"),
        (e % 4 != 1).alias("has_image_url"),
        F.when(e % 8 == 0, F.lit(None).cast("double"))
        .when(e % 8 == 1, F.lit(0.0)).when(e % 8 == 2, F.lit(1.0))
        .when(e % 8 == 3, F.lit(1.25)).when(e % 8 == 4, F.lit(-0.5))
        .otherwise((e % 100).cast("double") / 100).alias("bbox_v"))


SYNTH_VALIDATION_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE event_id % 5 WHEN 0 THEN NULL WHEN 1 THEN 'asc'
                WHEN 2 THEN 'desc' WHEN 3 THEN 'ASC'
                ELSE 'descending' END AS sort_order,
           CASE event_id % 4 WHEN 0 THEN 'fast' WHEN 1 THEN 'standard'
                WHEN 2 THEN 'ultra' ELSE NULL END AS quality,
           CAST(CASE event_id % 7 WHEN 0 THEN NULL WHEN 1 THEN 9
                WHEN 2 THEN 10 WHEN 3 THEN 3600 WHEN 4 THEN 3601
                ELSE event_id % 500 + 10 END AS INT) AS timeout,
           CASE event_id % 6 WHEN 0 THEN NULL WHEN 1 THEN 'ocr'
                WHEN 2 THEN 'objects' WHEN 3 THEN 'sentiment'
                ELSE 'description' END AS analysis_type,
           event_id % 3 <> 0 AS has_image_id,
           event_id % 4 <> 1 AS has_image_url,
           CASE event_id % 8 WHEN 0 THEN NULL WHEN 1 THEN 0.0
                WHEN 2 THEN 1.0 WHEN 3 THEN 1.25 WHEN 4 THEN -0.5
                ELSE CAST(event_id % 100 AS DOUBLE) / 100 END
               AS bbox_v
    FROM events
"""


def validation_sql() -> str:
    types = ", ".join(f"'{t}'" for t in ANALYSIS_TYPES)
    return f"""
        WITH r AS ({SYNTH_VALIDATION_SQL})
        SELECT row_id,
               CASE
                 WHEN sort_order IS NOT NULL
                      AND sort_order NOT IN ('asc', 'desc')
                   THEN 'sort_order must be either "asc" or "desc"'
                 WHEN quality IS NOT NULL
                      AND quality NOT IN ('fast', 'standard', 'high')
                   THEN 'quality pattern mismatch'
                 WHEN timeout IS NOT NULL
                      AND (timeout < 10 OR timeout > 3600)
                   THEN 'timeout_seconds must be between 10 and 3600'
                 WHEN analysis_type IS NOT NULL
                      AND analysis_type NOT IN ({types})
                   THEN 'Invalid analysis type: ' || analysis_type
                 WHEN NOT has_image_id AND NOT has_image_url
                   THEN 'Either image_id or image_url must be '
                        || 'provided'
                 WHEN has_image_id AND has_image_url
                   THEN 'Provide either image_id or image_url, '
                        || 'not both'
                 WHEN bbox_v IS NOT NULL
                      AND (bbox_v < 0 OR bbox_v > 1)
                   THEN 'Coordinates must be normalized between 0 '
                        || 'and 1'
               END AS validation_error,
               CASE
                 WHEN sort_order IS NOT NULL
                      AND sort_order NOT IN ('asc', 'desc') THEN FALSE
                 WHEN quality IS NOT NULL
                      AND quality NOT IN ('fast', 'standard', 'high')
                   THEN FALSE
                 WHEN timeout IS NOT NULL
                      AND (timeout < 10 OR timeout > 3600) THEN FALSE
                 WHEN analysis_type IS NOT NULL
                      AND analysis_type NOT IN ({types}) THEN FALSE
                 WHEN NOT has_image_id AND NOT has_image_url
                   THEN FALSE
                 WHEN has_image_id AND has_image_url THEN FALSE
                 WHEN bbox_v IS NOT NULL
                      AND (bbox_v < 0 OR bbox_v > 1) THEN FALSE
                 ELSE TRUE
               END AS valid
        FROM r
    """


# ---------------------------------------------------------------------------
# PDF ProcessingOptions validators (app/models/processing.py:23-142)
# ---------------------------------------------------------------------------

def processing_options_validate(reqs: DataFrame) -> DataFrame:
    """processing.py pins:

    - pages: every entry must be >= 1 (:96-104); NULL list passes;
    - max_image_size must be STRICTLY greater than min_image_size —
      equality rejects (:106-113); the comparison reads
      ``info.data.get('min_image_size', 100)`` so an ABSENT min uses
      100 while a PRESENT one (even invalid elsewhere) is used as-is
      (pin);
    - image_dpi in [72, 600] / download timeout [5, 300] inclusive
      Field gates;
    - pdf_url (:131-141): scheme must be http(s), then
      ``'pdf' in url.lower()`` — ANY 'pdf' SUBSTRING passes
      ('https://x/pdfviewer?id=3' is accepted as "a PDF file" — pin);
      NULL url passes.
    """
    pages_ok = (F.col("pages").isNull()
                | (F.size(F.filter(F.col("pages"),
                                   lambda p: p < 1)) == 0))
    min_size = F.when(F.col("has_min_size"), F.col("min_image_size")) \
        .otherwise(F.lit(100))
    size_ok = F.col("max_image_size") > min_size
    dpi_ok = (F.col("image_dpi") >= 72) & (F.col("image_dpi") <= 600)
    timeout_ok = ((F.col("download_timeout") >= 5)
                  & (F.col("download_timeout") <= 300))
    url = F.col("pdf_url")
    scheme_ok = (url.startswith("http://")
                 | url.startswith("https://"))
    pdfish = F.lower(url).contains("pdf")
    url_err = (F.when(url.isNull(), F.lit(None).cast("string"))
               .when(~scheme_ok,
                     "PDF URL must start with http:// or https://")
               .when(~pdfish, "URL should point to a PDF file"))
    err = (F.when(~pages_ok, "Page numbers must be positive")
           .when(~size_ok,
                 "max_image_size must be greater than min_image_size")
           .when(~dpi_ok, "image_dpi out of range")
           .when(~timeout_ok, "download_timeout out of range")
           .otherwise(url_err))
    return reqs.select("row_id", err.alias("validation_error"),
                       err.isNull().alias("valid"))


def synth_processing_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 6 == 0, F.lit(None).cast("array<int>"))
        .when(e % 6 == 1, F.array(F.lit(1), F.lit(3)))
        .when(e % 6 == 2, F.array(F.lit(0), F.lit(2)))
        .when(e % 6 == 3, F.array(F.lit(-1)))
        .otherwise(F.array((e % 40 + 1).cast("int"))).alias("pages"),
        (e % 5 != 0).alias("has_min_size"),
        ((e % 300) + 10).cast("int").alias("min_image_size"),
        F.when(e % 7 == 0, F.lit(100))      # equals default -> reject
        .otherwise(((e % 500) + 50).cast("int"))
        .alias("max_image_size"),
        F.when(e % 9 == 0, 71).when(e % 9 == 1, 72)
        .when(e % 9 == 2, 600).when(e % 9 == 3, 601)
        .otherwise(250).cast("int").alias("image_dpi"),
        F.when(e % 8 == 0, 4).when(e % 8 == 1, 5)
        .when(e % 8 == 2, 300).when(e % 8 == 3, 301)
        .otherwise(30).cast("int").alias("download_timeout"),
        F.when(e % 10 == 0, F.lit(None).cast("string"))
        .when(e % 10 == 1, "ftp://x/a.pdf")
        .when(e % 10 == 2, "https://x/pdfviewer?id=3")
        .when(e % 10 == 3, "https://x/report.docx")
        .when(e % 10 == 4, "https://x/a.PDF")
        .otherwise(F.concat(F.lit("https://x/f"), e.cast("string"),
                            F.lit(".pdf"))).alias("pdf_url"))


SYNTH_PROCESSING_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE event_id % 6 WHEN 0 THEN NULL
                WHEN 1 THEN [1, 3] WHEN 2 THEN [0, 2]
                WHEN 3 THEN [-1]
                ELSE [CAST(event_id % 40 + 1 AS INT)] END AS pages,
           event_id % 5 <> 0 AS has_min_size,
           CAST(event_id % 300 + 10 AS INT) AS min_image_size,
           CAST(CASE WHEN event_id % 7 = 0 THEN 100
                ELSE event_id % 500 + 50 END AS INT)
               AS max_image_size,
           CAST(CASE event_id % 9 WHEN 0 THEN 71 WHEN 1 THEN 72
                WHEN 2 THEN 600 WHEN 3 THEN 601 ELSE 250 END AS INT)
               AS image_dpi,
           CAST(CASE event_id % 8 WHEN 0 THEN 4 WHEN 1 THEN 5
                WHEN 2 THEN 300 WHEN 3 THEN 301 ELSE 30 END AS INT)
               AS download_timeout,
           CASE event_id % 10 WHEN 0 THEN NULL
                WHEN 1 THEN 'ftp://x/a.pdf'
                WHEN 2 THEN 'https://x/pdfviewer?id=3'
                WHEN 3 THEN 'https://x/report.docx'
                WHEN 4 THEN 'https://x/a.PDF'
                ELSE 'https://x/f' || CAST(event_id AS VARCHAR)
                     || '.pdf' END AS pdf_url
    FROM events
"""


def processing_validate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_PROCESSING_SQL}),
        g AS (
          SELECT *,
                 pages IS NULL OR len(list_filter(pages, p -> p < 1))
                     = 0 AS pages_ok,
                 max_image_size > CASE WHEN has_min_size
                                       THEN min_image_size
                                       ELSE 100 END AS size_ok,
                 image_dpi BETWEEN 72 AND 600 AS dpi_ok,
                 download_timeout BETWEEN 5 AND 300 AS timeout_ok,
                 pdf_url LIKE 'http://%'
                     OR pdf_url LIKE 'https://%' AS scheme_ok,
                 strpos(lower(pdf_url), 'pdf') > 0 AS pdfish
          FROM r)
        SELECT row_id,
               CASE WHEN NOT pages_ok
                      THEN 'Page numbers must be positive'
                    WHEN NOT size_ok
                      THEN 'max_image_size must be greater than '
                           || 'min_image_size'
                    WHEN NOT dpi_ok THEN 'image_dpi out of range'
                    WHEN NOT timeout_ok
                      THEN 'download_timeout out of range'
                    WHEN pdf_url IS NULL THEN NULL
                    WHEN NOT scheme_ok
                      THEN 'PDF URL must start with http:// or '
                           || 'https://'
                    WHEN NOT pdfish
                      THEN 'URL should point to a PDF file'
               END AS validation_error,
               CASE WHEN NOT pages_ok OR NOT size_ok OR NOT dpi_ok
                         OR NOT timeout_ok THEN FALSE
                    WHEN pdf_url IS NULL THEN TRUE
                    WHEN NOT scheme_ok OR NOT pdfish THEN FALSE
                    ELSE TRUE END AS valid
        FROM g
    """
