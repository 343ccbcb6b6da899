"""PDF error-taxonomy folds (app/utils/exceptions.py) — the
exception-to-HTTP envelope ladder as native projections:

- status resolve (:322-351): ``EXCEPTION_STATUS_CODES`` is walked in
  dict order with ``isinstance``, and the base ``PDFProcessingError``
  is the LAST entry — so every concrete subclass hits its specific
  code first and anything custom-but-unlisted falls to the base 500;
  non-PDF exceptions (ServiceError family included — they are NOT in
  the map) default to 500 (pin);
- response build (:353-374): PDF-family rows render ``to_dict()``
  (error_code / message / details); everything else gets the
  ``UNKNOWN_ERROR`` envelope whose details carry only the exception
  type name;
- per-class detail construction (:82-320), pinned key order and
  conditionals:
  * Validation: ``{"file_path": fp}`` then ``.update(validation_details)``
    — an override dict REPLACES file_path's value but dict.update keeps
    its original position (pin: key order survives the override);
  * Extraction: original_error adds TWO keys (str + type name) only
    when the original exception is present;
  * Size: ``size_ratio`` exists only when file_size AND max_size are
    both TRUTHY — a zero byte count silently omits the ratio (pin:
    falsy gate, not a None check);
  * Configuration: ``str(config_value) if config_value is not None`` —
    an is-None check, NOT a falsy ladder, so a present 0 becomes "0"
    (pin — contrast the base class's ``error_code or`` which IS falsy:
    a present-'' error_code folds to PDF_PROCESSING_ERROR);
  * Download: the ``timeout`` detail defaults False but an explicit
    None passes through;
- wrap resolve (:387-460, ``handle_extraction_errors``): an
  already-custom exception is re-raised UNCHANGED (never re-wrapped);
  a foreign exception is wrapped into PDFExtractionError with message
  ``"{operation} failed: {str(e)}"``, extraction_type = the operation
  name, and the original error folded into the details; with
  reraise=False both paths collapse to the default return (pin).

Details are modeled as typed columns plus ``detail_keys`` — the
comma-joined key list in Python dict insertion order — so the pinned
shape (order + conditional presence) is hash-checked without a
cross-engine JSON float-formatting dependency.

Scale: every fold is a map-only when-chain over the error-event
stream — no shuffle, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# EXCEPTION_STATUS_CODES (:322-333), base last — dict order IS the
# isinstance precedence
STATUS_CODES = (
    ("PDFValidationError", 400),
    ("PDFExtractionError", 422),
    ("PDFDownloadError", 502),
    ("PDFSizeError", 413),
    ("PDFTimeoutError", 504),
    ("PDFConfigurationError", 500),
    ("PDFStorageError", 500),
    ("PDFFormatError", 415),
    ("PDFProcessingError", 500),
)

# constructor-default messages (:93, :121, :156, :186, :217, :245,
# :274, :303)
DEFAULT_MESSAGES = {
    "PDFValidationError": "PDF file validation failed",
    "PDFExtractionError": "PDF content extraction failed",
    "PDFDownloadError": "PDF download failed",
    "PDFSizeError": "PDF file size exceeds limits",
    "PDFTimeoutError": "PDF processing timed out",
    "PDFConfigurationError": "PDF processing configuration error",
    "PDFStorageError": "PDF storage operation failed",
    "PDFFormatError": "PDF format is unsupported or invalid",
}

ERROR_CODES = {
    "PDFValidationError": "PDF_VALIDATION_ERROR",
    "PDFExtractionError": "PDF_EXTRACTION_ERROR",
    "PDFDownloadError": "PDF_DOWNLOAD_ERROR",
    "PDFSizeError": "PDF_SIZE_ERROR",
    "PDFTimeoutError": "PDF_TIMEOUT_ERROR",
    "PDFConfigurationError": "PDF_CONFIGURATION_ERROR",
    "PDFStorageError": "PDF_STORAGE_ERROR",
    "PDFFormatError": "PDF_FORMAT_ERROR",
}

PDF_FAMILY = tuple(ERROR_CODES) + ("PDFProcessingError",)

EXC_CLASSES = PDF_FAMILY + ("ServiceError", "ValueError", "RuntimeError")


def _truthy(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def build_error_responses(errs: DataFrame) -> DataFrame:
    """create_error_response + get_http_status_code + per-class
    to_dict details (:46-374)."""
    cls = F.col("exc_class")
    is_pdf = cls.isin(*PDF_FAMILY)

    status = F.lit(500)
    for name, code in STATUS_CODES:
        if code != 500:
            status = F.when(cls == name, F.lit(code)).otherwise(status)

    error_code = F.when(is_pdf & (cls != "PDFProcessingError"),
                        F.create_map(*[F.lit(x) for kv in
                                       ERROR_CODES.items() for x in kv]
                                     )[cls])
    # base class: error_code or "PDF_PROCESSING_ERROR" — LIVE falsy
    # ladder, '' folds to the default (:70)
    error_code = error_code.when(
        cls == "PDFProcessingError",
        F.when(_truthy(F.col("error_code_param")),
               F.col("error_code_param"))
        .otherwise(F.lit("PDF_PROCESSING_ERROR")))
    error_code = error_code.otherwise(F.lit("UNKNOWN_ERROR"))

    # NULL message = omitted argument -> the class default; base and
    # foreign classes have no default (message there is positional /
    # str(e)), so the synth never NULLs it on those rows
    msg = F.col("message")
    for name, dflt in DEFAULT_MESSAGES.items():
        msg = F.when((cls == name) & F.col("message").isNull(),
                     F.lit(dflt)).otherwise(msg)

    has_orig = F.col("original_error").isNotNull()
    # `if file_size and max_size` — 0 is falsy, so a zero byte count
    # silently omits the ratio
    ratio_in = F.col("file_size").isNotNull() & (F.col("file_size") != 0) \
        & F.col("max_size").isNotNull() & (F.col("max_size") != 0)

    detail_keys = (
        F.when(cls == "PDFValidationError",
               F.when(F.col("vdetails_mode") == 0, F.lit("file_path"))
               .otherwise(F.lit("file_path,source")))
        .when(cls == "PDFExtractionError",
              F.when(has_orig, F.lit("extraction_type,page_number,"
                                     "original_error,original_error_type"))
              .otherwise(F.lit("extraction_type,page_number")))
        .when(cls == "PDFDownloadError", F.lit("url,status_code,timeout"))
        .when(cls == "PDFSizeError",
              F.when(ratio_in,
                     F.lit("file_size_bytes,max_size_bytes,size_ratio"))
              .otherwise(F.lit("file_size_bytes,max_size_bytes")))
        .when(cls == "PDFTimeoutError", F.lit("timeout_seconds,operation"))
        .when(cls == "PDFConfigurationError", F.lit("config_key,config_value"))
        .when(cls == "PDFStorageError", F.lit("operation,file_path"))
        .when(cls == "PDFFormatError", F.lit("pdf_version,is_encrypted"))
        .when(cls == "PDFProcessingError", F.lit(""))  # details or {}
        .otherwise(F.lit("exception_type")))

    vmode = F.col("vdetails_mode")
    d_file_path = (
        F.when(cls == "PDFValidationError",
               # mode 2: validation_details carries its own file_path
               # which OVERRIDES the positional one (dict.update)
               F.when(vmode == 2, F.col("override_path"))
               .otherwise(F.col("file_path")))
        .when(cls == "PDFStorageError", F.col("file_path")))

    return errs.select(
        "event_id", "exc_class",
        status.alias("status_code"),
        error_code.alias("error_code"),
        msg.alias("message_out"),
        detail_keys.alias("detail_keys"),
        d_file_path.alias("d_file_path"),
        F.when((cls == "PDFValidationError") & (vmode != 0),
               F.col("vsource")).alias("d_source"),
        F.when(cls == "PDFExtractionError",
               F.col("extraction_type")).alias("d_extraction_type"),
        F.when(cls == "PDFExtractionError",
               F.col("page_number")).cast("long").alias("d_page_number"),
        F.when((cls == "PDFExtractionError") & has_orig,
               F.col("original_error")).alias("d_original_error"),
        F.when((cls == "PDFExtractionError") & has_orig,
               F.col("orig_type")).alias("d_original_error_type"),
        F.when(cls == "PDFDownloadError", F.col("url")).alias("d_url"),
        F.when(cls == "PDFDownloadError", F.col("dl_status"))
        .cast("long").alias("d_status_code"),
        F.when(cls == "PDFDownloadError", F.col("timeout_flag"))
        .cast("int").alias("d_timeout"),
        F.when(cls == "PDFSizeError", F.col("file_size"))
        .cast("long").alias("d_file_size"),
        F.when(cls == "PDFSizeError", F.col("max_size"))
        .cast("long").alias("d_max_size"),
        F.when((cls == "PDFSizeError") & ratio_in,
               F.col("file_size").cast("double")
               / F.col("max_size").cast("double")).alias("d_size_ratio"),
        F.when(cls == "PDFTimeoutError", F.col("timeout_seconds"))
        .cast("long").alias("d_timeout_seconds"),
        F.when(cls.isin("PDFTimeoutError", "PDFStorageError"),
               F.col("operation")).alias("d_operation"),
        F.when(cls == "PDFConfigurationError", F.col("config_key"))
        .alias("d_config_key"),
        # str(config_value) if config_value is not None — is-None gate,
        # so a present 0 stringifies to "0"
        F.when(cls == "PDFConfigurationError",
               F.col("config_value").cast("string")).alias("d_config_value"),
        F.when(cls == "PDFFormatError", F.col("pdf_version"))
        .alias("d_pdf_version"),
        F.when(cls == "PDFFormatError", F.col("is_encrypted"))
        .cast("int").alias("d_is_encrypted"),
        F.when(~is_pdf, cls).alias("d_exception_type"))


def resolve_wraps(calls: DataFrame) -> DataFrame:
    """handle_extraction_errors (:414-456): custom passes through,
    foreign wraps into PDFExtractionError, reraise=False swallows."""
    cls = F.col("exc_class")
    is_pdf = cls.isin(*PDF_FAMILY)
    wrap_msg = F.concat(F.col("op_name"), F.lit(" failed: "),
                        F.col("message"))
    status = F.lit(500)
    for name, code in STATUS_CODES:
        if code != 500:
            status = F.when(cls == name, F.lit(code)).otherwise(status)
    return calls.select(
        "call_id",
        F.when(~F.col("reraise"), F.lit("default_return"))
        .when(is_pdf, F.lit("reraise_custom"))
        .otherwise(F.lit("wrap_extraction")).alias("outcome"),
        F.when(F.col("reraise"),
               F.when(is_pdf, cls).otherwise(F.lit("PDFExtractionError")))
        .alias("raised_class"),
        F.when(F.col("reraise"),
               F.when(is_pdf, F.col("message")).otherwise(wrap_msg))
        .alias("raised_message"),
        F.when(F.col("reraise") & ~is_pdf, F.col("op_name"))
        .alias("w_extraction_type"),
        F.when(F.col("reraise") & ~is_pdf, F.col("message"))
        .alias("w_original_error"),
        F.when(F.col("reraise") & ~is_pdf, cls)
        .alias("w_original_error_type"),
        F.when(F.col("reraise"),
               F.when(is_pdf, status).otherwise(F.lit(422)))
        .cast("int").alias("raised_status"))


def handler_dispatch(raised: DataFrame) -> DataFrame:
    """The app-level exception handlers (app/main.py:1094-1193):

    - MaterialKaiIntegrationError -> 503, fixed error text, detail =
      str(exc), no Sentry call (log-only handler);
    - HTTPException -> its own status, error ``HTTP_{code}``; Sentry
      routing: >=500 capture_exception; 4xx EXCEPT {401,403,404}
      capture_message at warning; the three noisy client codes send
      nothing (pin);
    - everything else -> 500 INTERNAL_SERVER_ERROR, capture_exception;
      the detail appends ``: {str(exc)}`` ONLY in debug mode — prod
      hides the message (pin).

    (The historical dual-class MaterialKaiIntegrationError shadowing —
    handler registered against one copy, services raising the other, so
    material-search failures fell to the generic 500 — is documented at
    material_kai_service.py:129-141 and FIXED there; this fold models
    the post-fix identity dispatch.)
    """
    kind = F.col("exc_kind")
    http_code = F.col("http_status")
    return raised.select(
        "raise_id",
        F.when(kind == "material_kai", F.lit(503))
        .when(kind == "http", http_code)
        .otherwise(F.lit(500)).cast("int").alias("response_status"),
        F.when(kind == "material_kai",
               F.lit("Material Kai Vision Platform is not available"))
        .when(kind == "http", F.concat(F.lit("HTTP_"), http_code))
        .otherwise(F.lit("INTERNAL_SERVER_ERROR")).alias("error"),
        F.when(kind == "general",
               F.when(F.col("debug"),
                      F.concat(F.lit("Internal server error: "),
                               F.col("detail")))
               .otherwise(F.lit("Internal server error")))
        .otherwise(F.col("detail")).alias("detail_out"),
        F.when(kind == "material_kai", F.lit("none"))
        .when(kind == "general", F.lit("capture_exception"))
        .when(http_code >= 500, F.lit("capture_exception"))
        .when((http_code >= 400) & ~http_code.isin(401, 403, 404),
              F.lit("capture_message"))
        .otherwise(F.lit("none")).alias("sentry_action"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_errors(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    cls = F.lit(EXC_CLASSES[0])
    for i, name in enumerate(EXC_CLASSES[1:], 1):
        cls = F.when(e % 12 == i, F.lit(name)).otherwise(cls)
    defaulted = F.col("exc_class").isin(*DEFAULT_MESSAGES)
    return events.filter(e < 600).select(
        e.alias("event_id"), cls.alias("exc_class"),
        (e % 3).cast("int").alias("vdetails_mode"),
    ).select(
        "event_id", "exc_class", "vdetails_mode",
        # NULL (= omitted) only where a default exists; '' stays ''
        F.when((e % 5 == 0) & defaulted, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("msg-"), e)).alias("message"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("EC-"), e)).alias("error_code_param"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("path-"), e % 7)).alias("file_path"),
        F.concat(F.lit("ovr-"), e % 5).alias("override_path"),
        F.concat(F.lit("src-"), e % 3).alias("vsource"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("etype-"), e % 4)).alias("extraction_type"),
        F.when(e % 8 == 0, F.lit(None).cast("long"))
        .otherwise((e % 40).cast("long")).alias("page_number"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("oerr-"), e)).alias("original_error"),
        F.when(e % 2 == 0, F.lit("ValueError"))
        .otherwise(F.lit("KeyError")).alias("orig_type"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("http://u/"), e % 11)).alias("url"),
        F.when(e % 5 == 0, F.lit(None).cast("long"))
        .otherwise((400 + e % 200).cast("long")).alias("dl_status"),
        # constructor default False; an explicit None passes through
        F.when(e % 3 == 0, F.lit(False))
        .when(e % 3 == 1, F.lit(True))
        .otherwise(F.lit(None).cast("boolean")).alias("timeout_flag"),
        ((e % 9) * 1000000).cast("long").alias("file_size"),
        F.when(e % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.lit(4000000).cast("long")).alias("max_size"),
        F.when(e % 6 == 0, F.lit(None).cast("long"))
        .otherwise((30 + e % 600).cast("long")).alias("timeout_seconds"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("op-"), e % 6)).alias("operation"),
        F.concat(F.lit("ck-"), e % 8).alias("config_key"),
        # includes 0 — str(0) = "0" through the is-None gate
        F.when(e % 5 == 0, F.lit(None).cast("long"))
        .otherwise((e % 5 - 1).cast("long")).alias("config_value"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("1."), e % 8)).alias("pdf_version"),
        F.when(e % 4 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_encrypted"))


_CLS_SQL = ("CASE event_id % 12 "
            + " ".join(f"WHEN {i} THEN '{n}'"
                       for i, n in enumerate(EXC_CLASSES) if i)
            + f" ELSE '{EXC_CLASSES[0]}' END")

_DEFAULTED_SQL = "(" + " OR ".join(
    f"exc_class = '{n}'" for n in DEFAULT_MESSAGES) + ")"

SYNTH_ERRORS_SQL = f"""
    SELECT event_id, exc_class,
           CAST(event_id % 3 AS INT) AS vdetails_mode,
           CASE WHEN event_id % 5 = 0 AND {_DEFAULTED_SQL} THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'msg-' || CAST(event_id AS VARCHAR) END AS message,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'EC-' || CAST(event_id AS VARCHAR) END
               AS error_code_param,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'path-' || CAST(event_id % 7 AS VARCHAR) END
               AS file_path,
           'ovr-' || CAST(event_id % 5 AS VARCHAR) AS override_path,
           'src-' || CAST(event_id % 3 AS VARCHAR) AS vsource,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'etype-' || CAST(event_id % 4 AS VARCHAR) END
               AS extraction_type,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE CAST(event_id % 40 AS BIGINT) END AS page_number,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE 'oerr-' || CAST(event_id AS VARCHAR) END
               AS original_error,
           CASE WHEN event_id % 2 = 0 THEN 'ValueError'
                ELSE 'KeyError' END AS orig_type,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'http://u/' || CAST(event_id % 11 AS VARCHAR) END
               AS url,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE CAST(400 + event_id % 200 AS BIGINT) END AS dl_status,
           CASE WHEN event_id % 3 = 0 THEN FALSE
                WHEN event_id % 3 = 1 THEN TRUE
                ELSE NULL END AS timeout_flag,
           CAST((event_id % 9) * 1000000 AS BIGINT) AS file_size,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(4000000 AS BIGINT) END AS max_size,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(30 + event_id % 600 AS BIGINT) END
               AS timeout_seconds,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'op-' || CAST(event_id % 6 AS VARCHAR) END AS operation,
           'ck-' || CAST(event_id % 8 AS VARCHAR) AS config_key,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE CAST(event_id % 5 - 1 AS BIGINT) END AS config_value,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE '1.' || CAST(event_id % 8 AS VARCHAR) END
               AS pdf_version,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS is_encrypted
    FROM (SELECT event_id, {_CLS_SQL} AS exc_class
          FROM events WHERE event_id < 600)
"""


def synth_wrap_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    cls = F.lit(EXC_CLASSES[0])
    for i, name in enumerate(EXC_CLASSES[1:], 1):
        cls = F.when(e % 12 == i, F.lit(name)).otherwise(cls)
    return events.filter(e < 240).select(
        e.alias("call_id"), cls.alias("exc_class"),
        F.concat(F.lit("op-"), e % 5).alias("op_name"),
        F.when(e % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("boom-"), e)).alias("message"),
        (e % 3 != 0).alias("reraise"))


SYNTH_WRAP_CALLS_SQL = f"""
    SELECT event_id AS call_id, {_CLS_SQL} AS exc_class,
           'op-' || CAST(event_id % 5 AS VARCHAR) AS op_name,
           CASE WHEN event_id % 4 = 0 THEN ''
                ELSE 'boom-' || CAST(event_id AS VARCHAR) END AS message,
           event_id % 3 <> 0 AS reraise
    FROM events WHERE event_id < 240
"""

_STATUS_SQL = ("CASE exc_class "
               + " ".join(f"WHEN '{n}' THEN {c}"
                          for n, c in STATUS_CODES if c != 500)
               + " ELSE 500 END")

_PDF_IN = "(" + ", ".join(f"'{n}'" for n in PDF_FAMILY) + ")"

_ERROR_CODE_SQL = (
    "CASE WHEN exc_class = 'PDFProcessingError' THEN "
    "CASE WHEN error_code_param IS NOT NULL AND error_code_param <> '' "
    "THEN error_code_param ELSE 'PDF_PROCESSING_ERROR' END "
    + " ".join(f"WHEN exc_class = '{n}' THEN '{c}'"
               for n, c in ERROR_CODES.items())
    + " ELSE 'UNKNOWN_ERROR' END")

_MSG_SQL = ("CASE " + " ".join(
    f"WHEN exc_class = '{n}' AND message IS NULL THEN '{d}'"
    for n, d in DEFAULT_MESSAGES.items()) + " ELSE message END")


def build_error_responses_sql() -> str:
    ratio = ("file_size <> 0 AND max_size IS NOT NULL AND max_size <> 0")
    return f"""
        WITH errs AS ({SYNTH_ERRORS_SQL})
        SELECT event_id, exc_class,
               {_STATUS_SQL} AS status_code,
               {_ERROR_CODE_SQL} AS error_code,
               {_MSG_SQL} AS message_out,
               CASE exc_class
                 WHEN 'PDFValidationError' THEN
                   CASE WHEN vdetails_mode = 0 THEN 'file_path'
                        ELSE 'file_path,source' END
                 WHEN 'PDFExtractionError' THEN
                   CASE WHEN original_error IS NOT NULL
                        THEN 'extraction_type,page_number,' ||
                             'original_error,original_error_type'
                        ELSE 'extraction_type,page_number' END
                 WHEN 'PDFDownloadError' THEN 'url,status_code,timeout'
                 WHEN 'PDFSizeError' THEN
                   CASE WHEN {ratio}
                        THEN 'file_size_bytes,max_size_bytes,size_ratio'
                        ELSE 'file_size_bytes,max_size_bytes' END
                 WHEN 'PDFTimeoutError' THEN 'timeout_seconds,operation'
                 WHEN 'PDFConfigurationError' THEN 'config_key,config_value'
                 WHEN 'PDFStorageError' THEN 'operation,file_path'
                 WHEN 'PDFFormatError' THEN 'pdf_version,is_encrypted'
                 WHEN 'PDFProcessingError' THEN ''
                 ELSE 'exception_type' END AS detail_keys,
               CASE WHEN exc_class = 'PDFValidationError' THEN
                      CASE WHEN vdetails_mode = 2 THEN override_path
                           ELSE file_path END
                    WHEN exc_class = 'PDFStorageError' THEN file_path
               END AS d_file_path,
               CASE WHEN exc_class = 'PDFValidationError'
                     AND vdetails_mode <> 0 THEN vsource END AS d_source,
               CASE WHEN exc_class = 'PDFExtractionError'
                    THEN extraction_type END AS d_extraction_type,
               CASE WHEN exc_class = 'PDFExtractionError'
                    THEN page_number END AS d_page_number,
               CASE WHEN exc_class = 'PDFExtractionError'
                     AND original_error IS NOT NULL
                    THEN original_error END AS d_original_error,
               CASE WHEN exc_class = 'PDFExtractionError'
                     AND original_error IS NOT NULL
                    THEN orig_type END AS d_original_error_type,
               CASE WHEN exc_class = 'PDFDownloadError' THEN url END
                   AS d_url,
               CASE WHEN exc_class = 'PDFDownloadError' THEN dl_status END
                   AS d_status_code,
               CASE WHEN exc_class = 'PDFDownloadError'
                    THEN CAST(timeout_flag AS INT) END AS d_timeout,
               CASE WHEN exc_class = 'PDFSizeError' THEN file_size END
                   AS d_file_size,
               CASE WHEN exc_class = 'PDFSizeError' THEN max_size END
                   AS d_max_size,
               CASE WHEN exc_class = 'PDFSizeError' AND {ratio}
                    THEN CAST(file_size AS DOUBLE) / CAST(max_size AS DOUBLE)
               END AS d_size_ratio,
               CASE WHEN exc_class = 'PDFTimeoutError'
                    THEN timeout_seconds END AS d_timeout_seconds,
               CASE WHEN exc_class IN ('PDFTimeoutError', 'PDFStorageError')
                    THEN operation END AS d_operation,
               CASE WHEN exc_class = 'PDFConfigurationError'
                    THEN config_key END AS d_config_key,
               CASE WHEN exc_class = 'PDFConfigurationError'
                    THEN CAST(config_value AS VARCHAR) END AS d_config_value,
               CASE WHEN exc_class = 'PDFFormatError' THEN pdf_version END
                   AS d_pdf_version,
               CASE WHEN exc_class = 'PDFFormatError'
                    THEN CAST(is_encrypted AS INT) END AS d_is_encrypted,
               CASE WHEN exc_class NOT IN {_PDF_IN} THEN exc_class END
                   AS d_exception_type
        FROM errs
    """


def resolve_wraps_sql() -> str:
    return f"""
        WITH calls AS ({SYNTH_WRAP_CALLS_SQL})
        SELECT call_id,
               CASE WHEN NOT reraise THEN 'default_return'
                    WHEN exc_class IN {_PDF_IN} THEN 'reraise_custom'
                    ELSE 'wrap_extraction' END AS outcome,
               CASE WHEN NOT reraise THEN NULL
                    WHEN exc_class IN {_PDF_IN} THEN exc_class
                    ELSE 'PDFExtractionError' END AS raised_class,
               CASE WHEN NOT reraise THEN NULL
                    WHEN exc_class IN {_PDF_IN} THEN message
                    ELSE op_name || ' failed: ' || message END
                   AS raised_message,
               CASE WHEN reraise AND exc_class NOT IN {_PDF_IN}
                    THEN op_name END AS w_extraction_type,
               CASE WHEN reraise AND exc_class NOT IN {_PDF_IN}
                    THEN message END AS w_original_error,
               CASE WHEN reraise AND exc_class NOT IN {_PDF_IN}
                    THEN exc_class END AS w_original_error_type,
               CAST(CASE WHEN NOT reraise THEN NULL
                         WHEN exc_class IN {_PDF_IN} THEN {_STATUS_SQL}
                         ELSE 422 END AS INT) AS raised_status
        FROM calls
    """


def synth_raised(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 300).select(
        e.alias("raise_id"),
        F.when(e % 5 == 0, F.lit("material_kai"))
        .when(e % 5 <= 2, F.lit("http"))
        .otherwise(F.lit("general")).alias("exc_kind"),
        (380 + e % 200).cast("long").alias("http_status"),
        F.concat(F.lit("d-"), e).alias("detail"),
        (e % 2 == 0).alias("debug"))


SYNTH_RAISED_SQL = """
    SELECT event_id AS raise_id,
           CASE WHEN event_id % 5 = 0 THEN 'material_kai'
                WHEN event_id % 5 <= 2 THEN 'http'
                ELSE 'general' END AS exc_kind,
           CAST(380 + event_id % 200 AS BIGINT) AS http_status,
           'd-' || CAST(event_id AS VARCHAR) AS detail,
           event_id % 2 = 0 AS debug
    FROM events WHERE event_id < 300
"""


def handler_dispatch_sql() -> str:
    return f"""
        WITH raised AS ({SYNTH_RAISED_SQL})
        SELECT raise_id,
               CAST(CASE exc_kind WHEN 'material_kai' THEN 503
                    WHEN 'http' THEN http_status ELSE 500 END AS INT)
                   AS response_status,
               CASE exc_kind
                 WHEN 'material_kai'
                   THEN 'Material Kai Vision Platform is not available'
                 WHEN 'http' THEN 'HTTP_' || CAST(http_status AS VARCHAR)
                 ELSE 'INTERNAL_SERVER_ERROR' END AS error,
               CASE WHEN exc_kind = 'general' THEN
                      CASE WHEN debug
                           THEN 'Internal server error: ' || detail
                           ELSE 'Internal server error' END
                    ELSE detail END AS detail_out,
               CASE WHEN exc_kind = 'material_kai' THEN 'none'
                    WHEN exc_kind = 'general' THEN 'capture_exception'
                    WHEN http_status >= 500 THEN 'capture_exception'
                    WHEN http_status >= 400
                     AND http_status NOT IN (401, 403, 404)
                    THEN 'capture_message'
                    ELSE 'none' END AS sentry_action
        FROM raised
    """
