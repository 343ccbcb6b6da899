"""Product-description-writer folds
(app/services/products/product_description_writer.py).

The Haiku call is out of scope; everything around it is deterministic
and folded here.  Pinned semantics (file:line):

* ``_clean_chunk_text`` (:66-77) — ORDERED regex passes: inline page
  separators ``---\\s*#\\s*Page\\s*\\d+\\s*---`` (case-insensitive),
  then bare ``Page\\s*\\d+``, then MULTILINE ``^\\d+\\s*[―—-]`` page
  numbers, then ``\\s{2,}`` collapse to ONE space (newlines included),
  then strip.  The collapse runs AFTER the multiline pass, so a page
  number only matches at original line starts (order pin).

* ``_is_likely_english`` (:80-104): the docstring says ">40% of the
  text's words" but the code returns ``ratio > 0.15`` — the comment
  lies by a factor of 2.7 (pin).  Words are ``[a-zA-Z]{2,}`` over the
  lowercased text; no words -> False.

* Chunk assembly (:137-166): cleaned chunks sort by
  ``(not is_english, len)`` — English first, then SHORTER FIRST
  within each language group (the len term is easy to miss — pin);
  Python's sort is stable so ties keep document order (canonicalized
  by position in both engines).  The 6000-char budget truncates the
  boundary chunk and stops; the later ``"\\n\\n".join`` separators are
  NOT counted against the cap, so the assembled text can exceed 6000
  (pin).

* Response shaping (:190-206): ordered charset strips
  ``.strip('"').strip("'").strip('`').strip()``; a leading \\`\\`\\`
  fence takes ``split('```', 2)[1]``; a lowercase "here is"/"here's"/
  "description:" prefix keeps everything after the FIRST ':' — with
  NO colon the split returns the whole text unchanged (pin);
  ``len < 20`` (strict) -> None; over 1500 -> truncate, rstrip, append
  '…'.

Regex notes: Python ``\\s`` is Unicode; Java (Spark) and RE2 (DuckDB)
are ASCII — synthesized text stays ASCII and the deviation is
documented (same convention as the operators/fencing fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MAX_INPUT_CHARS = 6000
MIN_RESULT_CHARS = 20
MAX_RESULT_CHARS = 1500

ENGLISH_WORDS = (
    'the', 'a', 'an', 'is', 'are', 'was', 'were', 'and', 'or', 'of',
    'to', 'in', 'for', 'with', 'that', 'this', 'from', 'by', 'on',
    'it', 'its', 'has', 'have', 'be', 'not', 'but', 'which', 'each',
    'can', 'new', 'our', 'any', 'all', 'will', 'at', 'as', 'their',
    'been', 'only', 'also', 'into', 'creating', 'collection',
    'design', 'tile',
)  # product_description_writer.py:86-93

ENGLISH_RATIO = 0.15   # :104 — the docstring claims 40% (pin)


def clean_chunk_text(col):
    """Column -> Column (:66-77)."""
    x = F.regexp_replace(col, r"(?i)---\s*#\s*Page\s*\d+\s*---", "")
    x = F.regexp_replace(x, r"(?i)Page\s*\d+", "")
    x = F.regexp_replace(x, r"(?m)^\d+\s*[―—-]", "")
    x = F.regexp_replace(x, r"\s{2,}", " ")
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def is_likely_english(col):
    """Column -> Column (:80-104)."""
    words = F.regexp_extract_all(F.lower(col),
                                 F.lit("[a-zA-Z]{2,}"), 0)
    eng = F.filter(words, lambda w: w.isin(*ENGLISH_WORDS))
    return F.when(F.size(words) > 0,
                  F.size(eng) / F.size(words) > ENGLISH_RATIO) \
        .otherwise(F.lit(False))


def clean_chunks(chunks: DataFrame) -> DataFrame:
    """Per-chunk clean + language flag (empty-after-clean dropped)."""
    out = chunks.select(
        "product_id", "chunk_ord",
        clean_chunk_text(F.coalesce(F.col("content"), F.lit("")))
        .alias("cleaned"))
    out = out.where(F.col("cleaned") != "")
    return out.withColumn("is_english", is_likely_english(
        F.col("cleaned")))


def assemble_chunks_text(chunks: DataFrame,
                         max_chars: int = MAX_INPUT_CHARS) -> DataFrame:
    """(:137-166) — one row per product: the capped prompt text."""
    c = clean_chunks(chunks)
    w = Window.partitionBy("product_id").orderBy(
        (~F.col("is_english")).cast("int").asc(),
        F.length("cleaned").asc(), F.col("chunk_ord").asc())
    ranked = c.withColumn("rk", F.row_number().over(w))
    emit = (ranked.withColumn(
        "cum_before",
        F.coalesce(F.sum(F.length("cleaned")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
        .where(F.col("cum_before") < max_chars)
        .withColumn("emit", F.expr(
            f"substring(cleaned, 1, {max_chars} - cum_before)")))
    agg = (emit.groupBy("product_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("rk"), F.col("emit")))),
                lambda s: s.getField("emit")),
            "\n\n").alias("chunks_text")))
    return agg


def shape_response(responses: DataFrame) -> DataFrame:
    """(:190-206) — raw Claude text -> description or NULL."""
    t = F.regexp_replace(F.coalesce(F.col("raw_text"), F.lit("")),
                         r"^\s+|\s+$", "")
    t = F.regexp_replace(t, '^"+|"+$', "")
    t = F.regexp_replace(t, "^'+|'+$", "")
    t = F.regexp_replace(t, "^`+|`+$", "")
    t = F.regexp_replace(t, r"^\s+|\s+$", "")
    # NOTE: after the backtick strip a ``` fence no longer starts the
    # string, so the reference's fence branch (:194-195) is DEAD CODE
    # — text.strip('`') removed the fence before the startswith('```')
    # check can see it (pin).
    low_prefix = (F.lower(t).startswith("here is")
                  | F.lower(t).startswith("here's")
                  | F.lower(t).startswith("description:"))
    after_colon = F.when(t.contains(":"),
                         F.regexp_replace(t, "^[^:]*:", "")) \
        .otherwise(t)
    t2 = F.when(low_prefix,
                F.regexp_replace(after_colon, r"^\s+|\s+$", "")) \
        .otherwise(t)
    final = (F.when(F.length(t2) < MIN_RESULT_CHARS,
                    F.lit(None).cast("string"))
             .when(F.length(t2) > MAX_RESULT_CHARS,
                   F.concat(F.regexp_replace(
                       F.substring(t2, 1, MAX_RESULT_CHARS),
                       r"\s+$", ""), F.lit("…")))
             .otherwise(t2))
    return responses.select("response_id", final.alias("description"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_desc_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    eng = F.concat(
        F.lit("The collection is a new design of the tile and it is "
              "made for all the interiors "), (e % 50).cast("string"))
    spa = F.concat(
        F.lit("La coleccion es un diseno nuevo para los interiores "
              "de la casa "), (e % 50).cast("string"))
    long_eng = F.concat(eng, F.lit(" "),
                        F.repeat(F.lit("and the design is new "),
                                 (e % 9 + 1).cast("int") * 20))
    content = (F.when(e % 7 == 0, F.lit(None).cast("string"))
               .when(e % 7 == 1, F.lit("--- # Page 4 ---"))
               .when(e % 7 == 2, F.concat(F.lit("12  — "), spa))
               .when(e % 7 == 3, long_eng)
               .when(e % 7 == 4, F.concat(
                   F.lit("See   page 12 and PAGE 9: "), eng))
               .when(e % 7 == 5, spa)
               .otherwise(eng))
    return (events.where(e % 3 == 0).select(
        F.concat(F.lit("prod"), (e % 30).cast("string"))
        .alias("product_id"),
        e.cast("long").alias("chunk_ord"),
        content.alias("content")))


SYNTH_DESC_CHUNKS_SQL = """
    SELECT 'prod' || CAST(event_id % 30 AS VARCHAR) AS product_id,
           CAST(event_id AS BIGINT) AS chunk_ord,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN '--- # Page 4 ---'
                WHEN event_id % 7 = 2 THEN '12  — '
                     || 'La coleccion es un diseno nuevo para los '
                     || 'interiores de la casa '
                     || CAST(event_id % 50 AS VARCHAR)
                WHEN event_id % 7 = 3 THEN
                     'The collection is a new design of the tile '
                     || 'and it is made for all the interiors '
                     || CAST(event_id % 50 AS VARCHAR) || ' '
                     || repeat('and the design is new ',
                               (event_id % 9 + 1) * 20)
                WHEN event_id % 7 = 4 THEN 'See   page 12 and PAGE 9: '
                     || 'The collection is a new design of the tile '
                     || 'and it is made for all the interiors '
                     || CAST(event_id % 50 AS VARCHAR)
                WHEN event_id % 7 = 5 THEN
                     'La coleccion es un diseno nuevo para los '
                     || 'interiores de la casa '
                     || CAST(event_id % 50 AS VARCHAR)
                ELSE 'The collection is a new design of the tile '
                     || 'and it is made for all the interiors '
                     || CAST(event_id % 50 AS VARCHAR)
           END AS content
    FROM events WHERE event_id % 3 = 0
"""

_ENG_LIST_SQL = ", ".join(f"'{w}'" for w in ENGLISH_WORDS)

_CLEAN_SQL = """
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(coalesce(content, ''),
        '(?i)---\\s*#\\s*Page\\s*\\d+\\s*---', '', 'g'),
        '(?i)Page\\s*\\d+', '', 'g'),
        '(?m)^\\d+\\s*[―—-]', '', 'g'),
        '\\s{2,}', ' ', 'g'),
        '^\\s+|\\s+$', '', 'g')
"""


def clean_chunks_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_DESC_CHUNKS_SQL}),
        k AS (SELECT product_id, chunk_ord, {_CLEAN_SQL} AS cleaned
              FROM c),
        f AS (SELECT * FROM k WHERE cleaned <> ''),
        lang AS (
          SELECT *, regexp_extract_all(lower(cleaned),
                     '[a-zA-Z]{{2,}}') AS words
          FROM f)
        SELECT product_id, chunk_ord, cleaned,
               CASE WHEN len(words) > 0 THEN
                 CAST(len(list_filter(words,
                      w -> w IN ({_ENG_LIST_SQL}))) AS DOUBLE)
                 / len(words) > {ENGLISH_RATIO}
               ELSE FALSE END AS is_english
        FROM lang
    """


def assemble_sql(max_chars: int = MAX_INPUT_CHARS) -> str:
    return f"""
        WITH lang AS ({clean_chunks_sql()}),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY product_id
                 ORDER BY CASE WHEN is_english THEN 0 ELSE 1 END,
                          length(cleaned), chunk_ord) AS rk
          FROM lang),
        cum AS (
          SELECT *, coalesce(sum(length(cleaned)) OVER (
                 PARTITION BY product_id ORDER BY rk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum_before
          FROM ranked)
        SELECT product_id,
               string_agg(substring(cleaned, 1,
                          CAST({max_chars} - cum_before AS BIGINT)),
                          chr(10) || chr(10) ORDER BY rk)
                   AS chunks_text
        FROM cum WHERE cum_before < {max_chars}
        GROUP BY product_id
    """


def synth_responses(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    body = F.concat(
        F.lit("A porcelain collection with warm tones and a matte "
              "finish "), (e % 40).cast("string"))
    raw = (F.when(e % 11 == 0, F.lit(None).cast("string"))
           .when(e % 11 == 1, F.lit("  short  "))
           .when(e % 11 == 2, F.concat(F.lit('"'), body, F.lit('"')))
           .when(e % 11 == 3, F.concat(F.lit("Here is the "
                                             "description: "), body))
           .when(e % 11 == 4, F.concat(F.lit("here's what I wrote "),
                                       body))
           .when(e % 11 == 5, F.concat(F.lit("```"), body,
                                       F.lit("```")))
           .when(e % 11 == 6, F.concat(F.lit("Description: "), body))
           .when(e % 11 == 7, F.concat(
               body, F.lit(" "),
               F.repeat(F.lit("with a very long tail of words "),
                        60)))
           .otherwise(body))
    return events.select(e.cast("long").alias("response_id"),
                         raw.alias("raw_text"))


SYNTH_RESPONSES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS response_id,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 11 = 1 THEN '  short  '
                WHEN event_id % 11 = 2 THEN '"'
                     || 'A porcelain collection with warm tones and '
                     || 'a matte finish '
                     || CAST(event_id % 40 AS VARCHAR) || '"'
                WHEN event_id % 11 = 3 THEN 'Here is the description: '
                     || 'A porcelain collection with warm tones and '
                     || 'a matte finish '
                     || CAST(event_id % 40 AS VARCHAR)
                WHEN event_id % 11 = 4 THEN 'here''s what I wrote '
                     || 'A porcelain collection with warm tones and '
                     || 'a matte finish '
                     || CAST(event_id % 40 AS VARCHAR)
                WHEN event_id % 11 = 5 THEN '```'
                     || 'A porcelain collection with warm tones and '
                     || 'a matte finish '
                     || CAST(event_id % 40 AS VARCHAR) || '```'
                WHEN event_id % 11 = 6 THEN 'Description: '
                     || 'A porcelain collection with warm tones and '
                     || 'a matte finish '
                     || CAST(event_id % 40 AS VARCHAR)
                WHEN event_id % 11 = 7 THEN
                     'A porcelain collection with warm tones and a '
                     || 'matte finish '
                     || CAST(event_id % 40 AS VARCHAR) || ' '
                     || repeat('with a very long tail of words ', 60)
                ELSE 'A porcelain collection with warm tones and a '
                     || 'matte finish '
                     || CAST(event_id % 40 AS VARCHAR)
           END AS raw_text
    FROM events
"""


def shape_response_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RESPONSES_SQL}),
        s1 AS (
          SELECT response_id,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(
                     coalesce(raw_text, ''),
                     '^\\s+|\\s+$', '', 'g'),
                     '^"+|"+$', '', 'g'),
                     '^''+|''+$', '', 'g'),
                     '^`+|`+$', '', 'g'),
                     '^\\s+|\\s+$', '', 'g') AS t
          FROM r),
        s2 AS (
          SELECT response_id,
                 CASE WHEN (lower(t) LIKE 'here is%'
                            OR lower(t) LIKE 'here''s%'
                            OR lower(t) LIKE 'description:%')
                      THEN regexp_replace(
                             CASE WHEN strpos(t, ':') > 0
                                  THEN regexp_replace(t, '^[^:]*:',
                                                      '')
                                  ELSE t END,
                             '^\\s+|\\s+$', '', 'g')
                      ELSE t END AS t
          FROM s1)
        SELECT response_id,
               CASE WHEN length(t) < {MIN_RESULT_CHARS} THEN NULL
                    WHEN length(t) > {MAX_RESULT_CHARS} THEN
                      regexp_replace(substring(t, 1,
                          {MAX_RESULT_CHARS}), '\\s+$', '')
                      || '…'
                    ELSE t END AS description
        FROM s2
    """
