"""Keyword-expansion curation — the deterministic post-processing the
reference applies to the LLM's expansion output
(app/services/integrations/job_keyword_expansion_service.py:178-209).

The LLM call itself is network (out of scope); everything after the
tool-use block is pinned here:

- buckets processed in the fixed order title_variants →
  seniority_variants → abbreviations, each in list order (:182-191);
- each term is strip().lower(); empties and already-seen terms drop;
- any term CONTAINING any lowercased excluded term drops (substring,
  not equality) (:180, :186-188);
- the merged list caps at 18 (:203);
- rejected_terms are strip()ed only (case preserved) (:193);
- query_phrasings keep their original case, dedupe on the lowercase
  form in order, cap 5 (:195-201).

Scale: per-request state machines over small arrays → one groupBy with
an aggregate fold per request; the exclusion check rides inside the
fold via `exists`. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET_ORDER = ("title_variants", "seniority_variants",
                "abbreviations")
EXPANDED_CAP = 18
PHRASINGS_CAP = 5


def curate_expansions(raw: DataFrame) -> DataFrame:
    """``raw``: one row per request:
    (req_id, title_variants array<string>, seniority_variants
    array<string>, abbreviations array<string>, rejected_terms
    array<string>, query_phrasings array<string>, excluded_keywords
    array<string>); any array may be NULL.

    Output: (req_id, expanded array<string>, rejected array<string>,
    query_phrasings array<string>)."""
    empty = F.array().cast("array<string>")

    def arr(c):
        return F.coalesce(F.col(c), empty)

    excluded = F.filter(
        F.transform(arr("excluded_keywords"),
                    lambda e: F.lower(F.coalesce(e, F.lit("")))),
        lambda e: e != "")
    merged = F.concat(*[arr(b) for b in BUCKET_ORDER])
    expanded = F.aggregate(
        merged, empty,
        lambda acc, term: F.when(
            (F.trim(F.lower(F.coalesce(term, F.lit("")))) == "")
            | F.array_contains(
                acc, F.trim(F.lower(F.coalesce(term, F.lit("")))))
            | F.exists(excluded, lambda ex: F.trim(
                F.lower(F.coalesce(term, F.lit("")))).contains(ex)),
            acc,
        ).otherwise(F.concat(acc, F.array(
            F.trim(F.lower(term))))))
    rejected = F.filter(
        F.transform(arr("rejected_terms"),
                    lambda r: F.trim(F.coalesce(r, F.lit("")))),
        lambda r: r != "")
    # phrasings: dedupe on lower(trim), keep original (trimmed) case
    phr = F.aggregate(
        arr("query_phrasings"), empty,
        lambda acc, p: F.when(
            (F.trim(F.coalesce(p, F.lit(""))) == "")
            | F.exists(acc, lambda a: F.lower(a)
                       == F.lower(F.trim(p))),
            acc,
        ).otherwise(F.concat(acc, F.array(F.trim(p)))))
    return raw.select(
        "req_id",
        F.slice(expanded, 1, EXPANDED_CAP).alias("expanded"),
        rejected.alias("rejected"),
        F.slice(phr, 1, PHRASINGS_CAP).alias("query_phrasings"))
