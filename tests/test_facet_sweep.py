"""Pins for the facet re-canonicalization sweep planner
(operators/facet_sweep.py) against transcriptions of
facet_recanonicalization.py:74-216."""

from mivaa_pdf_extractor_spark.operators import facet_sweep as fs


def _products(spark, rows):
    return spark.createDataFrame(
        rows, "product_id long, version int, degraded boolean, "
              "has_raw boolean, outcome string")


def test_degraded_pass_exhausts_shared_cap(spark):
    # 3 degraded + 2 stale eligible, cap 3: the degraded pass takes the
    # whole budget and the stale pass selects nothing (:130 processed_ids
    # + shared max_products).
    rows = [(1, 0, True, True, "ok"), (2, 0, True, True, "ok"),
            (3, 0, True, True, "ok"), (4, 0, False, True, "ok"),
            (5, 0, False, True, "ok")]
    out = fs.plan_sweep(_products(spark, rows), 2, 3).collect()
    assert sorted(r.product_id for r in out) == [1, 2, 3]
    assert all(r.sweep_pass == "degraded" for r in out)


def test_stale_pass_fills_remainder_in_id_order(spark):
    # cap 4, 2 degraded -> stale pass gets 2 slots, lowest ids first,
    # ranks continue after the degraded pass.
    rows = [(10, 0, True, True, "ok"), (11, 1, True, True, "ok"),
            (12, 0, False, True, "ok"), (13, 0, False, True, "ok"),
            (14, 0, False, True, "ok")]
    out = {r.product_id: r for r in
           fs.plan_sweep(_products(spark, rows), 2, 4).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert [out[i].sweep_rank for i in (10, 11, 12, 13)] == [1, 2, 3, 4]
    assert out[12].sweep_pass == "stale"


def test_outcome_ladder_and_version_bumps(spark):
    # no-raw beats everything (even a degraded row exits the sweep with
    # its version bumped, :151-160); raise keeps version; degraded_result
    # keeps version + marker; ok bumps + clears marker.
    rows = [(1, 0, True, False, "ok"),        # skipped_no_raw, bumped
            (2, 0, False, True, "raise"),     # failed, kept
            (3, 1, False, True, "degraded_result"),  # degraded, kept
            (4, 0, False, True, "ok")]        # updated, bumped
    out = {r.product_id: r for r in
           fs.plan_sweep(_products(spark, rows), 2, 10).collect()}
    assert out[1].outcome == "skipped_no_raw" and out[1].new_version == 2
    assert not out[1].marker_cleared
    assert out[2].outcome == "failed" and out[2].new_version == 0
    assert out[3].outcome == "degraded" and out[3].new_version == 1
    assert out[4].outcome == "updated" and out[4].new_version == 2
    assert out[4].marker_cleared


def test_ineligible_rows_never_selected(spark):
    # version >= target is out of scope even when degraded.
    rows = [(1, 2, True, True, "ok"), (2, 3, False, True, "ok"),
            (3, 1, False, True, "ok")]
    out = fs.plan_sweep(_products(spark, rows), 2, 10).collect()
    assert [r.product_id for r in out] == [3]


def test_summary_remaining_counts_unbumped(spark):
    # remaining = eligible_before - bumped (:210-216): failed and
    # degraded rows stay eligible, as do rows beyond the cap.
    rows = [(1, 0, False, True, "ok"),               # bumped
            (2, 0, False, True, "raise"),            # kept
            (3, 0, False, True, "degraded_result"),  # kept
            (4, 0, False, False, "ok"),              # skipped, bumped
            (5, 0, False, True, "ok"),               # beyond cap
            (6, 2, False, True, "ok")]               # ineligible
    row = fs.sweep_summary(_products(spark, rows), 2, 4).collect()[0]
    assert row.scanned == 4 and row.updated == 1
    assert row.failed == 1 and row.degraded == 1
    assert row.skipped_no_raw == 1
    assert row.remaining == 5 - 2


def test_degraded_only_mode(spark):
    rows = [(1, 0, True, True, "ok"), (2, 0, False, True, "ok")]
    out = fs.plan_sweep(_products(spark, rows), 2, 10,
                        degraded_only=True).collect()
    assert [r.product_id for r in out] == [1]
