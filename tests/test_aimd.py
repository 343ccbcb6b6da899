"""Pins for the AIMD adaptive-concurrency fold
(operators/aimd.py vs adaptive_concurrency.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.aimd import fold_aimd


def _events(spark, kinds):
    return spark.createDataFrame(
        [Row(endpoint="e", event_ord=i, kind=k)
         for i, k in enumerate(kinds)],
        "endpoint string, event_ord long, kind string")


def _run(spark, kinds, **kw):
    return [tuple(r)[3:] for r in
            fold_aimd(_events(spark, kinds), **kw)
            .orderBy("event_ord").collect()]


def test_additive_increase_and_cap(spark):
    out = _run(spark, ["success"] * 12, initial=3, maximum=4,
               success_threshold=3)
    # grows at the 3rd success, caps at 4; at the cap the counter
    # keeps growing (reset only fires with the increase)
    assert out[2] == (4, 0, 0, True)
    assert out[5] == (4, 3, 0, False)   # would-grow but capped
    assert out[11] == (4, 9, 0, False)  # streak keeps counting


def test_multiplicative_decrease_and_floor(spark):
    out = _run(spark, ["failure"] * 6, initial=8, minimum=2)
    assert out[1] == (4, 0, 0, True)    # 8 // 2
    assert out[3] == (2, 0, 0, True)    # 4 // 2
    # at the floor the counter keeps growing, no change
    assert out[5] == (2, 0, 2, False)


def test_cross_reset_and_force_minimum(spark):
    out = _run(spark, ["failure", "success", "failure",
                       "force_minimum", "success", "failure"],
               initial=4, minimum=1)
    assert out[0] == (4, 0, 1, False)
    assert out[1] == (4, 1, 0, False)   # success zeroes failures
    assert out[2] == (4, 0, 1, False)   # and vice versa
    # force_minimum drops the limit, leaves the streaks alone
    assert out[3] == (1, 0, 1, True)
    assert out[4] == (1, 1, 0, False)
    assert out[5] == (1, 0, 1, False)


def test_constructor_contract(spark):
    with pytest.raises(ValueError):
        fold_aimd(_events(spark, ["success"]), initial=1, minimum=2)
