"""Splitter math — mirrors TestIntegerSplitter.java:82-163 exactly —
plus Spark-side split assignment and hot-key salting."""

import datetime as dt

from pyspark.sql import functions as F

from sqoop_spark.partitioning import (
    assign_range_split,
    boolean_split_predicates,
    date_split_points,
    detect_hot_keys,
    float_split_points,
    integer_split_points,
    integer_split_predicates,
    repartition_by_split,
    repartition_salted,
    text_split_points,
)


# -- exact reference vectors (TestIntegerSplitter.java) -----------------------

def test_even_splits():
    assert integer_split_points(0, 100, 10) == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_odd_splits():
    assert integer_split_points(0, 95, 10) == [0, 10, 20, 30, 40, 50, 59, 68, 77, 86, 95]


def test_singleton_split():
    assert integer_split_points(5, 5, 1) == [5, 5]


def test_singleton_split_overly_high_numsplits():
    assert integer_split_points(5, 5, 5) == [5, 5]


def test_too_many_splits():
    assert integer_split_points(3, 5, 5) == [3, 4, 5, 5]


def test_exact_splits_as_interval():
    assert integer_split_points(1, 5, 5) == [1, 2, 3, 4, 5, 5]


def test_bigint_splits_no_overflow():
    assert len(integer_split_points(14, 7863696997872966707, 4)) == 5


def test_even_splits_with_limit():
    assert integer_split_points(0, 100, 5, 10) == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_odd_splits_with_limit():
    assert integer_split_points(0, 95, 5, 10) == [0, 10, 20, 30, 40, 50, 59, 68, 77, 86, 95]


def test_split_with_bigger_limit():
    assert integer_split_points(0, 100, 10, 15) == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_fractional_split_with_limit():
    assert integer_split_points(1, 10, 5, 1) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]


# -- other splitters -----------------------------------------------------------

def test_predicates_last_interval_closed():
    preds = integer_split_predicates("c", 0, 100, 4)
    assert preds[0] == "c >= 0 AND c < 25"
    assert preds[-1] == "c >= 75 AND c <= 100"


def test_date_split_points_are_integer_splits_on_micros():
    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    pts = date_split_points(lo, hi, 4)
    assert pts[0] == lo and pts[-1] == hi and len(pts) == 5
    deltas = {(pts[i + 1] - pts[i]) for i in range(4)}
    assert len(deltas) == 1  # even day splits


def test_float_split_points():
    assert float_split_points(0.0, 1.0, 4) == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_boolean_split_predicates():
    assert boolean_split_predicates("b") == ["b = FALSE", "b = TRUE", "b IS NULL"]


def test_text_split_points_monotonic_with_common_prefix():
    pts = text_split_points("org0/aaa", "org0/zzz", 4)
    assert pts[0] == "org0/aaa" and pts[-1] == "org0/zzz"
    assert all(pts[i] <= pts[i + 1] for i in range(len(pts) - 1))
    assert all(p.startswith("org0/") for p in pts)


# -- Spark-side -------------------------------------------------------------------

def test_assign_range_split_matches_interval_semantics(spark):
    df = spark.range(0, 101).withColumnRenamed("id", "c")
    pts = integer_split_points(0, 100, 4)
    out = assign_range_split(df, "c", pts)
    counts = {r.split_id: r["count"] for r in out.groupBy("split_id").count().collect()}
    # [0,25) [25,50) [50,75) [75,100] per the closed-last-interval contract
    assert counts == {0: 25, 1: 25, 2: 25, 3: 26}


def test_repartition_by_split_balances(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "c")
    out = repartition_by_split(df, "c", 8)
    sizes = out.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert sum(r["count"] for r in sizes) == 1000
    assert max(r["count"] for r in sizes) <= 130  # ~125 each, balanced


def test_detect_hot_keys_and_salting(spark):
    # one hot key with 900 rows, 100 cold keys with 1 row each
    hot = [("hot", "p", i) for i in range(900)]
    cold = [(f"k{i}", "p", 1000 + i) for i in range(100)]
    df = spark.createDataFrame(hot + cold, ["repo", "path", "event_seq"])
    hk = detect_hot_keys(df, ["repo", "path"], rows_per_partition=100).collect()
    assert len(hk) == 1 and hk[0].repo == "hot" and hk[0].n_salts == 9

    salted = repartition_salted(df, ["repo", "path"], "event_seq", 16, n_salts=8)
    per_part = (
        salted.filter(F.col("repo") == "hot")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    # the hot key's 900 rows spread over >1 partition (vs 1 without salt)
    assert len(per_part) > 1
    assert max(r["count"] for r in per_part) < 900
    # salting is placement-only: rows unchanged
    assert salted.count() == 1000
    assert "_salt" not in salted.columns


def test_decimal_split_points():
    from decimal import Decimal

    from sqoop_spark.partitioning import decimal_split_points

    pts = decimal_split_points("0", "10", 4)
    assert pts[0] == Decimal(0) and pts[-1] == Decimal(10)
    assert len(pts) == 5
    assert all(pts[i] < pts[i + 1] for i in range(len(pts) - 1))
    # fractional interval
    pts = decimal_split_points("1.5", "2.0", 5)
    assert pts[0] == Decimal("1.5") and pts[-1] == Decimal("2.0")
    # degenerate near-zero span still terminates with the min-increment floor
    pts = decimal_split_points("1.0000000000", "1.0000000002", 4)
    assert pts[-1] == Decimal("1.0000000002") and len(pts) >= 2


def test_freeform_autoreset_to_one_mapper(spark):
    from sqoop_spark.sources import freeform_query

    spark.range(10).createOrReplaceTempView("ar_t")
    out = freeform_query(
        spark,
        "SELECT id FROM ar_t WHERE $CONDITIONS",
        num_mappers=4,
        autoreset_to_one_mapper=True,
    )
    assert out.count() == 10


def test_decimal_split_points_bounds():
    """Min-increment floor must not overshoot num_splits+1 boundaries, and a
    zero-width range still yields one closed split (ADVICE r1)."""
    from decimal import Decimal

    from sqoop_spark.partitioning import decimal_split_points

    # tiny span engages the 1e-9 floor: boundary count stays ≤ num_splits+1
    pts = decimal_split_points("1.000000000", "1.000000005", 4)
    assert len(pts) <= 5
    assert pts[0] == Decimal("1.000000000") and pts[-1] == Decimal("1.000000005")
    # zero-width range: one closed split, like IntegerSplitter's hi-dup branch
    assert decimal_split_points("2", "2", 4) == [Decimal(2), Decimal(2)]


def test_date_split_limit_seconds():
    """DateSplitter --split-limit is in seconds (DateSplitter.java:84-120):
    a 100-second range with a 10-second limit re-derives to 10 splits."""
    import datetime as dt

    from sqoop_spark.partitioning import date_split_points

    lo = dt.datetime(2024, 1, 1, 0, 0, 0)
    hi = lo + dt.timedelta(seconds=100)
    pts = date_split_points(lo, hi, 2, split_limit=10)
    assert len(pts) == 11  # 10 splits of <= 10s each
    widths = [(pts[i + 1] - pts[i]).total_seconds() for i in range(len(pts) - 1)]
    assert max(widths) <= 10
    assert pts[0] == lo and pts[-1] == hi
    # no limit: unchanged behavior
    assert len(date_split_points(lo, hi, 2)) == 3
