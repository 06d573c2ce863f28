"""As-of join: the general cogrouped merge_asof operator and the
JVM-only window plan must produce identical results (the window plan is
the hot path used by the oracle query; the cogroup plan is the general
operator for right sides that aren't unique per (by, on))."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapshaper_spark.operators import asof as asof_op
from mapshaper_spark.sources import testdata

SF_DIR = "/root/testdata/sf0.001"


def _click_purchase(spark):
    e = testdata.load(spark, SF_DIR, "events")
    left = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("val_r"))
    )
    return left, right


def test_window_plan_matches_cogroup_plan(spark):
    left, right = _click_purchase(spark)
    kw = dict(on="ts", by="user_id", right_cols=["val_r"])
    a = asof_op.asof_join(left, right, **kw).toPandas()
    b = asof_op.asof_join_window(left, right, **kw).toPandas()
    key = ["event_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    for c in a.columns:
        sa, sb = a[c], b[c]
        assert (sa.isna() == sb.isna()).all(), c
        m = ~sa.isna()
        assert (sa[m] == sb[m]).all(), c


def test_window_plan_unmatched_lefts_null(spark):
    left, right = _click_purchase(spark)
    out = asof_op.asof_join_window(left, right, on="ts", by="user_id", right_cols=["val_r"])
    # every matched row's ts_r is <= ts (backward direction)
    bad = out.filter(F.col("ts_r").isNotNull() & (F.col("ts_r") > F.col("ts"))).count()
    assert bad == 0
    # users with no purchase at all must surface with null fills, not drop
    purchasers = {r[0] for r in right.select("user_id").distinct().collect()}
    no_purchase = out.filter(~F.col("user_id").isin(list(purchasers)))
    assert no_purchase.filter(F.col("ts_r").isNotNull() | F.col("val_r").isNotNull()).count() == 0
