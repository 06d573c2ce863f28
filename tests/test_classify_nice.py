"""'nice' classify breaks: properties that pin the convenience surface
without a hash oracle (the log10 snap isn't ULP-portable to DuckDB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapshaper_spark.functions import classify as C
from mapshaper_spark.sources import testdata

from .conftest import SF_SMOKE


@pytest.mark.parametrize(
    "raw,expect",
    [
        (0.13, 0.2),
        (0.2, 0.2),
        (0.21, 0.25),
        (0.3, 0.5),
        (0.7, 1.0),
        (1.0, 1.0),
        (3.0, 5.0),
        (70.0, 100.0),
        (2199.998, 2500.0),
    ],
)
def test_nice_step_goldens(raw, expect):
    assert C.nice_step(raw) == pytest.approx(expect, rel=1e-9)


def test_nice_breaks_cover_and_are_round():
    brks = C.nice_breaks(-999.99, 9999.99, 5)
    assert brks, "nonempty"
    step = C.nice_step((9999.99 - (-999.99)) / 5)
    for b in brks:
        assert -999.99 < b < 9999.99
        # every break is an exact multiple of the nice step
        assert abs(b / step - round(b / step)) < 1e-9
    assert brks == sorted(brks)
    assert len(brks) <= 4


def test_classify_nice_partitions_all_rows(spark):
    c = testdata.load(spark, SF_SMOKE, "customer")
    lo, hi = c.agg(F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    brks = C.nice_breaks(float(lo), float(hi), 5)
    out = (
        c.select(C.classify_by_breaks(F.col("c_acctbal"), brks).alias("cls"))
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in out) == c.count()
    assert {r["cls"] for r in out} <= set(range(len(brks) + 1))
    # classification agrees with a direct python binning on a sample
    import bisect

    sample = c.limit(50).collect()
    # engine rule (value < break, strict) == bisect_right semantics
    w = {r["c_custkey"]: bisect.bisect_right(brks, r["c_acctbal"]) for r in sample}
    got = {
        r["c_custkey"]: r["cls"]
        for r in c.limit(50)
        .select("c_custkey", C.classify_by_breaks(F.col("c_acctbal"), brks).alias("cls"))
        .collect()
    }
    assert got == w
