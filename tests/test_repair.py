"""Post-simplify intersection repair: simplification can make two arcs
cross that never crossed in the original; detect_crossings finds the
proper crossings (bucketed, declarative) and repair_crossings re-adds
vertices until the layer is crossing-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapshaper_spark.operators import simplify as S
from mapshaper_spark.operators import topology

# A: peak up at (5, 1.2)  — mid-vertex threshold (tri area) = 6
# B: peak up at (5, 0.8) from y=-1 — threshold = 9. They never cross.
# At level t=7: A collapses to its chord (0,0)-(10,0), B keeps its peak
# → B's rising edge crosses A's chord. Repair must re-add A's vertex.
ARCS = [
    {"arc_id": 0, "xs": [0.0, 5.0, 10.0], "ys": [0.0, 1.2, 0.0]},
    {"arc_id": 1, "xs": [0.0, 5.0, 10.0], "ys": [-1.0, 0.8, -1.0]},
]
T = 7.0


def _thr(spark):
    return S.compute_thresholds(topology.arcs_df(spark, ARCS), "visvalingam")


def test_simplification_introduces_crossing(spark):
    thr = _thr(spark)
    simp = S.apply_level(thr, T)
    kept = {r["arc_id"]: r["n_kept"] for r in simp.collect()}
    assert kept == {0: 2, 1: 3}  # A collapsed, B intact
    crossings = S.detect_crossings(simp).collect()
    assert len(crossings) == 2  # B's two slope segments cross A's chord


def test_original_layer_has_no_crossings(spark):
    thr = _thr(spark)
    full = S.apply_level(thr, 0.0)
    assert S.detect_crossings(full).count() == 0


def test_repair_restores_crossing_free_layer(spark):
    thr = _thr(spark)
    fixed = S.repair_crossings(thr, T)
    assert S.detect_crossings(fixed).count() == 0
    kept = {r["arc_id"]: r["n_kept"] for r in fixed.collect()}
    # A got its vertex back; B untouched
    assert kept == {0: 3, 1: 3}


def test_detect_is_exact_not_bucket_dependent(spark):
    thr = _thr(spark)
    simp = S.apply_level(thr, T)
    a = {tuple(r) for r in S.detect_crossings(simp, res=3).collect()}
    b = {tuple(r) for r in S.detect_crossings(simp, res=7).collect()}
    assert a == b and len(a) == 2


def test_repair_on_fixture_polylines_converges(spark):
    """The seeded polyline fixture at an aggressive level: repair ends
    crossing-free and never removes vertices relative to plain apply."""
    from mapshaper_spark import fixtures

    thr = S.compute_thresholds(
        topology.arcs_df(spark, fixtures.POLYLINES), "visvalingam"
    )
    t = fixtures.polyline_median_threshold("visvalingam") * 4.0
    fixed = S.repair_crossings(thr, t)
    assert S.detect_crossings(fixed).count() == 0
    plain = S.apply_level(thr, t).select("arc_id", F.col("n_kept").alias("n_plain"))
    joined = fixed.select("arc_id", "n_kept").join(plain, "arc_id")
    assert joined.filter(F.col("n_kept") < F.col("n_plain")).count() == 0
