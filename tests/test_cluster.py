"""-cluster k-means: assignment/update invariants and blob recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapshaper_spark.operators import cluster


def _blob_pts(spark):
    # 3 well-separated integer blobs of 5 points each; ids interleaved
    # so the smallest-id init seeds land in distinct blobs.
    rows = []
    blobs = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
    for j in range(5):
        for b, (bx, by) in enumerate(blobs):
            rows.append((j * 3 + b, bx + float(j), by + float(j % 2)))
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def test_kmeans_recovers_separated_blobs(spark):
    pts = _blob_pts(spark)
    stats = cluster.cluster_stats(pts, k=3, rounds=3).orderBy("cid").collect()
    assert [r["n_points"] for r in stats] == [5, 5, 5]
    # each recovered centroid sits inside its blob (blob spread is 4,
    # blob separation is 100)
    cents = sorted((r["cx"], r["cy"]) for r in stats)
    assert [(round(cx, 6), round(cy, 6)) for cx, cy in cents] == [
        (0.0 + 2.0, 0.4),
        (0.0 + 2.0, 100.4),
        (100.0 + 2.0, 0.4),
    ]


def test_assignment_is_nearest_centroid_with_min_cid_ties(spark):
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 10.0, 0.0), (2, 5.0, 0.0)],
        "point_id long, lon double, lat double",
    )
    # point 2 is exactly equidistant to both centroids -> smaller cid
    a = cluster.assign(pts, [(0, 0.0, 0.0), (1, 10.0, 0.0)]).collect()
    got = {r["point_id"]: r["cid"] for r in a}
    assert got == {0: 0, 1: 1, 2: 0}


def test_final_assignment_is_fixed_point_of_returned_centroids(spark):
    """The returned stats ARE the centroids of their own members: one
    more update pass from the final assignment reproduces (cx, cy)."""
    pts = _blob_pts(spark)
    stats = cluster.cluster_stats(pts, k=3, rounds=2)
    cents = sorted(
        (int(r["cid"]), float(r["cx"]), float(r["cy"])) for r in stats.collect()
    )
    again = (
        cluster.assign(pts, cents)
        .groupBy("cid")
        .agg(cluster._dec_mean("lon").alias("cx"), cluster._dec_mean("lat").alias("cy"))
        .collect()
    )
    got = sorted((int(r["cid"]), float(r["cx"]), float(r["cy"])) for r in again)
    assert got == cents


def test_kmeans_scales_mapside(spark):
    """The assignment plan is join-free: no Exchange below the final
    k-group aggregate other than the aggregate's own partial/final
    pair (the point table is never joined or re-shuffled)."""
    pts = _blob_pts(spark)
    stats = cluster.cluster_stats(pts, k=3, rounds=2)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
