"""``-cluster``: k-means feature clustering.

[UPSTREAM ``src/commands/mapshaper-cluster.mjs`` — public knowledge of
mbloch/mapshaper; /root/reference is empty, SURVEY.md §0]: upstream
groups features into compact clusters by running k-means over feature
centroids and writing a ``cluster`` id field.

Engine shape (the MLlib-k-means shape, re-expressed over this repo's
portability rules): centroids are k rows of DIM-BOUND metadata, so they
live on the driver between rounds — each Lloyd round is

  1. one MAP: assignment as a pure-codegen CASE over k literal
     centroids (squared euclidean — no sqrt, no UDF, no join, no
     shuffle of the point table), and
  2. one k-group aggregate: the centroid update routed through the
     exact DECIMAL(18,4) sum (the fixture coordinates carry <= 3
     decimal digits, so the decimal sum is exact and ORDER-INDEPENDENT
     — the only way a float mean can hash-match an oracle that sums in
     a different order [queries.py header rules]).

Ties (a point equidistant to two centroids) break to the SMALLEST
cluster id on both sides: the Spark CASE tests centroids in cid order,
the oracle takes ``min(cid) WHERE d = min(d) OVER point``.

At 100-TB scale this is exactly the classic distributed k-means: the
point table is touched ``rounds`` times map-side, the only shuffle is
the k-group partial-aggregated centroid update, and the collected
state is k (cid, cx, cy) triples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Centroid = tuple[int, float, float]


def _sqdist(x: Column, y: Column, cx: float, cy: float) -> Column:
    # (x-cx)*(x-cx) + (y-cy)*(y-cy), operand order pinned to match the
    # oracle's expression tree bit-for-bit (IEEE ops on identical
    # doubles — the centroid literals round-trip exactly through
    # collect() -> Python float -> F.lit).
    dx = x - F.lit(float(cx))
    dy = y - F.lit(float(cy))
    return dx * dx + dy * dy


def assign(
    pts: DataFrame, cents: list[Centroid], x: str = "lon", y: str = "lat"
) -> DataFrame:
    """Attach ``cid`` = argmin squared distance (min-cid tie-break)."""
    cents = sorted(cents)
    ds = [_sqdist(F.col(x), F.col(y), cx, cy) for _, cx, cy in cents]
    dmin = ds[0] if len(ds) == 1 else F.least(*ds)
    expr = None
    for (c, _, _), d in zip(cents, ds):
        cond = d == dmin
        expr = F.when(cond, F.lit(c)) if expr is None else expr.when(cond, F.lit(c))
    return pts.withColumn("cid", expr)


def _dec_mean(col: str) -> Column:
    s = F.sum(F.col(col).cast("decimal(18,4)")).cast("double")
    return s / F.count(F.lit(1)).cast("double")


def cluster_stats(
    pts: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "point_id",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """k-means cluster summary after ``rounds`` assignment passes.

    Init = the k smallest-id points (deterministic, re-derivable in
    ANSI SQL as ``ROW_NUMBER() OVER (ORDER BY id) - 1`` over ``LIMIT
    k``). Returns one row per non-empty cluster of the FINAL
    assignment: (cid, n_points, cx, cy) with decimal-routed means.
    """
    init = pts.orderBy(id_col).limit(k).select(id_col, x, y).collect()
    cents: list[Centroid] = [
        (i, float(r[1]), float(r[2])) for i, r in enumerate(init)
    ]
    for _ in range(rounds - 1):
        a = assign(pts, cents, x=x, y=y)
        upd = (
            a.groupBy("cid")
            .agg(_dec_mean(x).alias("cx"), _dec_mean(y).alias("cy"))
            .collect()
        )
        cents = sorted((int(r["cid"]), float(r["cx"]), float(r["cy"])) for r in upd)
    return (
        assign(pts, cents, x=x, y=y)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_mean(x).alias("cx"),
            _dec_mean(y).alias("cy"),
        )
    )
