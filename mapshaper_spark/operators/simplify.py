"""-simplify: Visvalingam / Douglas-Peucker over the shared-arc dictionary.

mapshaper's signature design [SURVEY.md §2.7]: simplification is computed
ONCE as a per-vertex removal-threshold array (``thr``); applying any
simplification level afterwards is a cheap filter ``thr >= t`` — ideal
for per-zoom tile generation where each zoom wants a different level but
nobody wants to re-run the kernel.

Distributed shape:

- kernel stage: ``mapInPandas`` over the deduped arc table — each arc is
  simplified exactly once regardless of how many features share it, so
  neighboring polygons never develop gaps (the topology guarantee);
- threshold selection for ``pct``: ``percentile_approx`` over the
  exploded finite thresholds (one global agg);
- application: array-level filter (``zip arrays → keep thr >= t``) —
  pure column expressions, no second kernel pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geometry

METHODS = {
    "visvalingam": geometry.visvalingam_thresholds,
    "weighted": geometry.visvalingam_weighted_thresholds,
    "visvalingam_lonlat": geometry.visvalingam_thresholds_lonlat,
    "dp": geometry.dp_thresholds,
}


def compute_thresholds(arcs: DataFrame, method: str = "visvalingam") -> DataFrame:
    """arcs(arc_id, xs, ys, ...) → + thr array<double> (inf → null-free
    sentinel 1e308 so Parquet/Arrow round-trips are exact)."""
    kern = METHODS[method]

    def run(it):
        for pdf in it:
            thr = [
                np.minimum(kern(np.asarray(xs), np.asarray(ys)), 1e308).tolist()
                for xs, ys in zip(pdf["xs"], pdf["ys"])
            ]
            yield pdf.assign(thr=pd.Series(thr, index=pdf.index))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in arcs.schema.fields
    ) + ", thr array<double>"
    return arcs.mapInPandas(run, schema=out_schema)


def _segments_df(simplified: DataFrame, res: int = 5) -> DataFrame:
    """Explode simplified arcs (xs_s, ys_s) into per-segment rows with
    the covering cell set of each segment's bbox — all array
    expressions, JVM-side. Cells come from a coarse grid so the
    crossing check is a bucketed self-join, never all-pairs."""
    from .. import cells

    n = 1 << res
    seg = F.expr(
        "transform(sequence(0, size(xs_s) - 2), i -> struct("
        " xs_s[i] AS x1, ys_s[i] AS y1, xs_s[i + 1] AS x2, ys_s[i + 1] AS y2,"
        " i AS seg_idx))"
    )
    segs = simplified.select("arc_id", F.explode(seg).alias("s")).select(
        "arc_id", "s.seg_idx", "s.x1", "s.y1", "s.x2", "s.y2"
    )
    ix, iy = cells.grid_xy_sql("least(x1, x2)", "least(y1, y2)", res)
    jx, jy = cells.grid_xy_sql("greatest(x1, x2)", "greatest(y1, y2)", res)
    covers = (
        f"flatten(transform(sequence({ix}, {jx}), cx ->"
        f" transform(sequence({iy}, {jy}), cy -> cx * {n} + cy)))"
    )
    return segs.withColumn("bucket", F.explode(F.expr(covers)))


def detect_crossings(simplified: DataFrame, res: int = 5) -> DataFrame:
    """Proper segment crossings introduced by simplification [upstream
    post-simplify repair pass, SURVEY.md §2.7]: bucketed segment
    self-join + the classic double-straddle orientation test — pure
    column math, so the DuckDB oracle runs the identical expressions.

    Adjacent segments of one arc share an endpoint (never a PROPER
    crossing) and are excluded. Output: one row per crossing pair."""
    a = _segments_df(simplified, res)
    b = (
        a.select(
            F.col("arc_id").alias("arc_b"),
            F.col("seg_idx").alias("seg_b"),
            F.col("x1").alias("bx1"),
            F.col("y1").alias("by1"),
            F.col("x2").alias("bx2"),
            F.col("y2").alias("by2"),
            "bucket",
        )
    )
    pair_order = (F.col("arc_id") < F.col("arc_b")) | (
        (F.col("arc_id") == F.col("arc_b")) & (F.col("seg_idx") < F.col("seg_b") - 1)
    )
    d = F.expr
    ccw = (
        "(({x2} - {x1}) * ({py} - {y1}) - ({y2} - {y1}) * ({px} - {x1}))"
    )

    def _ccw(x1, y1, x2, y2, px, py):
        return d(ccw.format(x1=x1, y1=y1, x2=x2, y2=y2, px=px, py=py))

    straddle = (
        (_ccw("x1", "y1", "x2", "y2", "bx1", "by1")
         * _ccw("x1", "y1", "x2", "y2", "bx2", "by2") < 0)
        & (_ccw("bx1", "by1", "bx2", "by2", "x1", "y1")
           * _ccw("bx1", "by1", "bx2", "by2", "x2", "y2") < 0)
    )
    return (
        a.join(b, "bucket")
        .filter(pair_order)
        .filter(straddle)
        .select("arc_id", "seg_idx", "arc_b", "seg_b")
        .distinct()
    )


def repair_crossings(
    arcs_thr: DataFrame, t: float, res: int = 5, max_rounds: int = 5
) -> DataFrame:
    """Post-simplify intersection repair [upstream's repair pass]: while
    the simplified layer has proper crossings, re-add each offending
    arc's highest-threshold removed vertex (lower that arc's effective
    level to it) and re-check. Converges because every round strictly
    adds vertices; at the original vertex set no NEW crossings exist.
    The driver-side loop runs a few tiny rounds (offender set is
    crossing-sized, joined back broadcast)."""
    levels = arcs_thr.select("arc_id").distinct().withColumn("_t_arc", F.lit(float(t)))
    for _ in range(max_rounds):
        cur = arcs_thr.join(F.broadcast(levels), "arc_id")
        simp = apply_level_per_arc(cur)
        crossing_arcs = (
            detect_crossings(simp, res)
            .select(F.explode(F.array("arc_id", "arc_b")).alias("arc_id"))
            .distinct()
        )
        offenders = [r["arc_id"] for r in crossing_arcs.collect()]
        if not offenders:
            break
        # next level per offender = its largest threshold strictly below
        # the current level (re-adds exactly one vertex per round)
        next_lv = arcs_thr.join(F.broadcast(levels), "arc_id").select(
            "arc_id",
            F.expr(
                "array_max(filter(thr, v -> v < _t_arc))"
            ).alias("_t_next"),
        )
        levels = (
            levels.join(F.broadcast(next_lv), "arc_id")
            .withColumn(
                "_t_arc",
                F.when(
                    F.col("arc_id").isin(offenders) & F.col("_t_next").isNotNull(),
                    F.col("_t_next"),
                ).otherwise(F.col("_t_arc")),
            )
            .select("arc_id", "_t_arc")
        )
    return apply_level_per_arc(arcs_thr.join(F.broadcast(levels), "arc_id"))


def apply_level_per_arc(arcs_thr_with_level: DataFrame) -> DataFrame:
    """apply_level with a per-arc level column ``_t_arc`` (the repair
    loop's carrier) instead of one global literal."""
    zipped = F.arrays_zip("xs", "ys", "thr")
    kept = F.filter(zipped, lambda v: v["thr"] >= F.col("_t_arc"))
    return (
        arcs_thr_with_level.withColumn("_k", kept)
        .withColumn("xs_s", F.transform("_k", lambda v: v["xs"]))
        .withColumn("ys_s", F.transform("_k", lambda v: v["ys"]))
        .withColumn("n_kept", F.size("_k"))
        .drop("_k")
    )


def threshold_for_pct(arcs_thr: DataFrame, pct: float) -> float:
    """The interval t such that ~pct of removable vertices survive.

    mapshaper's ``-simplify pct`` semantics: keep the pct fraction of
    interior vertices with the largest thresholds. One global
    percentile_approx over exploded thresholds.
    """
    if pct >= 1.0:
        return 0.0
    q = 1.0 - pct
    row = (
        arcs_thr.select(F.explode("thr").alias("t"))
        .filter(F.col("t") < 1e308)
        .agg(F.percentile_approx("t", q, 100_000).alias("cut"))
        .collect()[0]
    )
    return float(row["cut"]) if row["cut"] is not None else 0.0


def apply_level(arcs_thr: DataFrame, t: float, keep_shapes: bool = False) -> DataFrame:
    """Filter vertices by threshold — pure array expressions, retaining
    endpoints (thr = 1e308) by construction.

    keep_shapes (mapshaper's ``keep-shapes`` flag): arcs that would drop
    below 3 interior-bearing vertices instead keep their top-3-threshold
    vertices, so no ring can collapse to nothing at any zoom — computed
    with array expressions (array_sort on thr picks the per-arc cutoff).
    """
    if keep_shapes:
        # per-arc cutoff = 3rd-largest threshold (endpoints are 1e308 so
        # they always survive); effective level = min(t, cutoff)
        cut = F.expr("array_sort(thr, (a, b) -> CASE WHEN a > b THEN -1 WHEN a < b THEN 1 ELSE 0 END)")
        arcs_thr = arcs_thr.withColumn(
            "_t_eff",
            F.least(
                F.lit(t),
                F.coalesce(F.element_at(cut, 3), F.lit(float(t))),
            ),
        )
        tcol = F.col("_t_eff")
    else:
        tcol = F.lit(t)
    zipped = F.arrays_zip("xs", "ys", "thr")
    kept = F.filter(zipped, lambda v: v["thr"] >= tcol)
    return (
        arcs_thr.withColumn("_k", kept)
        .withColumn("xs_s", F.transform("_k", lambda v: v["xs"]))
        .withColumn("ys_s", F.transform("_k", lambda v: v["ys"]))
        .withColumn("n_kept", F.size("_k"))
        .drop("_k", "_t_eff")
    )
