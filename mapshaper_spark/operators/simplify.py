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
