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

METHODS = {"visvalingam": geometry.visvalingam_thresholds, "dp": geometry.dp_thresholds}


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


def apply_level(arcs_thr: DataFrame, t: float) -> DataFrame:
    """Filter vertices by threshold — pure array expressions, retaining
    endpoints (thr = 1e308) by construction."""
    zipped = F.arrays_zip("xs", "ys", "thr")
    kept = F.filter(zipped, lambda v: v["thr"] >= F.lit(t))
    return (
        arcs_thr.withColumn("_k", kept)
        .withColumn("xs_s", F.transform("_k", lambda v: v["xs"]))
        .withColumn("ys_s", F.transform("_k", lambda v: v["ys"]))
        .withColumn("n_kept", F.size("_k"))
        .drop("_k")
    )
