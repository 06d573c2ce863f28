"""-points / -filter-islands / -affine / -snap — per-shape derivations
[SURVEY.md §2.2, §2.7].

Centroid/area run per-polygon inside a grouped pandas UDF (one group per
feature — a million-feature layer parallelizes); the accumulation is
sequential ring-order so the DuckDB oracle's SQL ``sum()`` over the edge
relation reproduces the values bit-for-bit [geometry.shoelace_seq].
Affine/snap are pure column math (whole-stage codegen, no UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geometry


def centroids(polygons: DataFrame) -> DataFrame:
    """-points centroid: (poly_id, cx, cy) via ring-order shoelace."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            a2, sx, sy = geometry.shoelace_seq(r["xs"], r["ys"])
            out.append(
                {"poly_id": int(r["poly_id"]), "cx": sx / (3.0 * a2), "cy": sy / (3.0 * a2)}
            )
        return pd.DataFrame(out, columns=["poly_id", "cx", "cy"])

    return polygons.groupBy("poly_id").applyInPandas(
        run, schema="poly_id int, cx double, cy double"
    )


def areas(polygons: DataFrame) -> DataFrame:
    """(poly_id, area) — signed shoelace area (CCW positive)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            a2, _sx, _sy = geometry.shoelace_seq(r["xs"], r["ys"])
            out.append({"poly_id": int(r["poly_id"]), "area": a2 / 2.0})
        return pd.DataFrame(out, columns=["poly_id", "area"])

    return polygons.groupBy("poly_id").applyInPandas(
        run, schema="poly_id int, area double"
    )


def filter_islands(polygons: DataFrame, min_area: float) -> DataFrame:
    """-filter-islands min-area=: keep polygons at or above the area
    threshold (drop small detached rings)."""
    return areas(polygons).filter(F.col("area") >= min_area)


def affine(points: DataFrame, scale_x=1.0, scale_y=1.0, shift_x=0.0, shift_y=0.0) -> DataFrame:
    """-affine shift=/scale=: coordinate transform as column math."""
    return points.withColumn("x", F.col("lon") * scale_x + shift_x).withColumn(
        "y", F.col("lat") * scale_y + shift_y
    )


def snap(points: DataFrame, interval: float) -> DataFrame:
    """-snap interval=: quantize coordinates to the grid, group
    near-coincident vertices, keep a deterministic representative.
    floor(x/ival)·ival is IEEE-portable (round() tie rules differ across
    engines and is avoided)."""
    inv = 1.0 / interval
    sx = F.floor(F.col("lon") * inv) / inv
    sy = F.floor(F.col("lat") * inv) / inv
    return (
        points.withColumn("sx", sx)
        .withColumn("sy", sy)
        .groupBy("sx", "sy")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("point_id").alias("rep_id"))
    )
