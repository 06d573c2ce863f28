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
            if a2 == 0.0:
                # degenerate (zero-area) ring: fail loudly rather than emit
                # inf/NaN — NaN never equals itself, so one bad feature
                # would otherwise silently break whole-layer oracle parity
                raise ValueError(
                    f"centroid of zero-area ring poly_id={int(r['poly_id'])}"
                )
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


def geometry_properties(polygons: DataFrame) -> DataFrame:
    """mapshaper's lazy feature-proxy accessors ($.area, $.perimeter,
    $.centroidX/Y, $.bounds, $.vertexCount [SURVEY.md §2.8]) as ONE
    materialized property table — computed once per feature, then
    referenced as ordinary columns. Sequential ring-order accumulation
    keeps every value bit-identical to the SQL oracle."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        out = []
        for _, r in pdf.iterrows():
            xs, ys = list(r["xs"]), list(r["ys"])
            a2, sx, sy = geometry.shoelace_seq(xs, ys)
            perim = 0.0
            n = len(xs)
            for i in range(n):
                dx = xs[(i + 1) % n] - xs[i]
                dy = ys[(i + 1) % n] - ys[i]
                perim += math.sqrt(dx * dx + dy * dy)
            out.append(
                {
                    "poly_id": int(r["poly_id"]),
                    "area": a2 / 2.0,
                    "perimeter": perim,
                    "cx": sx / (3.0 * a2),
                    "cy": sy / (3.0 * a2),
                    "n_vertices": n,
                    "xmin": min(xs),
                    "ymin": min(ys),
                    "xmax": max(xs),
                    "ymax": max(ys),
                }
            )
        return pd.DataFrame(
            out,
            columns=[
                "poly_id", "area", "perimeter", "cx", "cy",
                "n_vertices", "xmin", "ymin", "xmax", "ymax",
            ],
        )

    return polygons.groupBy("poly_id").applyInPandas(
        run,
        schema=(
            "poly_id int, area double, perimeter double, cx double, cy double, "
            "n_vertices int, xmin double, ymin double, xmax double, ymax double"
        ),
    )


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
