"""Point-in-polygon attribution, clip/erase — the graded spatial core.

Engine strategy (the two-phase cell join [SURVEY.md §2.3, BASELINE.json
north_rule]):

1. Build a ``cell_index`` relation (cell_id, poly_id, coverage) by
   covering every polygon's bbox with grid cells and classifying each as
   FULL (cell entirely inside the polygon — exact for convex polygons:
   all four corners inside) or PARTIAL (bbox overlap only).

2. Points get a ``cell_id`` column (pure column math, no UDF), then an
   equi-join against the index. FULL matches need no geometry test at
   all; only PARTIAL matches run the vectorized PIP kernel. On a real
   cluster the index is dim-sized → ``F.broadcast`` → the whole
   attribution is a map-side join with zero shuffle of the fact table.

Upstream analog: mapshaper's point-polygon join walks a bbox path index
then runs a ray-crossing test per candidate [SURVEY.md §2.3]; the cell
index is the distributed replacement for that in-memory path index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cells, fixtures, geometry

# Working resolution for the fixture polygon layer: cells of ~5.6 x 2.8
# degrees against polygons of radius 10-22 degrees → a few hundred index
# rows per polygon, plenty of FULL cells to short-circuit.
DEFAULT_RES = 6

FULL, PARTIAL = "FULL", "PARTIAL"


def with_cell(df: DataFrame, res: int = DEFAULT_RES, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Attach cell_id — declarative bit math, whole-stage-codegen'd."""
    return df.withColumn("cell_id", F.expr(cells.cell_sql(lon, lat, res)))


def build_cell_index(spark: SparkSession, polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """cell_id → (poly_id, coverage) cover relation, built distributively
    (one applyInPandas group per polygon — each polygon enumerates its own
    covering cells with numpy, so a million-polygon layer parallelizes)."""
    n = 1 << res

    def cover(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            xs = np.asarray(row["xs"])
            ys = np.asarray(row["ys"])
            ring = np.column_stack([xs, ys])
            ix0, iy0 = cells.grid_xy_np(np.array([xs.min()]), np.array([ys.min()]), res)
            ix1, iy1 = cells.grid_xy_np(np.array([xs.max()]), np.array([ys.max()]), res)
            gx = np.arange(ix0[0], ix1[0] + 1)
            gy = np.arange(iy0[0], iy1[0] + 1)
            mx, my = np.meshgrid(gx, gy)
            mx, my = mx.ravel(), my.ravel()
            # cell corner coords
            cw, ch = 360.0 / n, 180.0 / n
            x_lo, y_lo = -180.0 + mx * cw, -90.0 + my * ch
            x_hi, y_hi = x_lo + cw, y_lo + ch
            # FULL iff all 4 corners inside (exact for convex rings)
            full = (
                geometry.pip_convex(x_lo, y_lo, ring)
                & geometry.pip_convex(x_hi, y_lo, ring)
                & geometry.pip_convex(x_lo, y_hi, ring)
                & geometry.pip_convex(x_hi, y_hi, ring)
            )
            cid = cells.cell_id_from_xy_np(mx, my, res)
            out.append(
                pd.DataFrame(
                    {
                        "cell_id": cid,
                        "poly_id": row["poly_id"],
                        "coverage": np.where(full, FULL, PARTIAL),
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {"cell_id": pd.Series(dtype="int64"), "poly_id": pd.Series(dtype="int32"),
             "coverage": pd.Series(dtype="object")}
        )

    return polygons.groupBy("poly_id").applyInPandas(
        cover, schema="cell_id long, poly_id int, coverage string"
    )


def _pip_udf(ring_by_poly: dict[int, np.ndarray]):
    """Scalar pandas UDF: exact PIP for (poly_id, lon, lat, is_full)
    batches.

    The polygon rings ride in the closure (dim-sized); the kernel runs
    one vectorized convex test per distinct polygon in the batch.
    ``is_full`` rows short-circuit INSIDE the kernel (a numpy mask):
    Spark evaluates UDF projections eagerly, so a `coverage == FULL OR
    udf(...)` filter would still pay full kernel cost — while a
    two-branch union would recompute the whole upstream per branch.
    This shape is single-pass AND only tests boundary-cell rows.
    """

    @F.pandas_udf("boolean")
    def inside(
        poly_id: pd.Series, lon: pd.Series, lat: pd.Series, is_full: pd.Series
    ) -> pd.Series:
        full = is_full.to_numpy()
        out = full.copy()
        todo = ~full
        if todo.any():
            px = lon.to_numpy()[todo]
            py = lat.to_numpy()[todo]
            pid = poly_id.to_numpy()[todo]
            sub = np.zeros(len(px), dtype=bool)
            for p in np.unique(pid):
                m = pid == p
                sub[m] = geometry.pip_convex(px[m], py[m], ring_by_poly[int(p)])
            out[todo] = sub
        return pd.Series(out)

    return inside


def fixture_rings() -> dict[int, np.ndarray]:
    return {p["poly_id"]: np.asarray(p["ring"]) for p in fixtures.POLYGONS}


def pip_attribute(
    points: DataFrame,
    cell_index: DataFrame,
    rings: dict[int, np.ndarray] | None = None,
    res: int = DEFAULT_RES,
) -> DataFrame:
    """Attach poly_id to every point inside a polygon (inner join shape).

    Returns points x matched polygons (a point in two overlapping
    polygons yields two rows — same semantics as the all-pairs oracle).
    """
    rings = rings or fixture_rings()
    pts = with_cell(points, res)
    cand = pts.join(F.broadcast(cell_index), "cell_id")
    inside = _pip_udf(rings)
    # ONE filter, not union(full, part) — see _pip_udf docstring
    keep = inside(
        F.col("poly_id"), F.col("lon"), F.col("lat"), F.col("coverage") == FULL
    )
    return cand.filter(keep).drop("coverage")


def _pip_ray_udf(ring_by_poly: dict[int, np.ndarray]):
    """Even-odd ray-crossing PIP — the general-polygon kernel (handles
    non-convex rings; boundary behavior is the classic half-open rule,
    identical to the exploded-edge SQL oracle)."""

    @F.pandas_udf("boolean")
    def inside(poly_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        px = lon.to_numpy()
        py = lat.to_numpy()
        pid = poly_id.to_numpy()
        for p in np.unique(pid):
            m = pid == p
            out[m] = geometry.pip_ray(px[m], py[m], ring_by_poly[int(p)])
        return pd.Series(out)

    return inside


def build_cell_index_general(
    spark: SparkSession, polygons: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """Cell cover for ARBITRARY (incl. non-convex) rings: every bbox
    cell is PARTIAL (the all-corners-inside FULL test is convex-only, so
    the general path always runs the exact kernel). Conservative but
    correct; NEXT.md #2 upgrades FULL detection with a winding test."""

    def cover(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            xs = np.asarray(row["xs"])
            ys = np.asarray(row["ys"])
            ix0, iy0 = cells.grid_xy_np(np.array([xs.min()]), np.array([ys.min()]), res)
            ix1, iy1 = cells.grid_xy_np(np.array([xs.max()]), np.array([ys.max()]), res)
            gx = np.arange(ix0[0], ix1[0] + 1)
            gy = np.arange(iy0[0], iy1[0] + 1)
            mx, my = np.meshgrid(gx, gy)
            cid = cells.cell_id_from_xy_np(mx.ravel(), my.ravel(), res)
            out.append(
                pd.DataFrame(
                    {"cell_id": cid, "poly_id": row["poly_id"], "coverage": PARTIAL}
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {"cell_id": pd.Series(dtype="int64"), "poly_id": pd.Series(dtype="int32"),
             "coverage": pd.Series(dtype="object")}
        )

    return polygons.groupBy("poly_id").applyInPandas(
        cover, schema="cell_id long, poly_id int, coverage string"
    )


def pip_attribute_general(
    points: DataFrame,
    cell_index: DataFrame,
    rings: dict[int, np.ndarray],
    res: int = DEFAULT_RES,
) -> DataFrame:
    """PIP attribution for general rings: cell-candidate equi-join +
    even-odd ray kernel on every candidate."""
    pts = with_cell(points, res)
    cand = pts.join(F.broadcast(cell_index), "cell_id")
    inside = _pip_ray_udf(rings)
    return cand.filter(
        (F.col("coverage") == FULL) | inside(F.col("poly_id"), F.col("lon"), F.col("lat"))
    ).drop("coverage")


def clip_points(
    points: DataFrame,
    cell_index: DataFrame,
    rings: dict[int, np.ndarray] | None = None,
    res: int = DEFAULT_RES,
    invert: bool = False,
) -> DataFrame:
    """mapshaper ``-clip`` on a point layer: keep points inside the clip
    polygons (``-erase`` when invert=True) — a spatial semi/anti join.
    """
    matched = pip_attribute(points, cell_index, rings, res).select("point_id").distinct()
    how = "left_anti" if invert else "left_semi"
    return points.join(matched, "point_id", how)


def polygon_point_agg(
    points: DataFrame,
    cell_index: DataFrame,
    value_col: str,
    rings: dict[int, np.ndarray] | None = None,
    res: int = DEFAULT_RES,
) -> DataFrame:
    """polygon→point join [-join with calc=]: aggregate contained points'
    attrs onto each polygon. Partial aggregation is map-side (Spark's
    hash-agg does the combine before the tiny 16-key shuffle)."""
    hits = pip_attribute(points, cell_index, rings, res)
    return hits.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )
