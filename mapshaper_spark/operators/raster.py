"""raster↔vector tile rasterization [BASELINE.json north_rule
"raster<->vector"; SURVEY.md §2.7 "raster↔vector / tile assignment"].

Vector→raster: each polygon is rasterized onto the pixel grids of every
z/x/y tile its bbox touches — an even-odd scanline fill sampled at pixel
centers [geometry.rasterize_ring]. Distribution shape: ``applyInPandas``
grouped by ``poly_id`` — each polygon enumerates and fills its own tiles
with numpy, so a million-polygon layer fans out over the cluster and no
tile grid ever materializes on the driver. Output rows carry the packed
``uint8`` mask as ``binary`` (the Arrow/Parquet-native payload shape, same
as the images table's ``bytes``).

Raster→vector: an exact run-length vectorizer — each row of set pixels
becomes one rectangle ring in tile coordinates. The roundtrip invariant
``rasterize(vectorize(mask)) == mask`` is exact (tested bit-for-bit in
pytest), which is the raster↔vector analog of the PSNR gate for images.

The oracle twin: pixel-center point-in-polygon counts are plain ANSI SQL
(generate pixel centers with ``sequence``/``generate_series``, half-plane
test against the edge relation) — see queries.raster_tile_pixel_counts.

Upstream analog: mapshaper rasterizes only in the GUI canvas / SVG export
[SURVEY.md §2.7]; the tile-grid decomposition is our distributed design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cells, geometry

TILE_W = 16  # pixels per tile edge (fixture default; production: 256)
TILE_H = 16


def tile_bounds(z: int, tx: int, ty: int) -> tuple[float, float, float, float]:
    """Equirectangular tile bbox (lon_min, lat_min, lon_max, lat_max)."""
    n = 1 << z
    w, h = 360.0 / n, 180.0 / n
    return (-180.0 + tx * w, -90.0 + ty * h, -180.0 + (tx + 1) * w, -90.0 + (ty + 1) * h)


def rasterize_polygons(
    polygons: DataFrame, z: int, w: int = TILE_W, h: int = TILE_H
) -> DataFrame:
    """polygons(poly_id, xs, ys) → (poly_id, tile_x, tile_y, n_pixels,
    mask binary) for every tile with at least one covered pixel."""

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, row in pdf.iterrows():
            xs = np.asarray(row["xs"], dtype=np.float64)
            ys = np.asarray(row["ys"], dtype=np.float64)
            ix0, iy0 = cells.grid_xy_np(np.array([xs.min()]), np.array([ys.min()]), z)
            ix1, iy1 = cells.grid_xy_np(np.array([xs.max()]), np.array([ys.max()]), z)
            for ty in range(int(iy0[0]), int(iy1[0]) + 1):
                for tx in range(int(ix0[0]), int(ix1[0]) + 1):
                    xmin, ymin, xmax, ymax = tile_bounds(z, tx, ty)
                    mask = geometry.rasterize_ring(xs, ys, xmin, ymin, xmax, ymax, w, h)
                    n = int(mask.sum())
                    if n:
                        rows.append(
                            {
                                "poly_id": int(row["poly_id"]),
                                "tile_x": tx,
                                "tile_y": ty,
                                "n_pixels": n,
                                "mask": mask.tobytes(),
                            }
                        )
        return pd.DataFrame(
            rows,
            columns=["poly_id", "tile_x", "tile_y", "n_pixels", "mask"],
        )

    return polygons.groupBy("poly_id").applyInPandas(
        fill, schema="poly_id int, tile_x long, tile_y long, n_pixels long, mask binary"
    )


def vectorize_mask(mask: np.ndarray) -> list[tuple[int, int, int]]:
    """mask (h, w) uint8 → run-length rectangles [(row, col_lo, col_hi)].

    Exact: every set pixel belongs to exactly one run.
    """
    runs = []
    for r in range(mask.shape[0]):
        row = mask[r]
        edges = np.diff(np.concatenate([[0], row.astype(np.int8), [0]]))
        starts = np.flatnonzero(edges == 1)
        ends = np.flatnonzero(edges == -1) - 1
        for lo, hi in zip(starts, ends):
            runs.append((r, int(lo), int(hi)))
    return runs


def runs_to_mask(runs: list[tuple[int, int, int]], w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    for r, lo, hi in runs:
        out[r, lo : hi + 1] = 1
    return out


def vectorize_tiles(raster: DataFrame, w: int = TILE_W, h: int = TILE_H) -> DataFrame:
    """Inverse sink: (poly_id, tile, mask) → run-length vector rows
    (poly_id, tile_x, tile_y, row, col_lo, col_hi). Exact inverse of
    rasterize via runs_to_mask."""

    def vec(it):
        for pdf in it:
            rows = []
            for _, rec in pdf.iterrows():
                mask = np.frombuffer(rec["mask"], dtype=np.uint8).reshape(h, w)
                for r, lo, hi in vectorize_mask(mask):
                    rows.append(
                        {
                            "poly_id": rec["poly_id"],
                            "tile_x": rec["tile_x"],
                            "tile_y": rec["tile_y"],
                            "row": r,
                            "col_lo": lo,
                            "col_hi": hi,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["poly_id", "tile_x", "tile_y", "row", "col_lo", "col_hi"]
            )

    return raster.mapInPandas(
        vec,
        schema="poly_id int, tile_x long, tile_y long, row int, col_lo int, col_hi int",
    )
