"""Hierarchical (S2-style) cell cover: partition property, size
advantage over the flat cover, and join equivalence."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mapshaper_spark import cells, fixtures
from mapshaper_spark.operators import hier_cover, spatial_join as sj
from mapshaper_spark.sources import testdata

from .conftest import SF_SMOKE


def _ring(pid):
    return np.asarray(fixtures.POLYGONS[pid]["ring"])


def test_cover_cells_partition_no_overlap():
    """Cover cells of one polygon must be pairwise disjoint regions
    (FULL coarse cells never overlap finer cells)."""
    out = hier_cover._cover_one(_ring(5), 3, 6)
    assert out
    boxes = [cells.cell_bounds(cid) for cid, _cov in out]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            overlap = (
                a[0] < b[2] and a[2] > b[0] and a[1] < b[3] and a[3] > b[1]
            )
            assert not overlap, (boxes[i], boxes[j])


def test_cover_full_cells_inside_polygon():
    ring = _ring(5)
    for cid, cov in hier_cover._cover_one(ring, 3, 6):
        if cov == "FULL":
            x0, y0, x1, y1 = cells.cell_bounds(cid)
            from mapshaper_spark import geometry

            px = np.array([x0, x1, x0, x1, (x0 + x1) / 2])
            py = np.array([y0, y0, y1, y1, (y0 + y1) / 2])
            assert geometry.pip_convex(px, py, ring).all()


def test_hier_index_smaller_than_flat_at_same_leaf_res(spark):
    polys = testdata.polygons(spark)
    flat = sj.build_cell_index(spark, polys, res=6).count()
    hier = hier_cover.build_cell_index_hier(spark, polys, 3, 6).count()
    assert hier < flat, (hier, flat)


def test_hier_join_matches_flat_join(spark):
    pts = testdata.customer_points(spark, SF_SMOKE)
    polys = testdata.polygons(spark)
    flat_idx = sj.build_cell_index(spark, polys, res=6)
    hier_idx = hier_cover.build_cell_index_hier(spark, polys, 3, 6)
    a = sj.pip_attribute(pts, flat_idx).select("point_id", "poly_id")
    b = hier_cover.pip_attribute_hier(pts, hier_idx).select("point_id", "poly_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hier_cover_perimeter_scaling():
    """Doubling leaf resolution should grow the cover ~2x (perimeter
    scaling), NOT ~4x (area scaling) — the whole point of the hierarchy."""
    ring = _ring(8)
    n6 = len(hier_cover._cover_one(ring, 3, 6))
    n8 = len(hier_cover._cover_one(ring, 3, 8))
    assert n8 < n6 * 5.5  # area scaling would be ~16x
