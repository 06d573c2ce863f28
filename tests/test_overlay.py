"""Polygon overlay kernels: Sutherland-Hodgman clip goldens, erase area
accounting, largest-overlap join, WebMercator roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark import geometry
from mapshaper_spark.functions import proj as proj_fn
from mapshaper_spark.operators import overlay
from mapshaper_spark.sources import testdata

from .conftest import SF_SMOKE


# ------------------------------------------------ kernel goldens (no Spark)


def test_sh_clip_square_by_offset_square():
    """Unit square ∩ unit square shifted by (0.5, 0.5) = 0.5x0.5 square."""
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    win = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]])
    cx, cy = geometry.clip_ring_convex(xs, ys, win)
    a2, _, _ = geometry.shoelace_seq(cx, cy)
    assert a2 / 2.0 == pytest.approx(0.25)


def test_sh_clip_disjoint_is_empty():
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    win = np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0]])
    cx, _cy = geometry.clip_ring_convex(xs, ys, win)
    assert len(cx) == 0


def test_sh_clip_contained_returns_subject():
    xs = np.array([0.4, 0.6, 0.6, 0.4])
    ys = np.array([0.4, 0.4, 0.6, 0.6])
    win = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    cx, cy = geometry.clip_ring_convex(xs, ys, win)
    a2, _, _ = geometry.shoelace_seq(cx, cy)
    assert a2 / 2.0 == pytest.approx(0.04)


def test_sh_clip_triangle_by_halfcovering_square():
    """Triangle (0,0)(2,0)(0,2) ∩ square [0,1]² = area 1.5·(1/2)? No —
    hand-computed: pieces (0,0)(1,0)(1,1)(0,1) minus corner above line
    x+y=2 → the full unit square is inside the triangle except nothing:
    x+y<=2 everywhere on the square boundary except corner (1,1) where
    x+y=2 exactly → area 1.0."""
    xs = np.array([0.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0])
    win = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    cx, cy = geometry.clip_ring_convex(xs, ys, win)
    a2, _, _ = geometry.shoelace_seq(cx, cy)
    assert a2 / 2.0 == pytest.approx(1.0)


# ---------------------------------------------------------- Spark operators


def test_clip_polygons_area_bounds(spark):
    out = overlay.clip_polygons(
        testdata.polygons(spark), testdata.clip_polygons(spark)
    ).collect()
    assert len(out) > 10
    from mapshaper_spark import fixtures

    own = {}
    for p in fixtures.POLYGONS:
        ring = np.asarray(p["ring"])
        a2, _, _ = geometry.shoelace_seq(ring[:, 0], ring[:, 1])
        own[p["poly_id"]] = a2 / 2.0
    for r in out:
        assert r["area"] > -1e-9
        assert r["area"] <= own[r["subject_id"]] + 1e-6  # piece ≤ subject


def test_erase_remaining_area_bounds(spark):
    rem = overlay.erase_polygons_area(
        testdata.polygons(spark), testdata.clip_polygons(spark)
    ).collect()
    assert len(rem) == 16
    for r in rem:
        # clip layer polygons may overlap each other, so remaining can
        # undershoot, but it must never exceed the subject's own area
        assert r["remaining_area"] <= 2000.0


def test_largest_overlap_winner_is_argmax(spark):
    pieces = overlay.clip_polygons(
        testdata.polygons(spark), testdata.clip_polygons(spark)
    ).collect()
    best = {}
    for r in pieces:
        k = r["subject_id"]
        cand = (-r["area"], r["clip_id"])
        if k not in best or cand < best[k]:
            best[k] = cand
    got = overlay.largest_overlap_join(
        testdata.polygons(spark), testdata.clip_polygons(spark)
    ).collect()
    for r in got:
        assert best[r["poly_id"]][1] == r["src_id"]
        assert -best[r["poly_id"]][0] == pytest.approx(r["overlap_area"])


# ------------------------------------------------------- polyline clip


def test_clip_polyline_horizontal_through_square():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    xs = np.arange(-2.0, 7.0, 1.0)
    ys = np.full_like(xs, 2.0)
    pieces = geometry.clip_polyline_convex(xs, ys, ring)
    assert len(pieces) == 1
    px, py = pieces[0]
    assert px[0] == pytest.approx(0.0) and px[-1] == pytest.approx(4.0)
    assert geometry.path_length(px, py) == pytest.approx(4.0)


def test_clip_polyline_zigzag_two_pieces():
    """A V-shape dipping below the window exits and re-enters → 2 pieces."""
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    xs = np.array([1.0, 4.0, 6.0, 9.0])
    ys = np.array([5.0, -5.0, -5.0, 5.0])
    pieces = geometry.clip_polyline_convex(xs, ys, ring)
    assert len(pieces) == 2


def test_clip_polyline_fully_inside_kept_whole():
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    xs = np.array([1.0, 3.0, 5.0])
    ys = np.array([1.0, 2.0, 1.0])
    pieces = geometry.clip_polyline_convex(xs, ys, ring)
    assert len(pieces) == 1
    assert len(pieces[0][0]) == 3


def test_clip_polylines_matches_chord_length(spark):
    """Engine clipped length for each horizontal cross-line == the
    analytic chord interval of the convex polygon at that latitude."""
    from mapshaper_spark import fixtures
    from mapshaper_spark.operators import topology

    lines = topology.arcs_df(spark, fixtures.CROSS_LINES)
    got = {
        (r["arc_id"], r["clip_id"]): r["total_len"]
        for r in overlay.clip_polylines(lines, testdata.polygons(spark)).collect()
    }
    assert len(got) >= 8
    for line in fixtures.CROSS_LINES:
        y = line["ys"][0]
        for p in fixtures.POLYGONS:
            ring = np.asarray(p["ring"])
            x1, yy1 = ring[:, 0], ring[:, 1]
            x2, yy2 = np.roll(x1, -1), np.roll(yy1, -1)
            crosses = (yy1 > y) != (yy2 > y)
            key = (line["arc_id"], p["poly_id"])
            if crosses.sum() < 2:
                assert key not in got
                continue
            xint = x1[crosses] + (y - yy1[crosses]) * (x2[crosses] - x1[crosses]) / (
                yy2[crosses] - yy1[crosses]
            )
            # clamp the chord to the line's own extent (some fixture
            # polygons overhang the lon domain)
            lo = max(float(xint.min()), -180.0)
            hi = min(float(xint.max()), 180.0)
            want = max(0.0, hi - lo)
            if want == 0.0:
                assert key not in got
                continue
            assert got[key] == pytest.approx(want, abs=1e-6), key


def test_export_geojson_parses(spark):
    import json

    from mapshaper_spark import queries as Q

    rows = Q.QUERIES["export_geojson_points"](spark, SF_SMOKE).limit(20).collect()
    assert rows
    for r in rows:
        f = json.loads(r["geojson"])
        assert f["type"] == "Feature"
        assert f["properties"]["id"] == r["point_id"]
        lon, lat = f["geometry"]["coordinates"]
        assert -180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0


def test_webmercator_roundtrip(spark):
    pts = testdata.customer_points(spark, SF_SMOKE)
    m = proj_fn.from_webmercator(proj_fn.to_webmercator(pts))
    bad = m.filter(
        (F.abs(F.col("lon2") - F.col("lon")) > 1e-9)
        | (F.abs(F.col("lat2") - F.col("lat")) > 1e-9)
    ).count()
    assert bad == 0


def test_webmercator_known_point(spark):
    df = spark.createDataFrame([(0.0, 0.0), (180.0, 0.0)], "lon double, lat double")
    rows = proj_fn.to_webmercator(df).orderBy("lon").collect()
    assert rows[0]["mx"] == pytest.approx(0.0, abs=1e-6)
    assert rows[0]["my"] == pytest.approx(0.0, abs=1e-6)
    assert rows[1]["mx"] == pytest.approx(20037508.342789244)


def test_webmercator_tile_goldens(spark):
    """Hand-computed slippy z/x/y tiles for known cities (the public
    OSM tile formula): NYC (-73.98, 40.75) z4 → (4, 6); Paris
    (2.35, 48.86) z4 → (8, 5); Tokyo (139.69, 35.68) z4 → (14, 6);
    Sydney (151.21, -33.87) z4 → (14, 9); null island → (8, 8)."""
    df = spark.createDataFrame(
        [
            ("nyc", -73.98, 40.75),
            ("paris", 2.35, 48.86),
            ("tokyo", 139.69, 35.68),
            ("sydney", 151.21, -33.87),
            ("null", 0.0, 0.0),
        ],
        "name string, lon double, lat double",
    )
    got = {
        r["name"]: (r["wm_tile_x"], r["wm_tile_y"])
        for r in proj_fn.webmercator_tile(df, z=4).collect()
    }
    assert got == {
        "nyc": (4, 6),
        "paris": (8, 5),
        "tokyo": (14, 6),
        "sydney": (14, 9),
        "null": (8, 8),
    }


def test_webmercator_tile_poles_clamped(spark):
    df = spark.createDataFrame(
        [(0.0, 89.9), (0.0, -89.9)], "lon double, lat double"
    )
    rows = proj_fn.webmercator_tile(df, z=4).collect()
    ys = sorted(r["wm_tile_y"] for r in rows)
    assert ys == [0, 15]  # clamped to the MAX_LAT band, never out of range
