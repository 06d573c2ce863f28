"""-rotate (spherical rotation, d3-geo convention) property pins
[UPSTREAM mapshaper-rotate.mjs — public knowledge of mbloch/mapshaper;
/root/reference is empty, SURVEY.md §0]. Transcendental, so never
hash-oracled [SURVEY.md §5.2]: these pins are the correctness story —
inverse identity, the DEFINING isometry property (a rotation of the
sphere preserves every great-circle distance), 90°-rotation goldens,
a numpy twin, and the ring-layer path through project_layer."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark.functions import proj as proj_fn

ANGLES = (110.0, -35.0, 20.0)


def _grid(spark, step=15):
    lons = list(range(-180, 181, step))
    lats = list(range(-75, 76, step))
    rows = [(i, float(lo), float(la)) for i, (lo, la) in enumerate(
        (lo, la) for lo in lons for la in lats)]
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def _np_rotate(lon, lat, angles):
    dl, dp, dg = (math.radians(a) for a in angles)
    l = np.radians(lon) + dl
    p = np.radians(lat)
    x, y, z = np.cos(l) * np.cos(p), np.sin(l) * np.cos(p), np.sin(p)
    k = z * math.cos(dp) + x * math.sin(dp)
    rlon = np.degrees(np.arctan2(y * math.cos(dg) - k * math.sin(dg),
                                 x * math.cos(dp) - z * math.sin(dp)))
    rlat = np.degrees(np.arcsin(np.clip(k * math.cos(dg) + y * math.sin(dg),
                                        -1.0, 1.0)))
    return rlon, rlat


def _gc_dist(lon1, lat1, lon2, lat2):
    l1, p1, l2, p2 = (np.radians(v) for v in (lon1, lat1, lon2, lat2))
    return np.arccos(np.clip(
        np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(l1 - l2),
        -1.0, 1.0))


@pytest.fixture(scope="module")
def roundtrip(spark):
    g = _grid(spark)
    r = proj_fn.rotate_sphere(g, ANGLES)
    return proj_fn.rotate_sphere_inverse(r, ANGLES).toPandas()


def test_inverse_identity(roundtrip):
    df = roundtrip
    # away from the poles the roundtrip must come back < 1e-9 deg
    dlon = (df.lon2 - df.lon + 180.0) % 360.0 - 180.0
    assert np.abs(dlon).max() < 1e-9
    assert np.abs(df.lat2 - df.lat).max() < 1e-9


def test_isometry_defining_property(roundtrip):
    # a rotation of the sphere preserves EVERY great-circle distance:
    # compare all consecutive-pair distances before and after
    df = roundtrip.sort_values("point_id").reset_index(drop=True)
    a, b = df.iloc[:-1], df.iloc[1:].reset_index(drop=True)
    before = _gc_dist(a.lon.values, a.lat.values, b.lon.values, b.lat.values)
    after = _gc_dist(a.rlon.values, a.rlat.values, b.rlon.values, b.rlat.values)
    assert np.abs(before - after).max() < 1e-9


def test_numpy_twin(roundtrip):
    df = roundtrip
    rlon, rlat = _np_rotate(df.lon.values, df.lat.values, ANGLES)
    dlon = (df.rlon.values - rlon + 180.0) % 360.0 - 180.0
    assert np.abs(dlon).max() < 1e-9
    assert np.abs(df.rlat.values - rlat).max() < 1e-9


def test_goldens_90(spark):
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 0.0, 90.0), (2, 45.0, 0.0)],
        "point_id long, lon double, lat double",
    )
    # pure longitude rotation: lon' = lon + 90
    r = proj_fn.rotate_sphere(pts, (90.0, 0.0, 0.0)).toPandas().set_index("point_id")
    assert abs(r.loc[0, "rlon"] - 90.0) < 1e-12 and abs(r.loc[0, "rlat"]) < 1e-12
    assert abs(r.loc[2, "rlon"] - 135.0) < 1e-12
    # phi rotation by 90: (0,0) -> the north pole; (0,90) -> (180, 0)
    r = proj_fn.rotate_sphere(pts, (0.0, 90.0, 0.0)).toPandas().set_index("point_id")
    assert abs(r.loc[0, "rlat"] - 90.0) < 1e-7
    assert abs(abs(r.loc[1, "rlon"]) - 180.0) < 1e-7 and abs(r.loc[1, "rlat"]) < 1e-7


def test_layer_path(spark):
    # ring-array layers rotate through project_layer: vertex order,
    # array lengths, and values all survive the explode -> regroup
    layer = spark.createDataFrame(
        [(0, 0, [10.0, 20.0, 20.0, 10.0], [10.0, 10.0, 20.0, 20.0])],
        "poly_id int, ring_idx int, xs array<double>, ys array<double>",
    )
    out = proj_fn.project_layer(
        layer,
        lambda df: proj_fn.rotate_sphere(df, ANGLES, out=("rx", "ry")),
        out=("rx", "ry"),
    ).first()
    pts = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(
            zip([10.0, 20.0, 20.0, 10.0], [10.0, 10.0, 20.0, 20.0]))],
        "point_id long, lon double, lat double",
    )
    want = (
        proj_fn.rotate_sphere(pts, ANGLES, out=("rx", "ry"))
        .orderBy("point_id").toPandas()
    )
    assert out["xs"] == list(want.rx.values)
    assert out["ys"] == list(want.ry.values)


def test_hammer_roundtrip_nodes_equal_area(spark):
    """Hammer (r5 continuation): CLOSED-FORM inverse roundtrip over the
    full graticule incl. poles and the date line, boundary nodes
    (equator date-line x = 2√2·R, pole y = √2·R), and the DEFINING
    equal-area quad check."""
    R = proj_fn.R
    pts = [(0.0, 0.0), (45.0, 30.0), (-120.0, -55.0), (179.0, 80.0),
           (180.0, 0.0), (-180.0, 0.0), (13.0, 89.99), (60.0, 90.0),
           (60.0, -90.0), (-179.5, -89.5)]
    df = spark.createDataFrame(pts, schema="lon double, lat double")
    out = proj_fn.hammer_inverse(proj_fn.hammer(df)).collect()
    for r in out:
        assert abs(r["lat2"] - r["lat"]) < 1e-7, r
        if abs(r["lat"]) < 90.0:  # pole meridians collapse (x = 0)
            dlon = (r["lon2"] - r["lon"] + 180.0) % 360.0 - 180.0
            assert abs(dlon) < 1e-7, r
    got = {(r["lon"], r["lat"]): (r["hmx"], r["hmy"])
           for r in proj_fn.hammer(df).collect()}
    assert abs(got[(180.0, 0.0)][0] - 2.0 * math.sqrt(2.0) * R) < 1e-6
    assert abs(got[(60.0, 90.0)][1] - math.sqrt(2.0) * R) < 1e-6
    assert got[(0.0, 0.0)] == (0.0, 0.0)
    # equal-area: a small quad's planar area equals its spherical area
    d, lon_c, lat_c = 0.05, 33.0, -48.0
    quad = [(lon_c - d, lat_c - d), (lon_c + d, lat_c - d),
            (lon_c + d, lat_c + d), (lon_c - d, lat_c + d)]
    qdf = spark.createDataFrame(quad, schema="lon double, lat double")
    prj = {(r["lon"], r["lat"]): (r["hmx"], r["hmy"])
           for r in proj_fn.hammer(qdf).collect()}
    xs = [prj[p][0] for p in quad]
    ys = [prj[p][1] for p in quad]
    planar = 0.5 * abs(sum(xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
                           for i in range(4)))
    spherical = (R ** 2) * (2.0 * math.radians(d)) * (
        math.sin(math.radians(lat_c + d)) - math.sin(math.radians(lat_c - d)))
    assert abs(planar - spherical) < 2e-5 * spherical


def test_aitoff_roundtrip_and_winkel_mean_identity(spark):
    """Aitoff (r5 continuation): fixed-count 2D-Newton inverse
    roundtrip over the graticule (same machinery as Winkel Tripel),
    exact axes (y = R·φ on the central meridian, x = R·Δλ on the
    equator), and the STRUCTURAL identity Winkel Tripel ==
    (equirectangular(φ1) + Aitoff)/2 — the two implementations share
    _wt_xy/_aitoff_xy only up to the mean, so this cross-pins both."""
    R = proj_fn.R
    pts = [(lo, la) for lo in (-179.0, -120.0, -45.0, 0.0, 60.0, 150.0, 179.0)
           for la in (-85.0, -40.0, 0.0, 33.0, 70.0, 89.0)]
    df = spark.createDataFrame(pts, schema="lon double, lat double")
    out = proj_fn.aitoff_inverse(proj_fn.aitoff(df)).collect()
    for r in out:
        assert abs(r["lat2"] - r["lat"]) < 1e-8, r
        dlon = (r["lon2"] - r["lon"] + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-8, r
    # exact axes
    ax = spark.createDataFrame([(0.0, 37.0), (98.0, 0.0)],
                               schema="lon double, lat double")
    got = {(r["lon"], r["lat"]): (r["atx"], r["aty"])
           for r in proj_fn.aitoff(ax).collect()}
    assert abs(got[(0.0, 37.0)][1] - R * math.radians(37.0)) < 1e-9
    assert abs(got[(0.0, 37.0)][0]) < 1e-9
    assert abs(got[(98.0, 0.0)][0] - R * math.radians(98.0)) < 1e-9
    # Winkel Tripel = mean of equirect(phi1) and Aitoff, exactly
    both = proj_fn.winkel_tripel(proj_fn.aitoff(df)).collect()
    f1 = math.acos(2.0 / math.pi)
    for r in both:
        ex = R * math.radians(r["lon"]) * math.cos(f1)
        ey = R * math.radians(r["lat"])
        assert abs(r["wtx"] - 0.5 * (ex + r["atx"])) < 1e-9 * max(1.0, abs(r["wtx"]))
        assert abs(r["wty"] - 0.5 * (ey + r["aty"])) < 1e-9 * max(1.0, abs(r["wty"]))
