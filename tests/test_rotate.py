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
