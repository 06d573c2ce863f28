"""-points inner (pole of inaccessibility) and -dots over general
features: interiority, clearance, and determinism properties."""

from __future__ import annotations

import numpy as np

from mapshaper_spark import fixtures, geometry
from mapshaper_spark.operators import points as points_op
from mapshaper_spark.sources import testdata


def _rings(pid):
    return fixtures.multiring_rings()[pid]


def test_pole_is_inside_every_feature(spark):
    out = {r["poly_id"]: r for r in points_op.inner_points(testdata.holed_features(spark)).collect()}
    assert set(out) == {0, 1, 2, 3}
    for pid, r in out.items():
        rings = _rings(pid)
        assert geometry.pip_rings(np.array([r["ix"]]), np.array([r["iy"]]), rings)[0], pid
        assert r["clearance"] > 0.0


def test_pole_beats_centroid_where_centroid_fails():
    """The donut's vertex centroid is the hole center — outside the
    feature. The pole must be in the ring body with real clearance."""
    rings = _rings(0)
    cx = float(np.mean(rings[0][:, 0]))
    cy = float(np.mean(rings[0][:, 1]))
    assert not geometry.pip_rings(np.array([cx]), np.array([cy]), rings)[0]
    x, y, d = points_op.pole_of_inaccessibility(rings)
    assert geometry.pip_rings(np.array([x]), np.array([y]), rings)[0]
    # optimum is a corner pocket: equidistant from two outer walls and
    # the hole corner — clearance 4·(2−√2) ≈ 5.858, beating the 5.0 of
    # any mid-wall point. The descent must find it (within refinement).
    # t = dist to both outer walls = (10−t)·√2 to the hole corner
    # → t = 20 − 10√2
    want = 20.0 - 10.0 * 2.0**0.5  # 5.8578...
    assert abs(d - want) < 1e-2


def test_pole_square_is_center():
    square = [np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])]
    x, y, d = points_op.pole_of_inaccessibility(square)
    assert abs(x - 5.0) < 1e-3 and abs(y - 5.0) < 1e-3
    assert abs(d - 5.0) < 1e-3


def test_dots_exact_count_inside_deterministic(spark):
    feats = testdata.holed_features(spark)
    a = points_op.dots_fill(feats, dots_per_feature=50).collect()
    b = points_op.dots_fill(feats, dots_per_feature=50).collect()
    assert len(a) == 4 * 50
    key = lambda r: (r["poly_id"], r["dot_idx"])  # noqa: E731
    assert sorted([(key(r), r["x"], r["y"]) for r in a]) == sorted(
        [(key(r), r["x"], r["y"]) for r in b]
    )
    for r in a:
        rings = _rings(r["poly_id"])
        assert geometry.pip_rings(np.array([r["x"]]), np.array([r["y"]]), rings)[0]
