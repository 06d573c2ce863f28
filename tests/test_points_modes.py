"""-points vertices|vertices2|midpoints|interpolated mode goldens
[UPSTREAM mapshaper-points.mjs — public knowledge of mbloch/mapshaper;
/root/reference is empty, SURVEY.md §0]. The oracle parity suite
hash-checks the full outputs; these pin the hand-derivable semantics:
midpoint segment selection (including a midpoint landing exactly on a
shared vertex), interpolation endpoints, and the vertices/vertices2
dedup contract."""

import pytest

from mapshaper_spark import fixtures
from mapshaper_spark.operators import points as points_op
from mapshaper_spark.operators import topology
from mapshaper_spark.sources import testdata


@pytest.fixture(scope="module")
def divide_lines(spark):
    return topology.arcs_df(spark, fixtures.DIVIDE_LINES)


def test_midpoints_goldens(spark, divide_lines):
    rows = {
        r["arc_id"]: (r["px"], r["py"])
        for r in points_op.points_midpoints(divide_lines).collect()
    }
    # arc 0: L=20 along y=3 -> (10, 3); arc 1: L=16 along x=4 -> (4, 7)
    assert rows[0] == (10.0, 3.0)
    assert rows[1] == (4.0, 7.0)
    # arc 2: lens 2,2,4,4,2,4,2 (L=20) -> h=10 falls inside seg 3
    # (13.5,3)->(13.5,7) at t=0.5 -> (13.5, 5)
    assert rows[2] == (13.5, 5.0)
    # arc 3: lens 1,2,2,4,4 (L=13) -> h=6.5 inside seg 3 (5,9)->(9,9)
    # at t=0.375 -> (6.5, 9)
    assert rows[3] == (6.5, 9.0)
    # arc 4: lens 2,2,4 (L=8) -> h=4 lands EXACTLY on the shared vertex
    # between seg 1 and seg 2: min seg_i keeps seg 1 at t=1 -> (5, 13)
    assert rows[4] == (5.0, 13.0)
    assert len(rows) == len(fixtures.DIVIDE_LINES)


def test_interpolated_goldens(spark, divide_lines):
    out = points_op.points_interpolated(divide_lines, interval=2.0)
    rows = {
        (r["arc_id"], r["k"]): (r["px"], r["py"]) for r in out.collect()
    }
    # arc 4 (L=8, lens 2,2,4): k=0..4 at every 2 units
    assert rows[(4, 0)] == (3.0, 11.0)
    assert rows[(4, 1)] == (5.0, 11.0)
    assert rows[(4, 2)] == (5.0, 13.0)
    assert rows[(4, 3)] == (7.0, 13.0)
    assert rows[(4, 4)] == (9.0, 13.0)
    # arc 3 (L=13): k runs 0..6 only — no point past the last multiple
    ks3 = sorted(k for (a, k) in rows if a == 3)
    assert ks3 == list(range(7))
    # k=0 is always the start vertex
    for a in fixtures.DIVIDE_LINES:
        assert rows[(a["arc_id"], 0)] == (a["xs"][0], a["ys"][0])
    # every k*d point lies ON the arc: for axis-aligned fixture arcs,
    # consecutive interpolated points are exactly interval/multiple
    # steps apart along one axis
    assert rows[(0, 5)] == (10.0, 3.0)  # matches the midpoint golden


def test_interpolated_backward_sequence_guard(spark):
    # a segment straddling no multiple (ceil(s0/d) > floor(s1/d)) must
    # contribute NOTHING (Spark sequence() would run backward unguarded,
    # fabricating candidates outside the segment): seg 1 spans
    # s = 0.5..1.5 with d=2 -> only seg 0's k=0 start point survives
    lines = topology.arcs_df(
        spark, [{"arc_id": 7, "xs": [0.0, 0.5, 1.5], "ys": [0.0, 0.0, 0.0]}]
    )
    out = points_op.points_interpolated(lines, interval=2.0).collect()
    assert [(r["arc_id"], r["k"], r["px"], r["py"]) for r in out] == [
        (7, 0, 0.0, 0.0)
    ]


def test_degenerate_zero_length_guards(spark):
    # zero-length segments must never produce NaN: an arc with a
    # doubled vertex (and one entirely degenerate point-arc) keeps
    # exact coordinates in every mode
    lines = topology.arcs_df(
        spark,
        [
            # doubled vertex mid-arc; L = 4, midpoint on the dup vertex
            {"arc_id": 0, "xs": [0.0, 2.0, 2.0, 4.0], "ys": [0.0] * 4},
            # all vertices identical: L = 0
            {"arc_id": 1, "xs": [5.0, 5.0, 5.0], "ys": [7.0, 7.0, 7.0]},
        ],
    )
    mid = {r["arc_id"]: (r["px"], r["py"])
           for r in points_op.points_midpoints(lines).collect()}
    assert mid[0] == (2.0, 0.0)
    assert mid[1] == (5.0, 7.0)  # midpoint of a point is the point
    interp = [(r["arc_id"], r["k"], r["px"], r["py"])
              for r in points_op.points_interpolated(lines, 2.0).collect()]
    assert sorted(interp) == [
        (0, 0, 0.0, 0.0), (0, 1, 2.0, 0.0), (0, 2, 4.0, 0.0)
    ]  # arc 1 has no nonzero segment -> no rows, never NaN


def test_endpoints_goldens(spark, divide_lines):
    rows = {
        (r["arc_id"], r["end_idx"]): (r["px"], r["py"])
        for r in points_op.points_endpoints(divide_lines).collect()
    }
    for a in fixtures.DIVIDE_LINES:
        assert rows[(a["arc_id"], 0)] == (a["xs"][0], a["ys"][0])
        assert rows[(a["arc_id"], 1)] == (a["xs"][-1], a["ys"][-1])
    assert len(rows) == 2 * len(fixtures.DIVIDE_LINES)


def test_vertices_dedup_contract(spark):
    layer = testdata.holed_features(spark)
    uniq = points_op.points_vertices(layer, unique=True)
    dup = points_op.points_vertices(layer, unique=False)
    n_all = sum(
        len(r) for f in fixtures.HOLED_FEATURES for r in f["rings"]
    )
    assert dup.count() == n_all
    # vertices2 carries (ring_idx, vi) provenance; vertices drops it
    assert set(dup.columns) == {"poly_id", "ring_idx", "vi", "x", "y"}
    assert set(uniq.columns) == {"poly_id", "x", "y"}
    # unique <= all, and equals the python-side dedup exactly
    expect = {
        (f["poly_id"], x, y)
        for f in fixtures.HOLED_FEATURES
        for ring in f["rings"]
        for x, y in ring
    }
    got = {(r["poly_id"], r["x"], r["y"]) for r in uniq.collect()}
    assert got == expect
