"""-stitch (antimeridian seam removal) — kernel goldens, bitwise
passthrough, randomized split→stitch round-trips, loud degeneracies,
and the distributed operator vs the kernel."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapshaper_spark import fixtures, geometry
from mapshaper_spark.operators import stitch as stitch_op
from mapshaper_spark.sources import testdata


def _pieces(fid: int):
    return [
        (p["piece_id"], np.array(p["xs"]), np.array(p["ys"]))
        for p in fixtures.STITCH_PIECES
        if p["feature_id"] == fid
    ]


def test_simple_split_rect_golden():
    rings, n_seam = stitch_op.stitch_feature(_pieces(0))
    assert n_seam == 2
    assert len(rings) == 1
    _, xs, ys, _ = rings[0]
    assert list(zip(xs, ys)) == [
        (180.0, 10.0), (170.0, 10.0), (170.0, 0.0),
        (180.0, 0.0), (190.0, 0.0), (190.0, 10.0),
    ]
    assert geometry.shoelace_area(xs, ys) == 200.0


def test_untouched_feature_passthrough_bitwise():
    rings, n_seam = stitch_op.stitch_feature(_pieces(1))
    assert n_seam == 0
    assert len(rings) == 2
    for (_, xs, ys, _), p in zip(rings, _pieces(1)):
        assert xs.tolist() == p[1].tolist()
        assert ys.tolist() == p[2].tolist()


def test_double_crossing_chain_golden():
    # f3: H-shaped west piece, two east rectangles -> ONE ring whose
    # chain alternates sides twice; coordinates fully pinned.
    rings, n_seam = stitch_op.stitch_feature(_pieces(3))
    assert n_seam == 4
    assert len(rings) == 1
    _, xs, ys, _ = rings[0]
    assert list(zip(xs, ys)) == [
        (180.0, 30.0), (174.0, 30.0), (174.0, 0.0), (180.0, 0.0),
        (186.0, 0.0), (186.0, 10.0), (180.0, 10.0), (176.0, 10.0),
        (176.0, 20.0), (180.0, 20.0), (186.0, 20.0), (186.0, 30.0),
    ]
    assert geometry.shoelace_area(xs, ys) == 260.0


@pytest.mark.parametrize("fid", [0, 1, 2, 3, 4])
def test_area_equals_sum_of_piece_areas(fid):
    pieces = _pieces(fid)
    rings, _ = stitch_op.stitch_feature(pieces)
    stitched = sum(geometry.shoelace_area(xs, ys) for _, xs, ys, _ in rings)
    raw = sum(geometry.shoelace_area(xs, ys) for _, xs, ys in pieces)
    assert stitched == raw  # exact: seam edges cancel pairwise


def test_holed_crossing_keeps_hole_orientation():
    rings, _ = stitch_op.stitch_feature(_pieces(4))
    areas = sorted(geometry.shoelace_area(xs, ys) for _, xs, ys, _ in rings)
    assert areas == [-48.0, 480.0]


def _split_rect(x0, x1, y0, y1):
    """Split the unwrapped CCW rect [x0,x1]x[y0,y1] (x0<180<x1) at the
    seam the way a clip does: west piece keeps its frame, east piece
    stores at x-360, both rotated so the closing edge is the seam cut."""
    west = (
        np.array([180.0, float(x0), float(x0), 180.0]),
        np.array([float(y1), float(y1), float(y0), float(y0)]),
    )
    ex = x1 - 360.0
    east = (
        np.array([-180.0, float(ex), float(ex), -180.0]),
        np.array([float(y0), float(y0), float(y1), float(y1)]),
    )
    return west, east


@settings(max_examples=60, deadline=None)
@given(
    x0=st.integers(120, 179),
    x1=st.integers(181, 240),
    y0=st.integers(-80, 60),
    dy=st.integers(1, 20),
)
def test_random_rect_round_trip(x0, x1, y0, dy):
    y1 = y0 + dy
    west, east = _split_rect(x0, x1, y0, y1)
    rings, n_seam = stitch_op.stitch_feature(
        [(0, west[0], west[1]), (1, east[0], east[1])]
    )
    assert n_seam == 2
    assert len(rings) == 1
    _, xs, ys, _ = rings[0]
    assert len(xs) == 6
    assert geometry.shoelace_area(xs, ys) == float((x1 - x0) * (y1 - y0))
    # continuity: unwrapped output never jumps across the seam
    dx = np.abs(np.diff(np.r_[xs, xs[0]]))
    assert dx.max() < 180.0
    # the east piece landed shifted +360 back into the west frame
    assert xs.max() == float(x1)


def test_unmatched_endpoint_raises():
    west, _ = _split_rect(170, 190, 0, 10)
    with pytest.raises(ValueError, match="unmatched seam endpoint"):
        stitch_op.stitch_feature([(0, west[0], west[1])])


def test_ambiguous_junction_raises():
    # two west pieces whose paths END at the same junction y
    w1, e1 = _split_rect(170, 190, 0, 10)
    w2, _ = _split_rect(160, 185, 0, 30)
    with pytest.raises(ValueError, match="ambiguous seam junction"):
        stitch_op.stitch_feature([(0, w1[0], w1[1]), (1, w2[0], w2[1]),
                                  (2, e1[0], e1[1])])


def test_circumpolar_band_raises_wrap_imbalance():
    # a band around the globe cut at the seam: one piece, two seam
    # edges, chain closes with a +360 residue -> loud, never silent
    xs = np.array([-180.0, 180.0, 180.0, -180.0])
    ys = np.array([60.0, 60.0, 70.0, 70.0])
    with pytest.raises(ValueError, match="wrap imbalance"):
        stitch_op.stitch_feature([(0, xs, ys)])


def test_distributed_operator_matches_kernel(spark):
    rows = (
        stitch_op.stitch_antimeridian(testdata.stitch_pieces(spark))
        .orderBy("feature_id", "ring_id")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.feature_id, []).append((r.xs, r.ys, r.area))
    for fid in sorted(got):
        rings, _ = stitch_op.stitch_feature(_pieces(fid))
        assert len(rings) == len(got[fid])
        for (xs, ys, area), (_, kxs, kys, _) in zip(got[fid], rings):
            assert xs == kxs.tolist()
            assert ys == kys.tolist()
            assert area == geometry.shoelace_area(kxs, kys)


# --------------------------------------------------------- polylines ---


def _line_pieces(fid: int):
    return [
        (p["piece_id"], np.array(p["xs"]), np.array(p["ys"]))
        for p in fixtures.STITCH_LINE_PIECES
        if p["feature_id"] == fid
    ]


def test_polyline_simple_join_golden():
    lines, n_links = stitch_op.stitch_polyline_feature(_line_pieces(0))
    assert n_links == 1
    assert len(lines) == 1
    _, xs, ys = lines[0]
    assert list(zip(xs, ys)) == [(170.0, 1.0), (180.0, 1.0), (186.0, 1.0)]


def test_polyline_double_crossing_golden():
    lines, n_links = stitch_op.stitch_polyline_feature(_line_pieces(2))
    assert n_links == 2
    _, xs, ys = lines[0]
    assert list(zip(xs, ys)) == [
        (176.0, 2.0), (180.0, 2.0), (184.0, 2.0),
        (184.0, 6.0), (180.0, 6.0), (172.0, 6.0),
    ]


def test_polyline_untouched_and_unpartnered_terminal():
    lines, n_links = stitch_op.stitch_polyline_feature(_line_pieces(1))
    assert (n_links, len(lines)) == (0, 1)
    assert lines[0][1].tolist() == [10.0, 13.0, 13.0]
    # a seam endpoint with no partner is a terminal, not an error
    lines3, n_links3 = stitch_op.stitch_polyline_feature(_line_pieces(3))
    assert (n_links3, len(lines3)) == (1, 2)


def test_polyline_ambiguous_and_circular_raise():
    import pytest as _pytest

    a = (0, np.array([170.0, 180.0]), np.array([5.0, 5.0]))
    b = (1, np.array([160.0, 180.0]), np.array([5.0, 5.0]))
    with _pytest.raises(ValueError, match="ambiguous polyline"):
        stitch_op.stitch_polyline_feature([a, b])
    # circular chain: two pieces joining each other end-to-start twice
    d = (1, np.array([-180.0, -180.0]), np.array([2.0, 1.0]))
    e = (0, np.array([180.0, 180.0]), np.array([1.0, 2.0]))
    with _pytest.raises(ValueError, match="circular polyline"):
        stitch_op.stitch_polyline_feature([e, d])


def test_polyline_distributed_matches_kernel(spark):
    from mapshaper_spark.sources import testdata as td

    rows = (
        stitch_op.stitch_polylines(td.stitch_line_pieces(spark))
        .orderBy("feature_id", "line_id")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r.feature_id, []).append((r.xs, r.ys))
    for fid in sorted(got):
        lines, _ = stitch_op.stitch_polyline_feature(_line_pieces(fid))
        assert [(l[1].tolist(), l[2].tolist()) for l in lines] == got[fid]
