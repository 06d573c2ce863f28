"""-divide semantics: piece merging, outside gaps, candidate-free arcs."""

from __future__ import annotations

from mapshaper_spark import fixtures
from mapshaper_spark.operators import overlay as ov
from mapshaper_spark.operators import topology
from mapshaper_spark.sources import testdata


def _rows(df):
    return {
        (r["arc_id"], r["poly_id"]): (r["n_pieces"], r["len_sum"])
        for r in df.collect()
    }


def test_divide_fixture_goldens(spark):
    """Hand-derived piece structure of the whole fixture — stricter than
    the oracle in that the expectations are independent re-derivations,
    not formulas."""
    out = _rows(
        ov.divide_polylines(
            topology.arcs_df(spark, fixtures.DIVIDE_LINES),
            testdata.divide_rects(spark),
        )
    )
    assert out == {
        # arc 0: crosses rects 0, 1, 3 (4 outside gaps of 2 each)
        (0, -1): (4, 8.0),
        (0, 0): (1, 4.0),
        (0, 1): (1, 4.0),
        (0, 3): (1, 4.0),
        # arc 1: vertical through rects 0 and 2
        (1, -1): (3, 4.0),
        (1, 0): (1, 8.0),
        (1, 2): (1, 4.0),
        # arc 2: staircase — multi-segment pieces merge across vertices
        # strictly inside the rect; the long middle outside piece merges
        # across two outside vertices
        (2, -1): (3, 7.5),
        (2, 1): (1, 6.0),
        (2, 3): (1, 6.5),
        # arc 3: bbox-candidate-free — one whole-line outside piece
        (3, -1): (1, 13.0),
        # arc 4: entirely inside rect 2 — no outside row at all
        (4, 2): (1, 8.0),
    }


def test_divide_diagonal_exact_345(spark):
    """A diagonal crossing stays exact when the geometry is a scaled
    3-4-5 triangle: segment (0,1)->(8,7) crosses rect [2,6]x[0,8] at
    t=0.25 / t=0.75 — inside length 5, two outside pieces of 2.5."""
    lines = topology.arcs_df(
        spark, [{"arc_id": 9, "xs": [0.0, 8.0], "ys": [1.0, 7.0]}]
    )
    rects = testdata.divide_rects(spark)
    out = _rows(ov.divide_polylines(lines, rects))
    assert out[(9, 0)] == (1, 5.0)
    assert out[(9, -1)] == (2, 5.0)


def test_divide_reentry_does_not_merge(spark):
    """A line that exits a rect and re-enters it gets TWO pieces for
    that rect (the shared vertex sits outside, so no merge)."""
    # rect 0 is [2,6]x[0,8]; V path dips below y=0 between two crossings
    lines = topology.arcs_df(
        spark,
        [{"arc_id": 7, "xs": [3.0, 3.0, 5.0, 5.0], "ys": [1.0, -1.0, -1.0, 1.0]}],
    )
    out = _rows(ov.divide_polylines(lines, testdata.divide_rects(spark)))
    assert out[(7, 0)] == (2, 2.0)
    assert out[(7, -1)] == (1, 4.0)
