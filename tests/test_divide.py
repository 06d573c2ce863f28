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


def _ref_divide(xs, ys, rects):
    """Independent reference: axis-aligned interval overlap per segment
    (no Cyrus–Beck anywhere), chained by the spec's vertex-merge rule.
    Exact when coordinates are dyadic and rect bounds never coincide
    with vertices."""
    agg = {}
    prev = None
    for i in range(len(xs) - 1):
        ax, ay, bx, by = xs[i], ys[i], xs[i + 1], ys[i + 1]
        horiz = ay == by
        a, b = (ax, bx) if horiz else (ay, by)
        fixed = ay if horiz else ax
        length = abs(b - a)
        ivs = []
        for pid, x0, y0, x1, y1 in rects:
            lo_f, hi_f = (y0, y1) if horiz else (x0, x1)
            if not (lo_f < fixed < hi_f):
                continue
            lo_v, hi_v = (x0, x1) if horiz else (y0, y1)
            o0, o1 = max(lo_v, min(a, b)), min(hi_v, max(a, b))
            if o1 <= o0:
                continue
            w0, w1 = (o0 - a, o1 - a) if a < b else (a - o1, a - o0)
            ivs.append((w0, w1, pid))
        ivs.sort()
        subs = []
        w = 0.0
        for w0, w1, pid in ivs:
            if w0 > w:
                subs.append((w, w0, -1))
            subs.append((w0, w1, pid))
            w = w1
        if w < length:
            subs.append((w, length, -1))
        for w0, w1, pid in subs:
            e = agg.setdefault(pid, [0, 0.0])
            if not (w0 == 0.0 and prev == pid):
                e[0] += 1
            e[1] += w1 - w0
            prev = pid
    return {k: (v[0], v[1]) for k, v in agg.items()}


def test_divide_walk_random_sweep():
    """Hypothesis sweep of the per-arc walk kernel (no Spark): random
    axis-aligned polylines on ODD coordinates with EVEN power-of-two
    steps vs disjoint rects on EVEN bounds — every crossing exact, so
    the Cyrus–Beck walk must equal the interval-overlap reference
    EXACTLY (counts and lengths)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blocks = st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        unique=True,
        min_size=1,
        max_size=6,
    )
    steps = st.lists(
        st.tuples(st.sampled_from([0, 1]), st.sampled_from([-8, -4, -2, 2, 4, 8])),
        min_size=1,
        max_size=25,
    )
    start = st.tuples(st.integers(0, 19), st.integers(0, 19))

    @settings(max_examples=200, deadline=None)
    @given(blocks=blocks, steps=steps, start=start)
    def run(blocks, steps, start):
        xs, ys = [float(start[0] * 2 + 1)], [float(start[1] * 2 + 1)]
        for axis, d in steps:
            xs.append(xs[-1] + (d if axis == 0 else 0))
            ys.append(ys[-1] + (d if axis == 1 else 0))
        rects = [
            (10 * bx + by, 10.0 * bx + 2, 10.0 * by + 2, 10.0 * bx + 8, 10.0 * by + 8)
            for bx, by in blocks
        ]
        cands = [
            (
                pid,
                np.array(
                    [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
                ),
            )
            for pid, x0, y0, x1, y1 in rects
        ]
        got = {
            k: (v[0], v[1]) for k, v in ov._divide_walk(
                np.asarray(xs), np.asarray(ys), cands
            ).items()
        }
        want = _ref_divide(xs, ys, rects)
        assert got == want
        total = sum(v[1] for v in got.values())
        seg_total = sum(
            abs(xs[i + 1] - xs[i]) + abs(ys[i + 1] - ys[i])
            for i in range(len(xs) - 1)
        )
        assert total == seg_total

    run()


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
