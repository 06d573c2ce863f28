"""-dashlines semantics: period layout, cross-segment merge, tail clip."""

from __future__ import annotations

from mapshaper_spark import fixtures
from mapshaper_spark.operators import points as points_op
from mapshaper_spark.operators import topology


def _rows(df):
    return {
        (r["arc_id"], r["dash_idx"]): r["dash_len"] for r in df.collect()
    }


def test_dashlines_layout_and_tail_clip(spark):
    lines = topology.arcs_df(spark, fixtures.DIVIDE_LINES)
    out = _rows(points_op.dashlines(lines, dash=1.5, gap=0.5))
    # arc 0 has total length 20 -> dashes 0..9, all full
    assert {k: v for (a, k), v in out.items() if a == 0} == {
        i: 1.5 for i in range(10)
    }
    # arc 3 has total length 13 -> last dash [12, 13.5) clips to 1.0
    a3 = {k: v for (a, k), v in out.items() if a == 3}
    assert a3 == {0: 1.5, 1: 1.5, 2: 1.5, 3: 1.5, 4: 1.5, 5: 1.5, 6: 1.0}
    # dash 0 of arc 0 spans two segments ([0,1] + [1,3]) and still sums
    # to one full row — the groupBy merge
    assert out[(0, 0)] == 1.5


def test_dashlines_gap_only_segment_emits_nothing(spark):
    # a segment entirely inside a gap window: arc of length 0.5 placed
    # at offset 0 with dash=0.25 gap=0.75 -> dash 0 = [0, 0.25)
    lines = topology.arcs_df(
        spark, [{"arc_id": 5, "xs": [0.0, 0.5], "ys": [0.0, 0.0]}]
    )
    out = _rows(points_op.dashlines(lines, dash=0.25, gap=0.75))
    assert out == {(5, 0): 0.25}
