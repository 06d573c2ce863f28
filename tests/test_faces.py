"""Distributed -polygons (operators/faces.py): per-cell face walks
merged by border-segment signature must reproduce the global planar
face walk exactly — same face count, same (n_arcs, n_vertices) and the
same areas (exact on dyadic fixtures, 1e-9-relative otherwise)."""

from __future__ import annotations

import numpy as np
import pytest

from mapshaper_spark import fixtures
from mapshaper_spark.operators import faces, topology


def _global_multiset(arcs: list[dict]):
    out = topology.polygons_from_arcs(arcs)
    return sorted((f["n_arcs"], len(f["xs"]), round(f["area"], 9)) for f in out)


def _tiled_multiset(spark, arcs: list[dict], n_cells: int):
    df = topology.arcs_df(spark, arcs)
    rows = faces.polygons_from_arcs_tiled(df, n_cells=n_cells).collect()
    return sorted((r.n_arcs, r.n_vertices, round(r.area, 9)) for r in rows)


def test_tiled_equals_global_grid4(spark):
    """4x4 unit grid (grid-ALIGNED integer data — the off-grain origin
    must sidestep it automatically): 16 faces of 4 arcs / 4 vertices /
    area exactly 1.0."""
    got = _tiled_multiset(spark, fixtures.GRID_ARCS, n_cells=8)
    assert got == _global_multiset(fixtures.GRID_ARCS)
    assert len(got) == 16
    assert all(t == (4, 4, 1.0) for t in got)
    # dyadic pitch + dyadic origin + axis-parallel arcs → piece areas
    # are exact dyadics and sum to exactly 1.0
    df = topology.arcs_df(spark, fixtures.GRID_ARCS)
    areas = [r.area for r in faces.polygons_from_arcs_tiled(df, n_cells=8).collect()]
    assert all(a == 1.0 for a in areas)


def test_tiled_equals_global_10k_arcs(spark):
    """VERDICT r2 #2 done-criterion: a >=10k-arc layer through the
    distributed plan, proven exactly equal to the global construction.
    72x72 unit grid -> 10512 arcs, 5184 faces."""
    arcs, _ = fixtures._make_grid_topology(72)
    assert len(arcs) >= 10_000
    got = _tiled_multiset(spark, arcs, n_cells=16)
    want = _global_multiset(arcs)
    assert len(got) == 5184
    assert got == want


def test_tiled_diagonal_arcs(spark):
    """Non-axis-parallel crossings: two triangles sharing an edge.
    Arc endpoints meet at junctions; diagonal arcs cross cell lines at
    non-dyadic points — areas match to 1e-9 relative."""
    arcs = [
        {"arc_id": 0, "xs": [0.0, 8.0], "ys": [0.0, 0.0]},
        {"arc_id": 1, "xs": [8.0, 3.0], "ys": [0.0, 7.0]},
        {"arc_id": 2, "xs": [3.0, 0.0], "ys": [7.0, 0.0]},
        {"arc_id": 3, "xs": [8.0, 11.0], "ys": [0.0, 6.5]},
        {"arc_id": 4, "xs": [11.0, 3.0], "ys": [6.5, 7.0]},
    ]
    want = _global_multiset(arcs)
    got = _tiled_multiset(spark, arcs, n_cells=4)
    assert [(a, v) for a, v, _ in got] == [(a, v) for a, v, _ in want]
    for (_, _, ga), (_, _, wa) in zip(got, want):
        assert ga == pytest.approx(wa, rel=1e-9)


def test_tiled_island_and_donut_semantics(spark):
    """Closed-ring arcs: a big CCW square containing a small CCW square
    island. The global walk does NOT subtract enclosed islands from the
    container face (negative traversals drop; containment is not
    resolved) — the tiled construction must reproduce that same
    double-count, with the island a singleton component when it sits
    inside one cell and a merged component when it spans cells."""
    big = {
        "arc_id": 0,
        "xs": [0.0, 16.0, 16.0, 0.0, 0.0],
        "ys": [0.0, 0.0, 16.0, 16.0, 0.0],
    }
    small = {
        "arc_id": 1,
        "xs": [6.0, 10.0, 10.0, 6.0, 6.0],
        "ys": [6.0, 6.0, 10.0, 10.0, 6.0],
    }
    arcs = [big, small]
    want = _global_multiset(arcs)
    # container face area 256 (not 256-16), island face 16
    assert [round(a, 6) for _, _, a in want] == [16.0, 256.0]
    got = _tiled_multiset(spark, arcs, n_cells=4)
    assert got == want


def test_split_arcs_pieces_cover_arc(spark):
    """Every split piece chain re-concatenates to the original arc and
    each piece lies in exactly one cell (bbox inside the cell box)."""
    arcs = [
        {"arc_id": 7, "xs": [0.0, 5.0, 5.5, 9.0], "ys": [0.5, 4.0, 0.25, 3.0]}
    ]
    df = topology.arcs_df(spark, arcs)
    ox, oy, pitch = -1.0 - 9 / 32 * 4.0, -1.0 - 9 / 32 * 4.0, 4.0
    rows = faces._split_arcs(df, ox, oy, pitch).collect()
    rows.sort(key=lambda r: r.piece_seq)
    # chain continuity: piece k ends where piece k+1 starts (same floats)
    for a, b in zip(rows, rows[1:]):
        assert (a.xs[-1], a.ys[-1]) == (b.xs[0], b.ys[0])
    # full reconstruction of original vertex set in order
    xs = [rows[0].xs[0]] + [x for r in rows for x in r.xs[1:]]
    recon = [x for x in xs]
    for v in arcs[0]["xs"]:
        assert v in recon
    # each piece inside its cell box
    for r in rows:
        x0, x1 = ox + r.ix * pitch, ox + (r.ix + 1) * pitch
        y0, y1 = oy + r.iy * pitch, oy + (r.iy + 1) * pitch
        assert min(r.xs) >= x0 - 1e-12 and max(r.xs) <= x1 + 1e-12
        assert min(r.ys) >= y0 - 1e-12 and max(r.ys) <= y1 + 1e-12


@pytest.mark.parametrize("driver_limit", [2_000_000, 0])
def test_cc_labels_chain_and_singleton(spark, driver_limit):
    # both routes of the size-routed CC: driver union-find and the
    # distributed hash-min + pointer-jump loop must label identically
    import pandas as pd

    nodes = spark.createDataFrame(
        pd.DataFrame({"piece_id": [1, 2, 3, 4, 5, 9]}), schema="piece_id long"
    )
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4]}), schema="src long, dst long"
    )
    lbl = {
        r.piece_id: r.label
        for r in faces._cc_labels(nodes, edges, driver_limit=driver_limit).collect()
    }
    assert lbl == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 9: 9}


@pytest.mark.parametrize("driver_limit", [2_000_000, 0])
def test_rank_labels_both_routes(spark, driver_limit):
    import pandas as pd

    lab = spark.createDataFrame(
        pd.DataFrame({"label": [42, 7, 100, 3]}), schema="label long"
    )
    got = {
        r.label: r.face_id
        for r in faces._rank_labels(lab, driver_limit=driver_limit).collect()
    }
    assert got == {3: 0, 7: 1, 42: 2, 100: 3}


@pytest.mark.parametrize("driver_limit", [2_000_000, 0])
def test_rank_labels_string_keys_both_routes(spark, driver_limit):
    """String-key ranking (the rings_table_from_emitter poly_id path —
    r5: the export adapter's unpartitioned dense_rank window moved to
    this size-routed rank): both routes produce the same dense index
    in UTF8-binary == code-point order, including the composite-key
    separator and non-ASCII keys."""
    import pandas as pd

    ks = ["b\x1f10", "a", "b\x1f2", "éclair", "a\x1f1"]
    lab = spark.createDataFrame(pd.DataFrame({"key": ks}), schema="key string")
    got = {
        r.key: r.poly_id
        for r in faces._rank_labels(
            lab, driver_limit=driver_limit, col="key", out="poly_id",
            dtype="string",
        ).collect()
    }
    want = {k: i for i, k in enumerate(sorted(ks))}
    assert got == want


def test_tiled_full_plan_distributed_route(spark, monkeypatch):
    """The fused driver union-find route and the distributed CC +
    range-partitioned rank route must produce identical faces through
    the WHOLE tiled plan (monkeypatched _DRIVER_LIMIT=0 forces the
    distributed branch on a fixture-sized layer)."""
    arcs = fixtures.GRID_ARCS
    fast = _tiled_multiset(spark, arcs, n_cells=8)
    monkeypatch.setattr(faces, "_DRIVER_LIMIT", 0)
    slow = _tiled_multiset(spark, arcs, n_cells=8)
    assert fast == slow == _global_multiset(arcs)


def test_tiled_faces_offset_heavy_exact(spark):
    """r4 probe find: the 12x12 unit-grid topology shifted to 2e6-
    magnitude coordinates returned per-face areas of 1.0 +- 4.9e-4
    through the raw sequential shoelace (cross products ~|coord|^2,
    areas ~1). The gated shoelace_seq_local anchors at floor(bbox-min)
    when |coord| > 64x extent — every face must come back exactly 1.0
    at the offset too (integer-plus-offset coordinates stay exact
    through the anchored form)."""
    from mapshaper_spark import fixtures
    from mapshaper_spark.operators import faces as faces_op
    from mapshaper_spark.operators import topology

    arcs, _ = fixtures._make_grid_topology(12)
    OFF = 1999997.123
    arcs_off = [
        {**a, "xs": [v + OFF for v in a["xs"]], "ys": [v + OFF for v in a["ys"]]}
        for a in arcs
    ]
    rows = faces_op.polygons_from_arcs_tiled(
        topology.arcs_df(spark, arcs_off), n_cells=8
    ).collect()
    assert len(rows) == 144
    assert all(round(r["area"], 9) == 1.0 for r in rows)
