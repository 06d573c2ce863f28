"""-clean gap fill [upstream -clean's gap-filling half]: enclosed union
holes under gap-fill-area dissolve into the neighbor with the longest
shared border (min-id tie-break); larger holes are preserved. The
driver oracle (clean_gap_fill) checks the full output against the
recursive-CTE flood-fill elementary-cell oracle; these tests pin the
semantics the oracle can't see — winner identity per gap, the tiled
twin, and the offset-heavy local-frame path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapshaper_spark import fixtures
from mapshaper_spark.operators import overlay

EXPECTED = {
    ("a", 0): 4.0,
    ("a", 1): 7.25,
    ("a", 2): 16.25,  # L-shaped neighbor wins (blen 7.0 vs 5.5 / 1.5)
    ("b", 3): 8.0,    # 18.0625 hole > gap_fill_area=10 -> preserved
    ("b", 4): 8.0,
    ("b", 5): 6.0,
    ("b", 6): 6.0,
    ("c", 7): 12.0,   # exact 4-way tie at blen 2.0 -> min feature_id
    ("c", 8): 8.0,
    ("c", 9): 3.0,
    ("c", 10): 3.5,
    ("d", 11): 4.0,   # overlaps resolve min-id first...
    ("d", 12): 7.25,
    ("d", 13): 16.25,  # ...then the gap fills into the L
    ("d", 14): 0.75,
}


def _feats(spark, dx=0.0, dy=0.0):
    return spark.createDataFrame(
        fixtures.gapfill_pdf(dx=dx, dy=dy),
        schema="feature_id int, key string, xs array<double>, ys array<double>",
    )


def test_gap_fill_exact(spark):
    out = overlay.clean_gap_fill(_feats(spark), fixtures.GAP_FILL_AREA)
    got = {(r.key, r.feature_id): r.clean_area_r for r in out.collect()}
    assert got == EXPECTED


def test_gap_fill_hole_detection(spark):
    """Every group's union carries exactly one hole; only the three
    under-threshold ones are gap candidates."""
    holes = overlay.union_hole_rings(_feats(spark)).collect()
    by_key = {r.key: r.area for r in holes}
    assert set(by_key) == {"a", "b", "c", "d"}
    assert by_key["a"] == -8.25
    assert by_key["b"] == -18.0625
    assert by_key["c"] == -4.0
    assert by_key["d"] == -8.25


def test_gap_fill_tiled_twin(spark):
    """tiled=True is the 100-TB shape end to end: holes from
    dissolve2_rings_tiled, areas from the distributed mosaic, and the
    crediting join CELL-BUCKETED on (key, cgx, cgy) instead of the
    broadcast cross-pair — same output to 9dp (the stitched rings carry
    extra collinear vertices whose shoelace terms round at ~1e-15,
    hence the operator's 9dp contract)."""
    out = overlay.clean_gap_fill(
        _feats(spark), fixtures.GAP_FILL_AREA, res=3, tiled=True
    )
    got = {(r.key, r.feature_id): r.clean_area_r for r in out.collect()}
    assert got == pytest.approx(EXPECTED, abs=1e-8)


def test_gap_fill_offset_heavy(spark):
    """WebMercator-scale coordinate offsets (|coord| ~ 2e6): the
    point-on-segment crediting runs in the per-key floor-anchored local
    frame, so winners hold and areas agree to ~1e-8 relative (crossing
    solves at offset magnitude carry ~4e-10 absolute residue — the
    9dp-exact contract is origin-frame only). The exact-tie group 'c'
    is excluded: at offset coordinates the four border lengths pick up
    independent ulp noise and the tie resolves by float luck (upstream
    shares this property); its total area is still conserved."""
    out = overlay.clean_gap_fill(
        _feats(spark, dx=2_000_000.0, dy=1_000_000.0), fixtures.GAP_FILL_AREA
    )
    got = {(r.key, r.feature_id): r.clean_area_r for r in out.collect()}
    for (k, fid), v in EXPECTED.items():
        if k == "c":
            continue
        assert got[(k, fid)] == pytest.approx(v, rel=1e-8), (k, fid)
    c_total = sum(v for (k, _f), v in got.items() if k == "c")
    assert c_total == pytest.approx(8.0 + 8.0 + 3.0 + 3.5 + 4.0, rel=1e-8)


def test_gap_fill_threshold_zero_preserves_all(spark):
    """gap_fill_area below every hole -> pure overlap resolution
    (clean_assign_areas twin)."""
    out = overlay.clean_gap_fill(_feats(spark), gap_fill_area=1e-6)
    got = {(r.key, r.feature_id): r.clean_area_r for r in out.collect()}
    clean = overlay.clean_assign_areas(_feats(spark))
    want = {
        (r.key, r.feature_id): round(r.clean_area, 9) for r in clean.collect()
    }
    assert got == want
