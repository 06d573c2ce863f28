"""-points / -filter-islands / -affine / -snap — per-shape derivations
[SURVEY.md §2.2, §2.7].

Centroid/area are ROW-LOCAL (one ring per row in the simple-polygon
model) and run as plain ``mapInPandas`` — no grouping, no shuffle; the
accumulation is sequential ring-order so the DuckDB oracle's SQL
``sum()`` over the edge relation reproduces the values bit-for-bit
[geometry.shoelace_seq]. Multi-ring per-feature ops (inner points,
dots, island filtering) keep their per-feature groups.
Affine/snap are pure column math (whole-stage codegen, no UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geometry


def centroids(polygons: DataFrame) -> DataFrame:
    """-points centroid: (poly_id, cx, cy) via ring-order shoelace.

    Input is the simple-polygon model — ONE ring per row — so the op is
    row-local: plain ``mapInPandas`` over the table, no grouping, no
    shuffle (the earlier groupBy(poly_id) hash-exchanged the whole
    layer to build 1-row groups; values are bitwise unchanged because
    the per-row kernel is identical)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            a2, sx, sy = geometry.shoelace_seq_local(r["xs"], r["ys"])
            if a2 == 0.0:
                # degenerate (zero-area) ring: fail loudly rather than emit
                # inf/NaN — NaN never equals itself, so one bad feature
                # would otherwise silently break whole-layer oracle parity
                raise ValueError(
                    f"centroid of zero-area ring poly_id={int(r['poly_id'])}"
                )
            out.append(
                {"poly_id": int(r["poly_id"]), "cx": sx / (3.0 * a2), "cy": sy / (3.0 * a2)}
            )
        return pd.DataFrame(out, columns=["poly_id", "cx", "cy"])

    return polygons.mapInPandas(
        lambda it: (run(pdf) for pdf in it),
        schema="poly_id int, cx double, cy double",
    )


def areas(polygons: DataFrame) -> DataFrame:
    """(poly_id, area) — signed shoelace area (CCW positive). Row-local
    like :func:`centroids`: one ring per row, mapInPandas, no shuffle."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            a2, _sx, _sy = geometry.shoelace_seq_local(r["xs"], r["ys"])
            out.append({"poly_id": int(r["poly_id"]), "area": a2 / 2.0})
        return pd.DataFrame(out, columns=["poly_id", "area"])

    return polygons.mapInPandas(
        lambda it: (run(pdf) for pdf in it),
        schema="poly_id int, area double",
    )


def _segments(rings):
    import numpy as np

    return np.concatenate(
        [np.column_stack([r, np.roll(r, -1, axis=0)]) for r in rings]
    )


def _signed_dist(px, py, rings, segs):
    """Vectorized signed distance to the feature boundary: positive
    inside (even-odd over all rings), negative outside."""
    import numpy as np

    ax, ay = segs[:, 0], segs[:, 1]
    bx, by = segs[:, 2], segs[:, 3]
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    ln2 = np.where(ln2 == 0.0, 1.0, ln2)
    # (points, segs) projection clamp
    t = ((px[:, None] - ax[None, :]) * dx[None, :] + (py[:, None] - ay[None, :]) * dy[None, :]) / ln2[None, :]
    t = np.clip(t, 0.0, 1.0)
    cx = ax[None, :] + t * dx[None, :]
    cy = ay[None, :] + t * dy[None, :]
    d = np.sqrt(((px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2).min(axis=1))
    inside = geometry.pip_rings(px, py, rings)
    return np.where(inside, d, -d)


def pole_of_inaccessibility(rings, iters: int = 40) -> tuple[float, float, float]:
    """-points inner: the interior point farthest from the feature
    boundary (labels go here, never in a hole or outside a concavity)
    [upstream -points inner / polylabel-style algorithm, SURVEY.md §2.7].

    Deterministic multi-resolution descent: seed a 16x16 grid of cell
    centers over the bbox, then halve the step around the best candidate
    (3x3 neighborhood) until converged — pure numpy, batch-evaluated.
    Returns (x, y, clearance)."""
    import numpy as np

    segs = _segments(rings)
    allx = np.concatenate([r[:, 0] for r in rings])
    ally = np.concatenate([r[:, 1] for r in rings])
    x0, x1, y0, y1 = allx.min(), allx.max(), ally.min(), ally.max()
    gx, gy = np.meshgrid(np.linspace(x0, x1, 33)[1::2], np.linspace(y0, y1, 33)[1::2])
    px, py = gx.ravel(), gy.ravel()
    d = _signed_dist(px, py, rings, segs)
    best = int(np.argmax(d))
    bx, by, bd = px[best], py[best], d[best]
    step = max(x1 - x0, y1 - y0) / 16.0
    offs = np.array([(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)], dtype=float)
    for _ in range(iters):
        step /= 2.0
        cx = bx + offs[:, 0] * step
        cy = by + offs[:, 1] * step
        cd = _signed_dist(cx, cy, rings, segs)
        k = int(np.argmax(cd))
        if cd[k] > bd:
            bx, by, bd = cx[k], cy[k], cd[k]
    return float(bx), float(by), float(bd)


def inner_points(features: DataFrame) -> DataFrame:
    """-points inner over a multi-ring layer (poly_id, ring_idx, xs, ys):
    one pole per feature, computed per group (a million-feature layer
    parallelizes; each group is one feature's rings — dim-sized)."""
    import numpy as np

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = [
            np.column_stack([np.asarray(r["xs"]), np.asarray(r["ys"])])
            for _, r in pdf.iterrows()
        ]
        x, y, d = pole_of_inaccessibility(rings)
        return pd.DataFrame(
            [{"poly_id": int(pdf["poly_id"].iloc[0]), "ix": x, "iy": y, "clearance": d}]
        )

    return features.groupBy("poly_id").applyInPandas(
        run, schema="poly_id int, ix double, iy double, clearance double"
    )


def dots_fill(features: DataFrame, dots_per_feature: int, seed: int = 42) -> DataFrame:
    """-dots: deterministic dot-density fill — N points uniformly inside
    each feature (holes excluded) via seeded rejection sampling in the
    bbox [upstream -dots, SURVEY.md §2.7]. The stream is keyed by
    (seed, poly_id), so output is identical across runs, partitionings,
    and cluster sizes."""
    import numpy as np

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["poly_id"].iloc[0])
        rings = [
            np.column_stack([np.asarray(r["xs"]), np.asarray(r["ys"])])
            for _, r in pdf.iterrows()
        ]
        allx = np.concatenate([r[:, 0] for r in rings])
        ally = np.concatenate([r[:, 1] for r in rings])
        x0, x1, y0, y1 = allx.min(), allx.max(), ally.min(), ally.max()
        rng = np.random.Generator(np.random.PCG64([seed, pid]))
        xs, ys = [], []
        need = dots_per_feature
        while need > 0:
            n = max(64, need * 4)
            cx = rng.uniform(x0, x1, n)
            cy = rng.uniform(y0, y1, n)
            keep = geometry.pip_rings(cx, cy, rings)
            take = min(need, int(keep.sum()))
            xs.extend(cx[keep][:take])
            ys.extend(cy[keep][:take])
            need -= take
        return pd.DataFrame(
            {
                "poly_id": pid,
                "dot_idx": np.arange(dots_per_feature, dtype=np.int32),
                "x": xs,
                "y": ys,
            }
        )

    return features.groupBy("poly_id").applyInPandas(
        run, schema="poly_id int, dot_idx int, x double, y double"
    )


def filter_islands(polygons: DataFrame, min_area: float) -> DataFrame:
    """-filter-islands min-area=: keep polygons at or above the area
    threshold (drop small detached rings)."""
    return areas(polygons).filter(F.col("area") >= min_area)


def geometry_properties(polygons: DataFrame) -> DataFrame:
    """mapshaper's lazy feature-proxy accessors ($.area, $.perimeter,
    $.centroidX/Y, $.bounds, $.vertexCount [SURVEY.md §2.8]) as ONE
    materialized property table — computed once per feature, then
    referenced as ordinary columns. Sequential ring-order accumulation
    keeps every value bit-identical to the SQL oracle."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        out = []
        for _, r in pdf.iterrows():
            xs, ys = list(r["xs"]), list(r["ys"])
            a2, sx, sy = geometry.shoelace_seq_local(xs, ys)
            perim = 0.0
            n = len(xs)
            for i in range(n):
                dx = xs[(i + 1) % n] - xs[i]
                dy = ys[(i + 1) % n] - ys[i]
                perim += math.sqrt(dx * dx + dy * dy)
            out.append(
                {
                    "poly_id": int(r["poly_id"]),
                    "area": a2 / 2.0,
                    "perimeter": perim,
                    "cx": sx / (3.0 * a2),
                    "cy": sy / (3.0 * a2),
                    "n_vertices": n,
                    "xmin": min(xs),
                    "ymin": min(ys),
                    "xmax": max(xs),
                    "ymax": max(ys),
                }
            )
        return pd.DataFrame(
            out,
            columns=[
                "poly_id", "area", "perimeter", "cx", "cy",
                "n_vertices", "xmin", "ymin", "xmax", "ymax",
            ],
        )

    return polygons.groupBy("poly_id").applyInPandas(
        run,
        schema=(
            "poly_id int, area double, perimeter double, cx double, cy double, "
            "n_vertices int, xmin double, ymin double, xmax double, ymax double"
        ),
    )


def affine(points: DataFrame, scale_x=1.0, scale_y=1.0, shift_x=0.0, shift_y=0.0) -> DataFrame:
    """-affine shift=/scale=: coordinate transform as column math."""
    return points.withColumn("x", F.col("lon") * scale_x + shift_x).withColumn(
        "y", F.col("lat") * scale_y + shift_y
    )


def snap(points: DataFrame, interval: float) -> DataFrame:
    """-snap interval=: quantize coordinates to the grid, group
    near-coincident vertices, keep a deterministic representative.
    floor(x/ival)·ival is IEEE-portable (round() tie rules differ across
    engines and is avoided)."""
    inv = 1.0 / interval
    sx = F.floor(F.col("lon") * inv) / inv
    sy = F.floor(F.col("lat") * inv) / inv
    return (
        points.withColumn("sx", sx)
        .withColumn("sy", sy)
        .groupBy("sx", "sy")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("point_id").alias("rep_id"))
    )


def buffer_points(
    points: DataFrame,
    radius: float,
    k: int = 4,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """-buffer on point layers [upstream's experimental -buffer]: each
    point becomes a regular k-gon approximation of its radius-r circle
    — one CCW ring, built as PURE COLUMN MATH (the k vertex offsets are
    driver-side literals; no UDF, whole-stage codegen). k=4 is the
    exact 'diamond' the DuckDB oracle measures in a 45°-rotated frame
    (offsets within 1e-12·r of an axis snap to it exactly, so
    cos(pi/2) noise never breaks dyadic exactness); raise k for
    rounder buffers. Compose with dissolve2 / union_many to merge
    overlapping buffers [upstream -buffer + -dissolve2]. Input columns
    besides x/y pass through (feature_id, key, ...)."""
    import math

    offs = []
    for i in range(k):
        ox = radius * math.cos(2.0 * math.pi * i / k)
        oy = radius * math.sin(2.0 * math.pi * i / k)
        snap = 1e-12 * abs(radius)
        offs.append(
            (0.0 if abs(ox) < snap else ox, 0.0 if abs(oy) < snap else oy)
        )
    xs = F.array(*[F.col(x) + F.lit(ox) for ox, _ in offs])
    ys = F.array(*[F.col(y) + F.lit(oy) for _, oy in offs])
    keep = [c for c in points.columns if c not in (x, y)]
    return points.select(*keep, xs.alias("xs"), ys.alias("ys"))


def buffer_polylines(
    lines: DataFrame, radius: float, cap_extension: float | None = None
) -> DataFrame:
    """-buffer on polyline layers [upstream's experimental -buffer]:
    each segment becomes an oriented quad ring — half-width ``radius``
    along the segment normal, ends extended by ``cap_extension``
    (default = radius: square caps; the union of the quads is then the
    exact Minkowski sum with an oriented square on axis-aligned
    layers). PURE COLUMN MATH (explode segments, normals from the
    per-segment length; sqrt is IEEE-exact on axis-aligned segments) —
    feed the rings to dissolve2 / union_many to merge per key.

    Square caps of CONNECTED segments overlap in coincident collinear
    edge runs at every joint, so the union fold takes its robust
    perturbed path: merged areas carry ~1e-8 deterministic residue
    (the oracle rounds at 6dp; area is canonical per the adjacency
    representation contract, perimeter is not)."""
    ext = radius if cap_extension is None else cap_extension
    seg_expr = (
        "transform(sequence(0, size(xs) - 2), i -> named_struct("
        "'sx1', xs[i], 'sy1', ys[i], 'sx2', xs[i + 1], 'sy2', ys[i + 1],"
        "'sseq', i))"
    )
    return _segment_quads(lines, seg_expr, radius, ext)


def dashlines(lines: DataFrame, dash: float = 1.5, gap: float = 0.5) -> DataFrame:
    """``-dashlines``: cut a polyline layer into dash intervals of
    ``dash`` length separated by ``gap``, measured along each arc's
    cumulative length.

    [UPSTREAM ``src/commands/mapshaper-dashlines.mjs`` — public
    knowledge of mbloch/mapshaper; /root/reference is empty, SURVEY.md
    §0]: upstream splits lines into dashes for cartographic styling;
    the split positions are pure arc-length arithmetic, which is why
    this command (unlike -style/-symbols) is computable and
    oracle-checkable.

    PURE COLUMN MATH end to end — explode segments, cumulative offset
    via a window sum in segment order, candidate dash indices via
    ``sequence()``, one interval-overlap expression per dash, then a
    (arc_id, dash_idx) groupBy so a dash spanning several segments
    sums into one row. No Python anywhere; at scale the only shuffle
    is the per-arc window + the final aggregation.

    Returns (arc_id, dash_idx, dash_len), one row per non-empty dash.
    """
    p = float(dash + gap)
    d = float(dash)
    seg = (
        lines.select(
            "arc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(xs) - 2), i -> named_struct("
                    "'seg_i', i, "
                    "'seg_len', sqrt((xs[i + 1] - xs[i]) * (xs[i + 1] - xs[i])"
                    " + (ys[i + 1] - ys[i]) * (ys[i + 1] - ys[i]))))"
                )
            ).alias("s"),
        )
        .select("arc_id", "s.seg_i", "s.seg_len")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("arc_id")
        .orderBy("seg_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = seg.withColumn("s0", F.coalesce(F.sum("seg_len").over(w), F.lit(0.0))).withColumn(
        "s1", F.col("s0") + F.col("seg_len")
    )
    ov = c.select(
        "arc_id",
        F.explode(
            F.expr(
                f"filter(transform(sequence(CAST(floor(s0 / {p!r}D) AS BIGINT),"
                f" CAST(floor(s1 / {p!r}D) AS BIGINT)),"
                f" k -> named_struct('dash_idx', k,"
                f" 'len', greatest(0.0D, least(s1, k * {p!r}D + {d!r}D)"
                f" - greatest(s0, k * {p!r}D)))),"
                f" x -> x.len > 0.0D)"
            )
        ).alias("dd"),
    ).select("arc_id", "dd.dash_idx", "dd.len")
    return ov.groupBy("arc_id", "dash_idx").agg(F.sum("len").alias("dash_len"))


def buffer_polygons(
    polys: DataFrame, radius: float, cap_extension: float | None = None
) -> DataFrame:
    """-buffer on polygon layers [upstream's experimental -buffer]: the
    outward buffer is the ORIGINAL ring (sseq = -1) unioned with
    square-cap quads over the CLOSED edge sequence (last vertex wraps
    to the first). P ⊕ S = P ∪ (∂P ⊕ S) for any structuring element S
    containing the origin, and on axis-aligned layers each edge's quad
    IS its Minkowski sum with an oriented square (the cap extensions
    cover the convex-corner squares exactly), so the union equals the
    exact Minkowski buffer there. Feed the rings to dissolve2 /
    union_many to merge per key; coincident quad/ring edges take the
    union fold's robust perturbed path (area canonical, ~1e-8 residue,
    per the adjacency representation contract)."""
    ext = radius if cap_extension is None else cap_extension
    seg_expr = (
        "transform(sequence(0, size(xs) - 1), i -> named_struct("
        "'sx1', xs[i], 'sy1', ys[i],"
        "'sx2', xs[(i + 1) % size(xs)], 'sy2', ys[(i + 1) % size(xs)],"
        "'sseq', i))"
    )
    keep = [c for c in polys.columns if c not in ("xs", "ys")]
    quads = _segment_quads(polys, seg_expr, radius, ext)
    orig = polys.select(*keep, F.lit(-1).alias("sseq"), "xs", "ys")
    return orig.unionByName(quads)


def _segment_quads(
    lines: DataFrame, seg_expr: str, radius: float, ext: float
) -> DataFrame:
    """Shared quad builder: explode ``seg_expr`` segment structs, emit
    one oriented CCW quad ring per nonzero-length segment (half-width
    ``radius`` along the normal, ends extended by ``ext``)."""
    keep = [c for c in lines.columns if c not in ("xs", "ys")]
    s = lines.select(*keep, F.explode(F.expr(seg_expr)).alias("_s")).select(
        *keep, "_s.sx1", "_s.sy1", "_s.sx2", "_s.sy2", "_s.sseq"
    )
    dx = F.col("sx2") - F.col("sx1")
    dy = F.col("sy2") - F.col("sy1")
    ln = F.sqrt(dx * dx + dy * dy)
    exn, eyn = dx / ln * ext, dy / ln * ext
    nxn, nyn = -dy / ln * radius, dx / ln * radius
    return s.where(ln > 0).select(
        *keep,
        "sseq",
        F.array(
            F.col("sx1") - exn + nxn,
            F.col("sx1") - exn - nxn,
            F.col("sx2") + exn - nxn,
            F.col("sx2") + exn + nxn,
        ).alias("xs"),
        F.array(
            F.col("sy1") - eyn + nyn,
            F.col("sy1") - eyn - nyn,
            F.col("sy2") + eyn - nyn,
            F.col("sy2") + eyn + nyn,
        ).alias("ys"),
    )


def _arc_cum_segments(lines: DataFrame) -> DataFrame:
    """Shared ``-points midpoints|interpolated`` stage: explode a
    polyline layer (arc_id, xs, ys) into segments carrying cumulative
    arc-length offsets. PURE COLUMN MATH — the prefix sum is a per-arc
    window in segment order (sequential, so an SQL twin's windowed SUM
    evaluates the identical IEEE chain; the -dashlines oracle proves
    the pattern). Returns
    (arc_id, seg_i, ax, ay, bx, by, seg_len, s0, s1)."""
    from pyspark.sql import Window

    seg = lines.select(
        "arc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(xs) - 2), i -> named_struct("
                "'seg_i', i, 'ax', xs[i], 'ay', ys[i],"
                "'bx', xs[i + 1], 'by', ys[i + 1],"
                "'seg_len', sqrt((xs[i + 1] - xs[i]) * (xs[i + 1] - xs[i])"
                " + (ys[i + 1] - ys[i]) * (ys[i + 1] - ys[i]))))"
            )
        ).alias("s"),
    ).select("arc_id", "s.*")
    w = (
        Window.partitionBy("arc_id")
        .orderBy("seg_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return seg.withColumn(
        "s0", F.coalesce(F.sum("seg_len").over(w), F.lit(0.0))
    ).withColumn("s1", F.col("s0") + F.col("seg_len"))


_SEG_LEN_I = (
    "sqrt((xs[i + 1] - xs[i]) * (xs[i + 1] - xs[i])"
    " + (ys[i + 1] - ys[i]) * (ys[i + 1] - ys[i]))"
)


def points_midpoints(lines: DataFrame) -> DataFrame:
    """``-points midpoints``: one point per polyline feature at half its
    total arc length [UPSTREAM ``src/commands/mapshaper-points.mjs``
    midpoints mode — public knowledge of mbloch/mapshaper;
    /root/reference is empty, SURVEY.md §0]. The containing segment is
    the FIRST whose cumulative end reaches L/2 (a midpoint landing
    exactly on a shared vertex resolves to the earlier segment at t=1,
    the same coordinate the next segment gives at t=0).

    ROW-LOCAL, ZERO SHUFFLE [CLAUDE.md data-scaled-fold invariant: one
    arc per row needs no grouping at all — the first cut of this
    operator exploded every vertex through a per-arc window and a
    min_by groupBy, shuffling the whole vertex table to aggregate it
    straight back to one row per arc; same-session interleaved A/B at
    1M arcs: windowed min-of-3 0.59 s (with a 21 s shuffle-stall
    outlier on the noisy host), fold 0.19 s — 3.1× and no exchange to
    stall]: two ``aggregate()`` folds per
    row — total length L, then a constant-state (s, px, py) scan that
    locks the first segment reaching L/2. Both folds accumulate
    seg_len in the same sequential order as a window prefix sum, so
    the coordinates are bit-identical to the windowed form and to the
    windowed-SUM DuckDB oracle. Returns (arc_id, px, py)."""
    fold_len = (
        f"aggregate(sequence(0, size(xs) - 2), CAST(0.0 AS DOUBLE),"
        f" (a, i) -> a + {_SEG_LEN_I})"
    )
    scan = (
        f"aggregate(sequence(0, size(xs) - 2),"
        f" named_struct('s', CAST(0.0 AS DOUBLE),"
        f"  'px', CAST(NULL AS DOUBLE), 'py', CAST(NULL AS DOUBLE)),"
        f" (a, i) -> CASE WHEN a.px IS NOT NULL THEN a"
        f"  WHEN a.s + {_SEG_LEN_I} >= h THEN named_struct("
        f"   's', a.s + {_SEG_LEN_I},"
        # zero-length segment (or an all-degenerate L = 0 arc): the
        # interpolation divide would be 0/0 -> NaN; lock the segment
        # start instead (t = 0), which IS the midpoint of a point
        f"   'px', CASE WHEN {_SEG_LEN_I} > 0.0D THEN"
        f"    xs[i] + (xs[i + 1] - xs[i]) * ((h - a.s) / {_SEG_LEN_I})"
        f"    ELSE xs[i] END,"
        f"   'py', CASE WHEN {_SEG_LEN_I} > 0.0D THEN"
        f"    ys[i] + (ys[i + 1] - ys[i]) * ((h - a.s) / {_SEG_LEN_I})"
        f"    ELSE ys[i] END)"
        f"  ELSE named_struct('s', a.s + {_SEG_LEN_I},"
        f"   'px', CAST(NULL AS DOUBLE), 'py', CAST(NULL AS DOUBLE))"
        f"  END)"
    )
    return (
        lines.filter(F.expr("size(xs) >= 2"))
        .withColumn("h", F.expr(fold_len) / F.lit(2.0))
        .withColumn("m", F.expr(scan))
        .select("arc_id", F.col("m.px").alias("px"), F.col("m.py").alias("py"))
    )


def points_interpolated(lines: DataFrame, interval: float) -> DataFrame:
    """``-points interpolated interval=``: points at every multiple of
    ``interval`` along each arc's cumulative length, k = 0 (the start
    vertex) through floor(L / interval) [UPSTREAM mapshaper-points.mjs
    interpolated mode — upstream resamples a line at a fixed interval].
    Candidate indices per segment come from the same ``sequence()``
    shape as -dashlines, guarded empty when the segment straddles no
    multiple (Spark's sequence() runs BACKWARD when start > stop — an
    unguarded call would fabricate candidates outside the segment); a
    multiple landing exactly on a shared vertex appears as the earlier
    segment's t=1 and the later one's t=0 — (arc, k) min_by(seg_i)
    keeps the earlier row, bit-identical coordinates either way.
    Returns (arc_id, k, px, py)."""
    d = float(interval)
    c = _arc_cum_segments(lines)
    cand = (
        # zero-length segments contribute nothing (a multiple landing
        # exactly on one would divide 0/0 -> NaN; the same multiple is
        # always carried by the adjacent nonzero segment at t=0 / t=1)
        c.filter(F.col("seg_len") > 0.0)
        .select(
            "arc_id",
            "seg_i",
            "ax",
            "ay",
            "bx",
            "by",
            F.explode(
                F.expr(
                    f"CASE WHEN ceil(s0 / {d!r}D) <= floor(s1 / {d!r}D)"
                    f" THEN transform(sequence("
                    f"CAST(ceil(s0 / {d!r}D) AS BIGINT),"
                    f" CAST(floor(s1 / {d!r}D) AS BIGINT)),"
                    f" k -> named_struct('k', k,"
                    f" 't', (k * {d!r}D - s0) / seg_len))"
                    f" ELSE array() END"
                )
            ).alias("kk"),
        )
        .select(
            "arc_id",
            "seg_i",
            F.col("kk.k").alias("k"),
            (F.col("ax") + (F.col("bx") - F.col("ax")) * F.col("kk.t")).alias(
                "px"
            ),
            (F.col("ay") + (F.col("by") - F.col("ay")) * F.col("kk.t")).alias(
                "py"
            ),
        )
    )
    return cand.groupBy("arc_id", "k").agg(
        F.expr("min_by(px, seg_i)").alias("px"),
        F.expr("min_by(py, seg_i)").alias("py"),
    )


def points_vertices(layer: DataFrame, unique: bool = True) -> DataFrame:
    """``-points vertices|vertices2``: one point per ring vertex of each
    feature [UPSTREAM mapshaper-points.mjs — vertices dedups repeated
    coordinates within a feature, vertices2 keeps every instance].
    Rings arrive one row per ring (poly_id, ring_idx, xs, ys — stored
    unclosed, so the closing vertex never double-counts) and leave as
    exploded vertex rows; map-only plus one distinct shuffle in the
    unique mode. Returns (poly_id, x, y) unique, or
    (poly_id, ring_idx, vi, x, y) with duplicates."""
    v = layer.select(
        "poly_id",
        "ring_idx",
        F.posexplode(F.arrays_zip("xs", "ys")).alias("vi", "v"),
    ).select(
        "poly_id",
        "ring_idx",
        "vi",
        F.col("v.xs").alias("x"),
        F.col("v.ys").alias("y"),
    )
    if unique:
        return v.select("poly_id", "x", "y").distinct()
    return v


def points_endpoints(lines: DataFrame) -> DataFrame:
    """``-points endpoints``: one point at each end of every polyline
    feature [UPSTREAM mapshaper-points.mjs endpoints mode — with
    vertices/midpoints/interpolated this completes the -points row].
    Map-only element access — no explode of interior vertices, no
    shuffle. Returns (arc_id, end_idx 0|1, px, py)."""
    return lines.select(
        "arc_id",
        F.explode(
            F.expr(
                "array(named_struct('end_idx', 0, 'px', xs[0], 'py', ys[0]),"
                " named_struct('end_idx', 1, 'px', element_at(xs, -1),"
                " 'py', element_at(ys, -1)))"
            )
        ).alias("e"),
    ).select("arc_id", "e.*")
