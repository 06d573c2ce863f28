"""-stitch: join polygons split at the antimeridian.

[UPSTREAM mapshaper-stitch.mjs — public knowledge of mbloch/mapshaper;
the local reference checkout is empty, SURVEY.md §0]: upstream's
``-stitch`` removes the lon ±180 cut that global lat-long datasets
carry (typically after clipping a projected world layer), re-joining
the polygon pieces on either side of the seam. It is the last upstream
command whose output is computed geometry rather than styling.

Spark-first shape: stitching is per-FEATURE local — no piece of one
feature ever interacts with another feature — so the operator is one
fold keyed on ``feature_id``, routed through
``overlay._fold_parallel`` because the group count scales with the
data [CLAUDE.md invariant], with the per-feature groups BATCHED
through ``collect_list`` + ``mapInPandas`` so many features share one
Arrow exchange (the per-group ``applyInPandas`` form measured 6.1k
features/s and failed at 1M groups; batched: 225k features/s at 1M,
wall flat from 100k — BENCH/stitch_probe.json). Per-feature piece
counts are dim-bounded (a world feature splits into a handful of
pieces), so the per-feature kernel is a plain Python chain walk.

Kernel semantics (mirrored exactly by the DuckDB oracle in
``queries.q_stitch``):

* A SEAM EDGE is a vertical edge whose endpoints are both exactly
  x == +180 or both x == -180. Pieces produced by cutting at the
  antimeridian carry their cut boundary on the seam verbatim, so
  exact comparison is the correct trigger (real split data shares cut
  vertices bitwise; no tolerance window is needed or wanted here —
  a near-seam edge at 179.9999 is DATA, not a cut).
* Removing a ring's seam edges decomposes it into open PATHS. Paths
  reconnect across the seam by exact junction-``y`` equality: with
  consistent ring orientation each junction y carries exactly one
  path END and one path START per feature (the kernel raises LOUDLY
  on ambiguous or unmatched junctions — degenerate input, e.g. a ring
  encircling a pole, which upstream handles with an explicit polar
  detour vertex; out of scope here and documented).
* The stitched ring is UNWRAPPED: the chain anchors at its
  minimum-(piece_id, run) path's original frame and every following
  path shifts by the cumulative ±360 needed for continuity, so output
  x may exceed ±180 (upstream does the same — the stitched ring is
  continuous; re-normalization is a separate projection concern).
* Rings with no seam edges pass through bitwise.

Scale notes: one shuffle (the fold's repartition on feature_id);
coordinates stay inside Arrow batches; no driver-side geometry. The
whole-feature group is the irreducible unit — the same unit upstream
holds in memory single-node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geometry
from .overlay import _fold_parallel

_SCHEMA = (
    "feature_id bigint, ring_id int, xs array<double>, ys array<double>, "
    "area double, seam_edges bigint"
)


def _ring_paths(xs: np.ndarray, ys: np.ndarray):
    """Split one closed ring (open storage) into its non-seam edge
    runs: a run of edges [i..j] yields the open path (v_i .. v_{j+1}).
    The ring is rotated so a seam edge closes the list first, so runs
    never wrap (any seam-touched cut piece admits such a rotation)."""
    n = len(xs)
    seam = [xs[i] == xs[(i + 1) % n] and abs(xs[i]) == 180.0 for i in range(n)]
    n_seam = sum(seam)
    if n_seam == 0:
        return 0, []
    if not seam[-1]:
        last = max(i for i in range(n) if seam[i])
        order = list(range(last + 1, n)) + list(range(0, last + 1))
        xs = xs[order]
        ys = ys[order]
        seam = [seam[i] for i in order]
    paths = []
    i = 0
    while i < n:
        if seam[i]:
            i += 1
            continue
        j = i
        while j + 1 < n and not seam[j + 1]:
            j += 1
        idx = list(range(i, j + 1)) + [(j + 1) % n]
        paths.append((xs[idx].copy(), ys[idx].copy()))
        i = j + 1
    return n_seam, paths


def stitch_feature(pieces: list[tuple[int, np.ndarray, np.ndarray]]):
    """Stitch one feature's pieces; returns (rings, n_seam_total) where
    rings is a list of (anchor_key, xs, ys) sorted by anchor."""
    passthrough = []
    paths = {}  # (pid, run) -> (xs, ys)
    for pid, xs, ys in pieces:
        n_seam, runs = _ring_paths(xs, ys)
        if n_seam == 0:
            passthrough.append(((pid, -1), xs, ys, 0))
        else:
            for r, (pxs, pys) in enumerate(runs):
                paths[(pid, r)] = (pxs, pys)
    n_seam_total = sum(
        1
        for pid, xs, ys in pieces
        for i in range(len(xs))
        if xs[i] == xs[(i + 1) % len(xs)] and abs(xs[i]) == 180.0
    )
    starts: dict[float, tuple[int, int]] = {}
    ends: dict[float, tuple[int, int]] = {}
    for key, (pxs, pys) in paths.items():
        sy, ey = float(pys[0]), float(pys[-1])
        if sy in starts or ey in ends:
            raise ValueError(
                "stitch: ambiguous seam junction y — two paths share a "
                "start (or end) y on the seam; dedup/snap the layer first"
            )
        starts[sy] = key
        ends[ey] = key
    rings = []
    visited: set[tuple[int, int]] = set()
    for anchor in sorted(paths):
        if anchor in visited:
            continue
        cxs: list[np.ndarray] = []
        cys: list[np.ndarray] = []
        key, shift = anchor, 0.0
        first = paths[anchor]
        while True:
            visited.add(key)
            pxs, pys = paths[key]
            drop = 1 if cxs else 0  # dedupe the junction vertex
            cxs.append(pxs[drop:] + shift)
            cys.append(pys[drop:])
            ey = float(pys[-1])
            nxt = starts.get(ey)
            if nxt is None:
                raise ValueError(
                    "stitch: unmatched seam endpoint at y=%r — the layer "
                    "is missing its partner piece (polar ring or partial "
                    "cut); out of -stitch scope" % ey
                )
            shift = shift + float(pxs[-1]) - float(paths[nxt][0][0])
            if nxt == anchor:
                if shift != 0.0:
                    raise ValueError(
                        "stitch: seam wrap imbalance (cumulative shift "
                        "%r after closing the chain) — the ring winds "
                        "around the globe (polar ring); out of scope" % shift
                    )
                break
            if nxt in visited:
                raise ValueError("stitch: seam chain re-enters a visited path")
            key = nxt
        xs = np.concatenate(cxs)
        ys = np.concatenate(cys)
        # the final path's last vertex duplicates the anchor's first
        xs, ys = xs[:-1], ys[:-1]
        rings.append((anchor, xs, ys, 1))
    out = sorted(rings + passthrough, key=lambda r: r[0])
    return out, n_seam_total


def stitch_polyline_feature(pieces: list[tuple[int, np.ndarray, np.ndarray]]):
    """Stitch one feature's POLYLINE pieces across the seam. Unlike
    rings, a cut polyline sheds no edges — the cut just ends one piece
    at (±180, y) and starts the next at (∓180, y) — so stitching is
    pure endpoint joining: a piece END on the seam joins the piece
    START at the same junction y (the cut preserves traversal
    direction, so matching is directed end→start; an end meeting
    another end is ambiguous input and raises). Endpoints on the seam
    with NO partner are legitimate line terminals, not errors. Chains
    unwrap with the cumulative ±360 shift, anchored at the chain's
    head piece; a circular piece chain (every junction matched) would
    be a closed line and raises loudly.

    Returns (lines, n_links): lines = [(anchor_piece_id, xs, ys)]
    sorted by anchor, n_links = junction joins performed."""
    seam = lambda x: abs(float(x)) == 180.0  # noqa: E731
    starts: dict[float, int] = {}
    ends: dict[float, int] = {}
    by_id = {}
    for pid, xs, ys in pieces:
        by_id[pid] = (np.asarray(xs, float), np.asarray(ys, float))
        if seam(xs[0]):
            if float(ys[0]) in starts:
                raise ValueError(
                    "stitch: ambiguous polyline seam junction (two piece "
                    "starts at the same y)"
                )
            starts[float(ys[0])] = pid
        if seam(xs[-1]):
            if float(ys[-1]) in ends:
                raise ValueError(
                    "stitch: ambiguous polyline seam junction (two piece "
                    "ends at the same y)"
                )
            ends[float(ys[-1])] = pid
    # a junction is an end y with a matching start y
    links = {e_pid: starts[y] for y, e_pid in ends.items() if y in starts}
    has_pred = set(links.values())
    heads = sorted(pid for pid, _, _ in pieces if pid not in has_pred)
    if len(heads) < len(by_id) - len(links):
        raise ValueError("stitch: inconsistent polyline chain graph")
    lines = []
    visited: set[int] = set()
    n_links = 0
    for head in heads:
        cxs, cys = [], []
        pid, shift = head, 0.0
        while True:
            if pid in visited:
                raise ValueError(
                    "stitch: circular polyline piece chain (closed line "
                    "through the seam) — out of -stitch scope"
                )
            visited.add(pid)
            xs, ys = by_id[pid]
            drop = 1 if cxs else 0  # the junction vertex is shared
            cxs.append(xs[drop:] + shift)
            cys.append(ys[drop:])
            nxt = links.get(pid)
            if nxt is None:
                break
            shift = shift + float(xs[-1]) - float(by_id[nxt][0][0])
            n_links += 1
            pid = nxt
        lines.append((head, np.concatenate(cxs), np.concatenate(cys)))
    if len(visited) != len(by_id):
        raise ValueError(
            "stitch: circular polyline piece chain (closed line through "
            "the seam) — out of -stitch scope"
        )
    return lines, n_links


_LINE_SCHEMA = (
    "feature_id bigint, line_id int, xs array<double>, ys array<double>, "
    "length double, n_links bigint"
)


def stitch_polylines(pieces: DataFrame) -> DataFrame:
    """Distributed polyline -stitch over (feature_id, piece_id, xs, ys)
    [UPSTREAM mapshaper-stitch.mjs stitches lines as well as polygons].
    Output: one row per stitched line with its exact Euclidean length
    (sequential segment sum — exact on the dyadic oracle fixture) and
    the per-feature junction-join count repeated on every row."""

    def seg_len(xs, ys):
        total = 0.0
        for i in range(len(xs) - 1):
            dx = xs[i + 1] - xs[i]
            dy = ys[i + 1] - ys[i]
            total += float(np.sqrt(dx * dx + dy * dy))
        return total

    def fold(batches):
        # batched like stitch_antimeridian: many features per Arrow
        # batch, no per-group round-trip
        for pdf in batches:
            rows = []
            for fid, ps in zip(pdf["feature_id"], pdf["ps"]):
                pieces_l = sorted(
                    (
                        (int(p["piece_id"]),
                         np.asarray(p["xs"], float),
                         np.asarray(p["ys"], float))
                        for p in ps
                    ),
                    key=lambda t: t[0],
                )
                lines, n_links = stitch_polyline_feature(pieces_l)
                for i, (_, xs, ys) in enumerate(lines):
                    rows.append(
                        (int(fid), i, xs.tolist(), ys.tolist(),
                         seg_len(xs, ys), n_links)
                    )
            yield pd.DataFrame(
                rows,
                columns=["feature_id", "line_id", "xs", "ys", "length",
                         "n_links"],
            )

    grouped = (
        _fold_parallel(pieces, "feature_id")
        .groupBy("feature_id")
        .agg(F.collect_list(F.struct("piece_id", "xs", "ys")).alias("ps"))
    )
    return grouped.mapInPandas(fold, schema=_LINE_SCHEMA)


def stitch_antimeridian(pieces: DataFrame) -> DataFrame:
    """Distributed -stitch over a (feature_id, piece_id, xs, ys) layer.

    Output: one row per stitched ring — (feature_id, ring_id, xs, ys,
    area, seam_edges) with ring areas from the raw shoelace (exact on
    the integer-coordinate oracle fixture; stitched-ring area equals
    the sum of its pieces' areas exactly because the removed seam
    edges traverse in opposite directions) and seam_edges the
    per-feature count of removed cut edges (repeated on every ring row
    so the aggregate query reads it with max())."""

    def fold(batches):
        # one Arrow batch carries MANY features (collect_list pre-
        # aggregates pieces per feature), so the per-feature kernel
        # pays no per-group Arrow round-trip — measured 6.1k -> 54k
        # features/s at 100k features vs per-group applyInPandas
        for pdf in batches:
            rows = []
            for fid, ps in zip(pdf["feature_id"], pdf["ps"]):
                pieces_l = sorted(
                    (
                        (int(p["piece_id"]),
                         np.asarray(p["xs"], float),
                         np.asarray(p["ys"], float))
                        for p in ps
                    ),
                    key=lambda t: t[0],
                )
                rings, n_seam = stitch_feature(pieces_l)
                for i, (_, xs, ys, _) in enumerate(rings):
                    rows.append(
                        (int(fid), i, xs.tolist(), ys.tolist(),
                         geometry.shoelace_area(xs, ys), n_seam)
                    )
            yield pd.DataFrame(
                rows,
                columns=["feature_id", "ring_id", "xs", "ys", "area",
                         "seam_edges"],
            )

    grouped = (
        _fold_parallel(pieces, "feature_id")
        .groupBy("feature_id")
        .agg(F.collect_list(F.struct("piece_id", "xs", "ys")).alias("ps"))
    )
    return grouped.mapInPandas(fold, schema=_SCHEMA)
