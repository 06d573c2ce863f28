"""-stitch: join polygons split at the antimeridian.

[UPSTREAM mapshaper-stitch.mjs — public knowledge of mbloch/mapshaper;
the local reference checkout is empty, SURVEY.md §0]: upstream's
``-stitch`` removes the lon ±180 cut that global lat-long datasets
carry (typically after clipping a projected world layer), re-joining
the polygon pieces on either side of the seam. It is the last upstream
command whose output is computed geometry rather than styling.

Spark-first shape: stitching is per-FEATURE local — no piece of one
feature ever interacts with another feature — so the operator is one
grouped-Arrow fold keyed on ``feature_id``, routed through
``overlay._fold_parallel`` because the group count scales with the
data [CLAUDE.md invariant]. Per-feature piece counts are dim-bounded
(a world feature splits into a handful of pieces), so the per-group
kernel is a plain Python chain walk.

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

from .. import geometry
from .overlay import _fold_parallel

_SCHEMA = (
    "feature_id bigint, ring_id int, xs array<double>, ys array<double>, "
    "area double, seam_edges bigint"
)


def _ring_paths(xs: np.ndarray, ys: np.ndarray):
    """Correct run builder: walk edges in order; a non-seam edge run
    [i..j] yields the path (v_i .. v_{j+1})."""
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


def stitch_antimeridian(pieces: DataFrame) -> DataFrame:
    """Distributed -stitch over a (feature_id, piece_id, xs, ys) layer.

    Output: one row per stitched ring — (feature_id, ring_id, xs, ys,
    area, seam_edges) with ring areas from the raw shoelace (exact on
    the integer-coordinate oracle fixture; stitched-ring area equals
    the sum of its pieces' areas exactly because the removed seam
    edges traverse in opposite directions) and seam_edges the
    per-feature count of removed cut edges (repeated on every ring row
    so the aggregate query reads it with max())."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["feature_id"].iloc[0])
        pieces_l = [
            (int(r.piece_id), np.asarray(r.xs, float), np.asarray(r.ys, float))
            for r in pdf.itertuples()
        ]
        pieces_l.sort(key=lambda p: p[0])
        rings, n_seam = stitch_feature(pieces_l)
        return pd.DataFrame(
            {
                "feature_id": fid,
                "ring_id": range(len(rings)),
                "xs": [r[1].tolist() for r in rings],
                "ys": [r[2].tolist() for r in rings],
                "area": [
                    geometry.shoelace_area(np.asarray(r[1]), np.asarray(r[2]))
                    for r in rings
                ],
                "seam_edges": n_seam,
            }
        )

    return (
        _fold_parallel(pieces, "feature_id")
        .groupBy("feature_id")
        .applyInPandas(lambda _, pdf: fold(pdf), schema=_SCHEMA)
    )
