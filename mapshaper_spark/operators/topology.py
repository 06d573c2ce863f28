"""Shared-arc topology: the distributed arc dictionary.

mapshaper's core data-model idea [SURVEY.md §1.1]: all polyline geometry
lives once in an arc pool; features reference signed arc ids (negative =
traverse reversed, TopoJSON convention ``ref = -(arc_id+1)``). Shared
polygon borders are a single arc, so dissolve / innerlines / simplify
operate on each border exactly once and neighbors can never develop gaps.

Distributed re-expression:

- ``arcs``      DataFrame: (arc_id, xs array<double>, ys array<double>, n, arc_hash)
- ``features``  DataFrame: (feature_id, key?, parts array<array<long>>)
- ``incidence`` = explode(features) → (feature_id, key, arc_id, reversed)
  — every topology operator is a groupBy over this link table:

  * dissolve    = arcs used an odd number of times within a key group
                  survive as group boundary (interior borders appear
                  twice with opposite orientation and cancel)
                  [SURVEY.md §2.4 -dissolve];
  * innerlines  = arcs shared by 2+ features (multiplicity 2)
                  [SURVEY.md §2.7 -innerlines];
  * lines       = arc classification outer/inner [-lines].

Arc dedup on import (topology build) hashes the canonical orientation of
the coordinate sequence — coordinates quantized to 1e-7 first for
byte-determinism [SURVEY.md §7.3].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUANT = 1e7  # 1e-7 degree quantization before hashing


def arcs_df(spark: SparkSession, arcs: list[dict]) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "arc_id": [a["arc_id"] for a in arcs],
            "xs": [a["xs"] for a in arcs],
            "ys": [a["ys"] for a in arcs],
        }
    )
    return spark.createDataFrame(
        pdf, schema="arc_id long, xs array<double>, ys array<double>"
    )


def features_df(spark: SparkSession, features: list[dict]) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "feature_id": [f["feature_id"] for f in features],
            "key": [f["key"] for f in features],
            "parts": [f["parts"] for f in features],
        }
    )
    return spark.createDataFrame(
        pdf, schema="feature_id long, key string, parts array<array<long>>"
    )


def incidence(features: DataFrame) -> DataFrame:
    """features → (feature_id, key, arc_id, reversed) link table.

    Pure column math on the exploded signed refs — no UDF.
    """
    ref = F.explode(F.flatten("parts")).alias("ref")
    df = features.select("feature_id", "key", ref)
    return df.select(
        "feature_id",
        "key",
        F.when(F.col("ref") >= 0, F.col("ref")).otherwise(-F.col("ref") - 1).alias("arc_id"),
        (F.col("ref") < 0).alias("reversed"),
    )


def arc_lengths(arcs: DataFrame) -> DataFrame:
    """(arc_id, arc_len) via a fold over the vertex arrays — stays JVM-side."""
    seg = (
        "aggregate(sequence(0, size(xs) - 2), cast(0.0 as double), "
        "(acc, i) -> acc + sqrt((xs[i+1] - xs[i]) * (xs[i+1] - xs[i]) + "
        "(ys[i+1] - ys[i]) * (ys[i+1] - ys[i])))"
    )
    return arcs.select("arc_id", F.expr(seg).alias("arc_len"))


def dissolve(features: DataFrame, arcs: DataFrame) -> DataFrame:
    """-dissolve [key]: per key, boundary arcs + perimeter.

    Arc cancellation: within a key group an arc used an even number of
    times is an interior border (two adjacent members) → dropped; odd
    multiplicity survives as group boundary. One shuffle on (key, arc_id)
    with map-side partial counts, then a tiny per-key agg.
    """
    inc = incidence(features)
    mult = inc.groupBy("key", "arc_id").agg(F.count(F.lit(1)).alias("mult"))
    boundary = mult.filter(F.col("mult") % 2 == 1)
    withlen = boundary.join(F.broadcast(arc_lengths(arcs)), "arc_id")
    return withlen.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_boundary_arcs"),
        F.sum("arc_len").alias("perimeter"),
    )


def dissolve_sum_fields(
    features: DataFrame,
    arcs: DataFrame,
    sum_fields: list[str],
    copy_fields: list[str] | None = None,
) -> DataFrame:
    """-dissolve with fused attribute aggregation (``sum-fields=`` /
    ``copy-fields=`` [upstream -dissolve options, SURVEY.md §2.4]): one
    operator emits per-key boundary geometry (arc cancellation — see
    :func:`dissolve`) joined with the key's attribute rollup
    (``sum_<f>`` per sum field, ``first_<f>`` = min for copy fields,
    ``n_features``). Two independent shuffles on the same tiny key
    domain, joined at key cardinality."""
    geom = dissolve(features, arcs)
    aggs = [F.sum(c).alias(f"sum_{c}") for c in sum_fields]
    aggs += [F.min(c).alias(f"first_{c}") for c in (copy_fields or [])]
    aggs.append(F.count(F.lit(1)).alias("n_features"))
    attrs = features.groupBy("key").agg(*aggs)
    return geom.join(attrs, "key")


def dissolve2(features: DataFrame) -> DataFrame:
    """-dissolve2 [upstream src/commands/mapshaper-dissolve2.mjs
    behavior, SURVEY.md §2.4]: overlap-TOLERANT dissolve — member
    polygons of a key group are merged with the Greiner–Hormann union
    fold (geometry.union_many), so genuinely overlapping shapes fuse
    where arc-cancellation dissolve assumes clean shared borders. The
    union fold runs on even-odd ring SETS [VERDICT r2 #3], so groups
    whose union closes a donut come back with the hole ring (counted in
    n_rings, subtracting from area) instead of raising.

    Input rows: (feature_id, key, xs, ys) one ring each; one group per
    key (dim-sized groups — the per-key member set). Output:
    (key, n_rings, area) with area = signed ring sum = union measure."""
    import numpy as np

    from .. import geometry

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = [
            np.column_stack([np.asarray(r["xs"]), np.asarray(r["ys"])])
            for _, r in pdf.sort_values("feature_id").iterrows()
        ]
        merged = geometry.union_many(rings)
        area = sum(geometry.shoelace_area_local(r[:, 0], r[:, 1]) for r in merged)
        return pd.DataFrame(
            [{"key": pdf["key"].iloc[0], "n_rings": len(merged), "area": area}]
        )

    return features.groupBy("key").applyInPandas(
        run, schema="key string, n_rings int, area double"
    )


def dissolve_arcs(features: DataFrame) -> DataFrame:
    """The surviving (key, arc_id) boundary set — input to ring stitching."""
    inc = incidence(features)
    mult = inc.groupBy("key", "arc_id").agg(F.count(F.lit(1)).alias("mult"))
    return mult.filter(F.col("mult") % 2 == 1).select("key", "arc_id")


def arc_multiplicity(features: DataFrame) -> DataFrame:
    """Arc → number of distinct features using it (1 = outer boundary,
    2 = shared inner border) over the whole layer."""
    inc = incidence(features)
    return inc.groupBy("arc_id").agg(
        F.countDistinct("feature_id").alias("n_features")
    )


def innerlines(features: DataFrame) -> DataFrame:
    """-innerlines: arcs shared by exactly two features."""
    return arc_multiplicity(features).filter(F.col("n_features") == 2).select("arc_id")


def lines(features: DataFrame) -> DataFrame:
    """-lines: every arc classified 'outer' or 'inner'."""
    m = arc_multiplicity(features)
    return m.select(
        "arc_id",
        F.when(F.col("n_features") >= 2, F.lit("inner")).otherwise(F.lit("outer")).alias("kind"),
    )


def build_arc_hashes(arcs: DataFrame) -> DataFrame:
    """Orientation-invariant content hash of the 1e-7-quantized
    coordinate sequence — the shared-border dedup key for topology build
    on raw geometry import [SURVEY.md §1.2 arc_hash].

    Entirely JVM-side: ``least(xxhash64(fwd), xxhash64(rev))`` over the
    quantized bigint arrays, so both traversal directions of the same
    border collapse to one key with zero Python in the plan (replaces a
    per-byte Python FNV loop — a point-scale path at continental arc
    counts)."""
    qx = "transform(xs, v -> cast(round(v * 1e7) as bigint))"
    qy = "transform(ys, v -> cast(round(v * 1e7) as bigint))"
    return arcs.select(
        "arc_id",
        "xs",
        "ys",
        F.expr(
            f"least(xxhash64({qx}, {qy}),"
            f" xxhash64(reverse({qx}), reverse({qy})))"
        ).alias("arc_hash"),
    )


def dissolve_rings(features: DataFrame, arcs: DataFrame) -> DataFrame:
    """-dissolve with geometry output: per key, the surviving boundary
    arcs chained into closed rings — one ``applyInPandas`` group per
    dissolve key (distributed ring assembly; each group holds only its
    own boundary arcs, which is dim-sized even when the layer is not).

    Output: (key, ring_idx, n_vertices, area) + the ring coordinates.
    """
    boundary = dissolve_arcs(features).join(
        arcs.select("arc_id", "xs", "ys"), "arc_id"
    )

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = stitch_rings(pdf)
        out = []
        for i, ring in enumerate(rings):
            xs = [p[0] for p in ring]
            ys = [p[1] for p in ring]
            # drop closing duplicate for area math
            if len(ring) > 1 and ring[0] == ring[-1]:
                xs, ys = xs[:-1], ys[:-1]
            from .. import geometry

            a2, _sx, _sy = geometry.shoelace_seq_local(xs, ys)
            out.append(
                {
                    "key": pdf["key"].iloc[0],
                    "ring_idx": i,
                    "n_vertices": len(xs),
                    "area": abs(a2) / 2.0,
                    "xs": xs,
                    "ys": ys,
                }
            )
        return pd.DataFrame(
            out, columns=["key", "ring_idx", "n_vertices", "area", "xs", "ys"]
        )

    return boundary.groupBy("key").applyInPandas(
        stitch,
        schema=(
            "key string, ring_idx int, n_vertices int, area double, "
            "xs array<double>, ys array<double>"
        ),
    )


def _walk_all_faces(arcs: list[dict]) -> list[dict]:
    """The planar face walk over an arc set with shared endpoint
    coordinates — at every junction the traversal leaves by the edge
    immediately clockwise of the arrival edge's reverse, so each
    directed arc is used exactly once and interior faces close CCW.
    Returns EVERY cycle (including negative-area outer/hole traversals —
    callers filter) as {arc_ids (signed refs, TopoJSON convention),
    n_arcs, area, xs, ys}."""
    import math

    # directed edge id: (arc_id, forward)
    node_of: dict[tuple[float, float], list] = {}
    geom = {}
    for a in arcs:
        xs, ys = list(a["xs"]), list(a["ys"])
        geom[a["arc_id"]] = (xs, ys)
        node_of.setdefault((xs[0], ys[0]), []).append((a["arc_id"], True))
        node_of.setdefault((xs[-1], ys[-1]), []).append((a["arc_id"], False))

    def head(e):
        xs, ys = geom[e[0]]
        return (xs[-1], ys[-1]) if e[1] else (xs[0], ys[0])

    def depart_angle(e):
        xs, ys = geom[e[0]]
        if e[1]:
            return math.atan2(ys[1] - ys[0], xs[1] - xs[0])
        return math.atan2(ys[-2] - ys[-1], xs[-2] - xs[-1])

    # clockwise-ordered outgoing edges per node
    order: dict[tuple[float, float], list] = {}
    for node, edges in node_of.items():
        order[node] = sorted(edges, key=depart_angle, reverse=True)

    def next_edge(e):
        # arrive at head(e); leave by the edge just clockwise of the
        # reverse of e in the rotation order around that node
        node = head(e)
        rev = (e[0], not e[1])
        ring = order[node]
        i = ring.index(rev)
        return ring[(i + 1) % len(ring)]

    visited = set()
    faces = []
    for a in arcs:
        for fwd in (True, False):
            start = (a["arc_id"], fwd)
            if start in visited:
                continue
            refs = []
            cxs, cys = [], []
            e = start
            while True:
                visited.add(e)
                refs.append(e[0] if e[1] else -e[0] - 1)
                xs, ys = geom[e[0]]
                seq = list(zip(xs, ys)) if e[1] else list(zip(xs[::-1], ys[::-1]))
                cxs.extend(p[0] for p in seq[:-1])
                cys.extend(p[1] for p in seq[:-1])
                e = next_edge(e)
                if e == start:
                    break
            from .. import geometry

            a2, _, _ = geometry.shoelace_seq_local(cxs, cys)
            faces.append(
                {
                    "arc_ids": refs,
                    "n_arcs": len(refs),
                    "area": a2 / 2.0,
                    "xs": cxs,
                    "ys": cys,
                }
            )
    return faces


def polygons_from_arcs(arcs: list[dict]) -> list[dict]:
    """-polygons [upstream src/commands/mapshaper-polygons.mjs behavior,
    SURVEY.md §2.7]: build polygon faces from a bare arc layer via the
    planar face walk (:func:`_walk_all_faces`). The unbounded outer face
    and hole-reverse traversals (negative area) are dropped.

    arcs: [{arc_id, xs, ys}] with shared endpoint coordinates. Returns
    [{face_id, arc_ids (signed refs, TopoJSON convention), n_arcs,
    area, xs, ys}].
    """
    out = [f for f in _walk_all_faces(arcs) if f["area"] > 0.0]
    for i, f in enumerate(out):
        f["face_id"] = i
    return out


def polygons_from_arcs_df(arcs: DataFrame) -> DataFrame:
    """Single-task face walk over a DIM-SIZED arc layer (fixture /
    exchange path). The scale plan is
    :func:`mapshaper_spark.operators.faces.polygons_from_arcs_tiled` —
    per-cell walks merged by border-segment signature, proven exactly
    equal to this construction [tests/test_faces.py] — which the
    registered query runs."""

    def run(it):
        for pdf in it:
            rows = [
                {"arc_id": int(r["arc_id"]), "xs": r["xs"], "ys": r["ys"]}
                for _, r in pdf.iterrows()
            ]
            faces = polygons_from_arcs(rows)
            yield pd.DataFrame(
                [
                    {
                        "face_id": f["face_id"],
                        "n_arcs": f["n_arcs"],
                        "n_vertices": len(f["xs"]),
                        "area": f["area"],
                    }
                    for f in faces
                ],
                columns=["face_id", "n_arcs", "n_vertices", "area"],
            )

    return arcs.coalesce(1).mapInPandas(
        run, schema="face_id int, n_arcs int, n_vertices int, area double"
    )


def stitch_rings(boundary_arcs: pd.DataFrame) -> list[list[tuple[float, float]]]:
    """Driver/test-side ring stitching: chain boundary arcs into closed
    rings (greedy endpoint matching). Used by pytest to verify dissolve
    outputs form closed rings; the distributed path keeps arcs unstitched
    (render/export consumers stitch per feature group)."""
    segs = []
    for _, r in boundary_arcs.iterrows():
        pts = list(zip(r["xs"], r["ys"]))
        segs.append(pts)
    rings = []
    while segs:
        ring = segs.pop()
        grew = True
        while grew and ring[0] != ring[-1]:
            grew = False
            for i, s in enumerate(segs):
                if s[0] == ring[-1]:
                    ring += s[1:]
                elif s[-1] == ring[-1]:
                    ring += s[-2::-1]
                elif s[-1] == ring[0]:
                    ring = s[:-1] + ring
                elif s[0] == ring[0]:
                    ring = s[::-1][:-1] + ring
                else:
                    continue
                segs.pop(i)
                grew = True
                break
        rings.append(ring)
    return rings
