"""Scale probe for ring-layer reprojection (`project_layer`): N
synthetic 10-vertex rings built by pure column math, reprojected
lonlat -> WebMercator -> back, with the roundtrip identity checked as
a distributed aggregate (max abs error over every vertex).

The plan under test is the real -proj layer path: posexplode ->
codegen trig per vertex -> positional regroup (one shuffle on the
ring keys). Also times the d3-convention spherical rotation through
the same path.

Usage: python scripts/proj_scale_probe.py [N ...]   (default: 100000 1000000)
Writes BENCH/proj_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapshaper_spark.functions import proj as proj_fn
from mapshaper_spark.session import get_spark


def synth_rings(spark, n: int):
    # 10-vertex rings scattered on a lon/lat lattice (poles excluded)
    return spark.range(n).select(
        F.col("id").alias("poly_id"),
        F.lit(0).alias("ring_idx"),
        F.expr(
            "transform(sequence(0, 9), i -> -170.0D"
            " + CAST(id % 340 AS DOUBLE) + 0.01D * CAST(i AS DOUBLE))"
        ).alias("xs"),
        F.expr(
            "transform(sequence(0, 9), i -> -80.0D"
            " + CAST(id DIV 340 % 160 AS DOUBLE) + 0.01D * CAST(i AS DOUBLE))"
        ).alias("ys"),
    )


def run(spark, n: int) -> dict:
    rings = synth_rings(spark, n).localCheckpoint()
    out: dict = {"n_rings": n, "n_vertices": 10 * n}

    t0 = time.time()
    fwd = proj_fn.project_layer(
        rings, proj_fn.to_webmercator, out=("mx", "my")
    )
    back = proj_fn.project_layer(
        # project_layer names the exploded vertex columns lon/lat
        # whatever they hold — here they carry the Mercator meters
        fwd,
        lambda d: proj_fn.from_webmercator(d, mx="lon", my="lat"),
        out=("lon2", "lat2"),
    )
    # roundtrip identity as one distributed aggregate over every vertex
    err = back.join(rings.withColumnRenamed("xs", "oxs").withColumnRenamed("ys", "oys"),
                    ["poly_id", "ring_idx"]).select(
        F.expr(
            "aggregate(zip_with(xs, oxs, (a, b) -> abs(a - b)),"
            " CAST(0.0 AS DOUBLE), (m, v) -> greatest(m, v))"
        ).alias("ex"),
        F.expr(
            "aggregate(zip_with(ys, oys, (a, b) -> abs(a - b)),"
            " CAST(0.0 AS DOUBLE), (m, v) -> greatest(m, v))"
        ).alias("ey"),
    ).agg(F.max("ex").alias("ex"), F.max("ey").alias("ey")).first()
    out["webmercator_roundtrip_sec"] = round(time.time() - t0, 2)
    assert err.ex < 1e-9 and err.ey < 1e-9, err
    out["roundtrip_max_err_deg"] = max(err.ex, err.ey)

    t0 = time.time()
    rot = proj_fn.project_layer(
        rings,
        lambda d: proj_fn.rotate_sphere(d, (110.0, -35.0, 20.0), out=("rx", "ry")),
        out=("rx", "ry"),
    )
    # consume the VALUES — a bare count() after the groupBy lets
    # Catalyst prune the collect_list + trig entirely (measured 1.0 s
    # for 10M vertices = nothing ran)
    agg = rot.agg(
        F.count("*").alias("c"),
        F.sum(F.expr("xs[0] + ys[0]")).alias("s"),
    ).first()
    out["rotate_sec"] = round(time.time() - t0, 2)
    assert agg.c == n, agg
    out["rotate_vertices_per_sec"] = int(10 * n / max(out["rotate_sec"], 1e-9))

    # --- zero-shuffle in-place path (closed-form projections as
    # zip_with lambdas; project_layer_inplace) — same expression
    # trees, no explode, no regroup exchange
    t0 = time.time()
    fwd_ip = proj_fn.project_layer_inplace(rings, proj_fn.webmercator_xy)
    back_ip = proj_fn.project_layer_inplace(fwd_ip, proj_fn.webmercator_inv_xy)
    err = back_ip.join(
        rings.withColumnRenamed("xs", "oxs").withColumnRenamed("ys", "oys"),
        ["poly_id", "ring_idx"],
    ).select(
        F.expr(
            "aggregate(zip_with(xs, oxs, (a, b) -> abs(a - b)),"
            " CAST(0.0 AS DOUBLE), (m, v) -> greatest(m, v))"
        ).alias("ex"),
        F.expr(
            "aggregate(zip_with(ys, oys, (a, b) -> abs(a - b)),"
            " CAST(0.0 AS DOUBLE), (m, v) -> greatest(m, v))"
        ).alias("ey"),
    ).agg(F.max("ex").alias("ex"), F.max("ey").alias("ey")).first()
    out["webmercator_roundtrip_inplace_sec"] = round(time.time() - t0, 2)
    assert err.ex < 1e-9 and err.ey < 1e-9, err
    out["roundtrip_inplace_max_err_deg"] = max(err.ex, err.ey)

    t0 = time.time()
    rot_ip = proj_fn.project_layer_inplace(
        rings, proj_fn.rotate_sphere_xy((110.0, -35.0, 20.0))
    )
    agg = rot_ip.agg(
        F.count("*").alias("c"),
        F.sum(F.expr("xs[0] + ys[0]")).alias("s"),
    ).first()
    out["rotate_inplace_sec"] = round(time.time() - t0, 2)
    assert agg.c == n, agg
    out["rotate_inplace_vertices_per_sec"] = int(
        10 * n / max(out["rotate_inplace_sec"], 1e-9)
    )
    return out


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark("proj-probe", cpus=32, shuffle_partitions=32)
    results = [run(spark, n) for n in ns]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "proj_probe.json",
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
