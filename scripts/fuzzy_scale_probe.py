#!/usr/bin/env python
"""-fuzzy-join scale probe: broadcast vs cells prefilter at 10^6 points.

Generates a synthetic point layer (same declarative lon/lat column
math as the driver fixtures) orders of magnitude past the sf0.1
fixture, runs both fallback prefilters over the 16-polygon layer, and
checks they return identical (count, sum) summaries. Writes
BENCH/fuzzy_probe.json. Keep the machine otherwise idle.

Usage: python scripts/fuzzy_scale_probe.py [n_points ...]
       (default: 250_000 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapshaper_spark import fixtures  # noqa: E402
from mapshaper_spark.operators import spatial_join as sj  # noqa: E402
from mapshaper_spark.session import get_spark  # noqa: E402
from mapshaper_spark.sources import testdata  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000]
    spark = get_spark("fuzzy-probe", cpus=32, shuffle_partitions=32)
    polys = testdata.polygons(spark)
    idx = sj.build_cell_index(spark, polys)
    out = {"sizes": []}
    for n in sizes:
        pts = spark.range(n).select(
            F.col("id").alias("point_id"),
            F.expr(fixtures.point_lon_sql("id")).alias("lon"),
            F.expr(fixtures.point_lat_sql("id")).alias("lat"),
        )
        row = {"n_points": n}
        sums = {}
        for pf in ("broadcast", "cells"):
            t = time.time()
            r = (
                sj.fuzzy_join(pts, polys, idx, radius=6.0, prefilter=pf)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("poly_id").alias("s"),
                    F.sum("fuzzy").alias("f"),
                )
                .collect()[0]
            )
            row[f"{pf}_sec"] = round(time.time() - t, 3)
            sums[pf] = (r["n"], r["s"], r["f"])
        assert sums["broadcast"] == sums["cells"], sums
        row["rows"], row["poly_sum"], row["fuzzy_rows"] = sums["broadcast"]
        out["sizes"].append(row)
        print(row, flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "fuzzy_probe.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
