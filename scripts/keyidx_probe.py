"""Probe: the ring-emitter stitch tail at >2^20 distinct keys
[VERDICT r4 'Next round' #1 done-criterion].

The r4 implementation of ``_stitch_border_paths`` allocated path ids
from a dense_rank key index — an UNPARTITIONED global sort over the
distinct output keys with a loud ``assert_true`` at 2^20 of them. The
clean emitter embeds feature_id and the mosaic emitter the members_csv
in the key, so a 100-TB layer hits that cap long before geometry
becomes the problem. r5 replaced it with a content-addressed
``xxhash64(key, path_seq, grid-origin salt)`` id plus an exact
collision check (count vs count_distinct — a distributed hash agg over
id metadata, no sort, no cap).

This probe drives the shared stitch tail directly with 2.2M distinct
keys (2.2M closed rings, the id-allocation path every row takes) plus
a small open-path cohort so pairing -> CC -> assembly also execute,
and records wall time + output counts to BENCH/keyidx_probe.json.
Under the r4 code the same input raises
``dissolve2_rings_tiled: >2^20 distinct keys``.

Run: python scripts/keyidx_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapshaper_spark import session  # noqa: E402
from mapshaper_spark.operators import overlay  # noqa: E402

N_KEYS = 2_200_000  # > 2^20 = 1,048,576, the r4 cap


def main() -> None:
    spark = session.get_spark()
    t0 = time.time()

    closed = spark.range(N_KEYS).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.lit(0).cast("long").alias("path_seq"),
        F.lit(True).alias("closed"),
        F.array(F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0)).alias("xs"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(2.0)).alias("ys"),
    )
    # open cohort: per key, a CCW square split by the cell line x=10
    # into two open paths whose endpoints pair on that line
    open_rows = []
    for i in range(8):
        key = f"open{i}"
        open_rows.append(
            {
                "key": key,
                "path_seq": 1,
                "closed": False,
                "xs": [10.0, 6.0, 6.0, 10.0],
                "ys": [2.0, 2.0, 6.0, 6.0],
            }
        )
        open_rows.append(
            {
                "key": key,
                "path_seq": (1 << 20) + 1,
                "closed": False,
                "xs": [10.0, 14.0, 14.0, 10.0],
                "ys": [6.0, 6.0, 2.0, 2.0],
            }
        )
    open_df = spark.createDataFrame(
        pd.DataFrame(open_rows),
        schema=(
            "key string, path_seq long, closed boolean,"
            " xs array<double>, ys array<double>"
        ),
    )
    raw = closed.unionByName(open_df)

    rings = overlay._stitch_border_paths(
        raw, 0.0, 0.0, 10.0, 10.0, 1e-12, False, "keyidx_probe:"
    )
    agg = rings.select(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("key").alias("k"),
        F.sum("n_vertices").alias("v"),
    ).first()
    elapsed = time.time() - t0

    assert agg.k == N_KEYS + 8, agg
    assert agg.n == N_KEYS + 8, agg
    out = {
        "probe": "stitch-tail key ids at >2^20 distinct keys",
        "n_distinct_keys": int(agg.k),
        "n_rings_out": int(agg.n),
        "n_vertices_out": int(agg.v),
        "elapsed_sec": round(elapsed, 2),
        "previous_cap": 1 << 20,
        "previous_behavior": (
            "dense_rank over Window.orderBy(key): single-task global sort,"
            " assert_true '>2^20 distinct keys' raises on this input"
        ),
        "now": (
            "xxhash64(key, path_seq, grid-origin salt) + exact collision"
            " check (count vs count_distinct); no sort, no cap"
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/keyidx_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
