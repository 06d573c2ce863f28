"""Per-partition lineage + resume-from-checkpoint [BASELINE.json
north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §4.2 item 6].

Every stage writes its output bucketed by a deterministic, *spatially
contiguous* bucket key — the Z-order (Morton) prefix of ``cell_id`` at a
coarse resolution. A Z-prefix bucket is a contiguous cell_id range, so
each lineage row carries a true (cell_lo, cell_hi) range plus row count
and an order-independent content hash (bit_xor of xxhash64 over the
row's columns). Resume = anti-join the input's buckets against the
completed lineage and process only the missing ones; the bucket key is
pure column math on cell_id, so the mapping is identical across runs,
parallelism levels, and cluster sizes (no sampled range boundaries).

At 100 TB: the bucket count is the checkpoint granularity knob —
``bucket_res=4`` gives 256 resumable units; the lineage table is KBs and
the completed-bucket set always broadcasts.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, bucket long, cell_lo long, cell_hi long, "
    "row_count long, content_hash long, wall_ts double"
)


def bucket_expr(cell_col: str, res: int, bucket_res: int) -> str:
    """Z-prefix bucket: the morton code truncated to ``bucket_res`` —
    i.e. the ancestor cell index. Pure arithmetic, deterministic."""
    shift = 2 * (res - bucket_res)
    return f"(CAST({cell_col} AS BIGINT) DIV 32) DIV {1 << shift}"


def _content_hash(df: DataFrame, cols: list[str]):
    return F.expr(f"bit_xor(xxhash64({', '.join(cols)}))")


def read_lineage(spark: SparkSession, lineage_path: str, stage: str) -> DataFrame | None:
    if not os.path.exists(lineage_path):
        return None
    ln = spark.read.parquet(lineage_path)
    return ln.filter(F.col("stage") == stage)


def completed_buckets(spark: SparkSession, lineage_path: str, stage: str) -> DataFrame | None:
    ln = read_lineage(spark, lineage_path, stage)
    return None if ln is None else ln.select("bucket").distinct()


def run_stage(
    df: DataFrame,
    stage: str,
    out_path: str,
    lineage_path: str,
    res: int,
    bucket_res: int = 2,
    cell_col: str = "cell_id",
    hash_cols: list[str] | None = None,
) -> dict:
    """Execute one resumable stage: skip buckets already in the lineage,
    land the rest (data partitioned by (bucket, stage) + sorted by cell
    within partitions — the range-partitioned sorted write [north_rule]),
    then append their lineage rows. Returns {'buckets_done',
    'buckets_skipped', 'rows'} metrics.

    Exactly-once replay: data lands under ``_bucket=<b>/_stage=<stage>``
    via DYNAMIC partition overwrite, so a stage replayed after a crash
    between the data write and the lineage append (the lineage row is the
    commit marker) overwrites its own orphaned partitions instead of
    appending duplicates; other stages/micro-batches sharing the same
    bucket live in sibling ``_stage`` directories and are never touched.
    The post-write lineage aggregation reads back ONLY this stage's
    partition directories (``_stage`` filter → partition pruning), not the
    whole table [VERDICT r1 #7, ADVICE r1]."""
    spark = df.sparkSession
    hash_cols = hash_cols or df.columns
    b = df.withColumn("_bucket", F.expr(bucket_expr(cell_col, res, bucket_res)))

    done = completed_buckets(spark, lineage_path, stage)
    n_skip = 0
    if done is not None:
        n_skip = done.count()
        b = b.join(F.broadcast(done), b._bucket == done.bucket, "left_anti")

    # one shuffle: partition by bucket, sort by cell within each —
    # downstream consumers get clustered, range-pruned parquet
    b = b.repartition(F.col("_bucket")).sortWithinPartitions(cell_col)
    (
        b.withColumn("_stage", F.lit(stage))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket", "_stage")
        .parquet(out_path)
    )

    # lineage from what was just written (read-back = what's durable);
    # the _stage predicate prunes to the directories this call created
    written = (
        spark.read.parquet(out_path)
        .filter(F.col("_stage") == stage)
        .drop("_stage")
        .withColumnRenamed("_bucket", "bucket")
    )
    if done is not None:
        written = written.join(F.broadcast(done), "bucket", "left_anti")
    lineage = written.groupBy("bucket").agg(
        F.min(cell_col).alias("cell_lo"),
        F.max(cell_col).alias("cell_hi"),
        F.count(F.lit(1)).alias("row_count"),
        _content_hash(written, hash_cols).alias("content_hash"),
    )
    lineage = lineage.select(
        F.lit(stage).alias("stage"),
        F.col("bucket").cast("long"),
        "cell_lo",
        "cell_hi",
        "row_count",
        "content_hash",
        F.lit(time.time()).alias("wall_ts"),
    )
    rows = lineage.agg(
        F.count(F.lit(1)).alias("nb"), F.sum("row_count").alias("nr")
    ).collect()[0]
    lineage.write.mode("append").parquet(lineage_path)
    return {
        "buckets_done": int(rows["nb"]),
        "buckets_skipped": int(n_skip),
        "rows": int(rows["nr"] or 0),
    }


def compact(
    spark: SparkSession,
    out_path: str,
    lineage_path: str,
    dest_path: str,
    dest_lineage_path: str,
    cell_col: str = "cell_id",
    stage: str = "compacted",
) -> dict:
    """Stage-directory compaction [NEXT r3: long streams accumulate one
    ``_stage=`` dir per micro-batch]: rewrite the WHOLE table into a
    fresh generation at ``dest_path`` under a single stage, with one
    lineage record per bucket. Generation-based for crash safety: the
    source table and its lineage are never touched — the caller switches
    readers to the new paths only after the returned verification flag
    is true (and then garbage-collects the old generation).

    Returns {'rows', 'buckets', 'verified'}."""
    src = spark.read.parquet(out_path).drop("_stage")
    (
        src.repartition(F.col("_bucket"))
        .sortWithinPartitions(cell_col)
        .withColumn("_stage", F.lit(stage))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket", "_stage")
        .parquet(dest_path)
    )
    written = (
        spark.read.parquet(dest_path)
        .filter(F.col("_stage") == stage)
        .drop("_stage")
        .withColumnRenamed("_bucket", "bucket")
    )
    hash_cols = [c for c in written.columns if c != "bucket"]
    lineage = written.groupBy("bucket").agg(
        F.min(cell_col).alias("cell_lo"),
        F.max(cell_col).alias("cell_hi"),
        F.count(F.lit(1)).alias("row_count"),
        _content_hash(written, hash_cols).alias("content_hash"),
    )
    lineage = lineage.select(
        F.lit(stage).alias("stage"),
        F.col("bucket").cast("long"),
        "cell_lo",
        "cell_hi",
        "row_count",
        "content_hash",
        F.lit(time.time()).alias("wall_ts"),
    )
    lineage.write.mode("overwrite").parquet(dest_lineage_path)
    stats = written.agg(
        F.count(F.lit(1)).alias("nr"), F.countDistinct("bucket").alias("nb")
    ).collect()[0]
    ok = verify_lineage(spark, dest_path, dest_lineage_path) and (
        int(stats["nr"]) == src.count()
    )
    return {"rows": int(stats["nr"]), "buckets": int(stats["nb"]), "verified": bool(ok)}


def verify_lineage(
    spark: SparkSession, out_path: str, lineage_path: str, stage: str | None = None
) -> bool:
    """Recompute per-bucket stats from the durable output and compare to
    the lineage records — the integrity check a resume runs first.

    With ``stage`` given, only that stage's partition directories are
    read (pruned) and compared against its lineage rows. With
    ``stage=None`` the WHOLE table is checked against the lineage
    aggregated across all stages: row counts add and the per-row-xor
    content hashes combine by ``bit_xor``, so multi-batch buckets verify
    exactly. A duplicated replay is caught by the row-count sum even
    though its xor self-cancels."""
    if not os.path.exists(lineage_path):
        return False
    ln = spark.read.parquet(lineage_path)
    if stage is not None:
        ln = ln.filter(F.col("stage") == stage)
    if ln.limit(1).count() == 0:
        return False
    exp = ln.groupBy("bucket").agg(
        F.sum("row_count").alias("row_count"),
        F.expr("bit_xor(content_hash)").alias("content_hash"),
    )
    data = spark.read.parquet(out_path)
    if stage is not None:
        data = data.filter(F.col("_stage") == stage)
    data = data.drop("_stage").withColumnRenamed("_bucket", "bucket")
    hash_cols = [c for c in data.columns if c != "bucket"]
    got = data.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rc_got"),
        _content_hash(data, hash_cols).alias("ch_got"),
    )
    diff = (
        got.join(exp, "bucket", "full")
        .filter(
            F.col("rc_got").isNull()
            | F.col("row_count").isNull()
            | (F.col("rc_got") != F.col("row_count"))
            | (F.col("ch_got") != F.col("content_hash"))
        )
        .count()
    )
    return diff == 0
