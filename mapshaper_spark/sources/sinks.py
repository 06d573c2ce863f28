"""Sinks: range-partitioned, sorted parquet on cell_id [BASELINE.json
north_rule "range-partitioned shuffle on cell_id"].

``write_cell_ranged`` is the canonical table layout: one
``repartitionByRange`` shuffle on cell_id + an in-partition sort, so
every output file owns a disjoint, sorted cell_id range (verified by
``file_cell_ranges``). Downstream effects at scale:

- parquet row-group min/max stats on cell_id are tight → a cell-range
  predicate prunes to the few files that own the range;
- merge-style spatial joins between two tables written this way need no
  re-shuffle (co-ranged);
- Z-order cell ids make a cell range a contiguous spatial region.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_cell_ranged(
    df: DataFrame, path: str, n_partitions: int, cell_col: str = "cell_id"
) -> None:
    (
        df.repartitionByRange(n_partitions, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def split_layers(df: DataFrame, path: str, key: str = "key") -> None:
    """-split [key]: one output layer (partition directory) per key
    value [SURVEY.md §2.4 -split]. Hive-style ``key=<value>`` dirs, so a
    single-layer read (`read_split_layer`) is partition-pruned to one
    directory — the distributed analog of upstream writing one file per
    layer."""
    df.write.mode("overwrite").partitionBy(key).parquet(path)


def read_split_layer(spark: SparkSession, path: str, key: str, value) -> DataFrame:
    """Read ONE split layer back (pruned scan of its directory)."""
    return spark.read.parquet(path).filter(F.col(key) == value)


def split_layer_keys(spark: SparkSession, path: str, key: str = "key") -> list:
    """The key values a split wrote (from the partition dirs)."""
    rows = spark.read.parquet(path).select(key).distinct().collect()
    return sorted(r[key] for r in rows)


def file_cell_ranges(spark: SparkSession, path: str, cell_col: str = "cell_id") -> list:
    """Per-file (min, max) cell ranges of a written table — the
    range-partitioning integrity check (ranges must not overlap)."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    rows = (
        df.groupBy("_file")
        .agg(F.min(cell_col).alias("lo"), F.max(cell_col).alias("hi"))
        .collect()
    )
    return sorted((r["lo"], r["hi"]) for r in rows)
