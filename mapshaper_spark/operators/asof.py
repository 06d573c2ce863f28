"""As-of join [SURVEY.md §2.3: upstream has none (no time series);
engine surface via cogrouped ``applyInPandas`` + ``pd.merge_asof`` —
the SNIPPETS.md distributed as-of pattern].

Semantics: for every left row, attach the single right row with the
largest ``on`` value <= the left's (backward direction), within equal
``by`` keys. Both sides shuffle once on the ``by`` key; each group is
sorted locally in pandas — no global sort.

At scale: groups are per-key (user, symbol, sensor); skewed keys can be
range-split by time with boundary replication — not needed for the
driver tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join. Output = left columns + right ``on`` (as
    ``{on}{suffix}``) + ``right_cols``; unmatched lefts keep nulls."""
    lcols = left.columns
    on_r = f"{on}{suffix}"
    # rename the right key BEFORE the cogroup: (a) merge_asof would
    # collapse a same-named key into one column, and (b) Spark's
    # cogroup Arrow serializer drops right-side attributes that shadow
    # left-side names
    right = right.withColumnRenamed(on, on_r)

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on, kind="mergesort")
        rdf = rdf[[on_r] + right_cols].sort_values(on_r, kind="mergesort")
        return pd.merge_asof(
            ldf, rdf, left_on=on, right_on=on_r, direction="backward"
        )

    out_fields = []
    for f in left.schema.fields:
        out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    rmap = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_fields.append(f"{on_r} {rmap[on_r]}")
    for c in right_cols:
        out_fields.append(f"{c} {rmap[c]}")
    schema = ", ".join(out_fields)

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=schema)
        .select(*lcols, on_r, *right_cols)
    )


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join as a single JVM window pass — no Python in the
    plan. Union both sides with a side flag that sorts right rows before
    left rows at equal ``on``, then ``last(col, ignorenulls)`` over
    (PARTITION BY ``by`` ORDER BY ``on``, side ROWS UNBOUNDED PRECEDING)
    carries the most recent right attributes onto each left row.

    Same output contract as :func:`asof_join`. One shuffle (on ``by``),
    whole-stage-codegen window — replaces thousands of per-group pandas
    invocations in the cogroup plan [VERDICT r1 perf audit]. Requires the
    right side unique per (by, on) with non-null ``right_cols`` for
    deterministic fills (each column is carried independently).
    """
    lcols = left.columns
    on_r = f"{on}{suffix}"
    rmap = {f.name: f.dataType for f in right.schema.fields}

    lhs = left.withColumn("_side", F.lit(1)).withColumn(on_r, F.lit(None).cast(rmap[on]))
    for c in right_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(rmap[c]))
    rhs = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(on_r),
        *right_cols,
    )
    for f in left.schema.fields:
        if f.name not in (by, on):
            rhs = rhs.withColumn(f.name, F.lit(None).cast(f.dataType))

    w = (
        Window.partitionBy(by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = lhs.unionByName(rhs).select(
        *lcols,
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in [on_r, *right_cols]],
    )
    return filled.filter(F.col("_side") == 1).select(*lcols, on_r, *right_cols)
