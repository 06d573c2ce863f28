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
from pyspark.sql import DataFrame


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
