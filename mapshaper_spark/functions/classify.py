"""-classify break computation [SURVEY.md §2.4; upstream
src/classification classify options — quantile / equal-interval /
explicit breaks live in queries.py; this module adds the 'nice' breaks
convenience].

The nice-step snap is PURE ARITHMETIC over a literal decade table (no
log10): both the Python driver computation and the DuckDB oracle search
the same `1e-6 … 1e6` literals and apply the same IEEE multiply/compare
ladder, so data-derived nice breaks are bit-identical across engines
and the classify query is fully hash-checkable. ``nice_breaks`` runs on
two scalar aggregates (data min/max) — a legal driver-side computation
(the per-row classification stays declarative column math).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

NICE_STEPS = (1.0, 2.0, 2.5, 5.0, 10.0)

# literal decade table: the SQL oracle embeds the same literal text, so
# both engines hold the identical doubles (10.0**-k via pow is NOT
# guaranteed to equal the literal — never compute these)
DECADES = (
    1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1,
    1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6,
)
DECADE_LITERALS = (
    "1e-6", "1e-5", "1e-4", "1e-3", "1e-2", "1e-1",
    "1e0", "1e1", "1e2", "1e3", "1e4", "1e5", "1e6",
)


def nice_step(raw_step: float) -> float:
    """Snap a raw step to the smallest nice value >= it:
    {1, 2, 2.5, 5, 10} x the decade with m <= raw < 10m."""
    if not raw_step > 0:
        raise ValueError("nice_step needs a positive step")
    mag = None
    for m in DECADES:
        if m <= raw_step < m * 10.0:
            mag = m
            break
    if mag is None:
        raise ValueError(f"step {raw_step!r} outside the decade table")
    for s in NICE_STEPS:
        if raw_step <= s * mag:
            return s * mag
    return 10.0 * mag


def nice_breaks(lo: float, hi: float, n_classes: int) -> list[float]:
    """Interior class breaks on nice multiples covering [lo, hi]:
    step = nice(span / n), breaks at first + i·step (multiplication,
    not accumulation — the oracle computes the same products) strictly
    inside the range. len(breaks) <= n_classes - 1 (nice-ness trades
    class count for round numbers, exactly like upstream)."""
    if hi <= lo:
        return []
    step = nice_step((hi - lo) / float(n_classes))
    first = math.ceil(lo / step) * step
    out = []
    for i in range(n_classes + 2):
        b = first + i * step
        if b >= hi:
            break
        if b > lo:
            out.append(b)
    return out


def classify_by_breaks(col: Column, breaks: list[float]) -> Column:
    """Class index 0..len(breaks) from ascending interior breaks
    (value < breaks[i] → class i; else last class — equivalently, the
    count of breaks <= value, which is the oracle's formulation)."""
    expr = F.lit(len(breaks))
    for i in reversed(range(len(breaks))):
        expr = F.when(col < F.lit(breaks[i]), F.lit(i)).otherwise(expr)
    return expr.cast("int")


def nice_breaks_oracle_sql(value_col: str, table: str, n_classes: int) -> str:
    """The DuckDB twin of nice_breaks + classify: identical arithmetic
    over the same decade literals, returning (cls, n) counts."""
    decades = ",".join(f"({d})" for d in DECADE_LITERALS)
    steps_case = (
        "CASE WHEN step0 <= 1.0 * m THEN 1.0 * m"
        " WHEN step0 <= 2.0 * m THEN 2.0 * m"
        " WHEN step0 <= 2.5 * m THEN 2.5 * m"
        " WHEN step0 <= 5.0 * m THEN 5.0 * m"
        " ELSE 10.0 * m END"
    )
    return f"""
    WITH s AS (SELECT min({value_col}) AS lo, max({value_col}) AS hi FROM {table}),
    raw AS (SELECT lo, hi, (hi - lo) / CAST({n_classes} AS DOUBLE) AS step0 FROM s),
    mg AS (SELECT r.lo, r.hi, r.step0, d.m
           FROM raw r JOIN (VALUES {decades}) d(m)
             ON d.m <= r.step0 AND r.step0 < d.m * 10.0),
    nice AS (SELECT lo, hi, {steps_case} AS stp FROM mg),
    brks AS (SELECT ceil(lo / stp) * stp + i * stp AS b, lo, hi
             FROM nice, range(0, {n_classes + 2}) r(i)),
    valid AS (SELECT b FROM brks WHERE b > lo AND b < hi),
    cl AS (SELECT (SELECT count(*) FROM valid v WHERE c.{value_col} >= v.b) AS cls
           FROM {table} c)
    SELECT CAST(cls AS INT) AS cls, count(*) AS n FROM cl GROUP BY cls
    """
