"""-classify break computation [SURVEY.md §2.4; upstream
src/classification classify options — quantile / equal-interval /
explicit breaks live in queries.py; this module adds the 'nice' breaks
convenience].

``nice_breaks`` runs on two scalar aggregates (data min/max) — a legal
driver-side computation (the per-row classification stays declarative
column math, whole-stage codegen).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

NICE_STEPS = (1.0, 2.0, 2.5, 5.0, 10.0)


def nice_step(raw_step: float) -> float:
    """Snap a raw step to the smallest 'nice' value >= it:
    {1, 2, 2.5, 5} x 10^k."""
    if raw_step <= 0:
        raise ValueError("nice_step needs a positive step")
    mag = 10.0 ** math.floor(math.log10(raw_step))
    for m in NICE_STEPS:
        if raw_step <= m * mag * (1 + 1e-12):
            return m * mag
    return 10.0 * mag


def nice_breaks(lo: float, hi: float, n_classes: int) -> list[float]:
    """Interior class breaks on nice multiples covering [lo, hi]:
    step = nice(span / n), breaks at step multiples strictly inside the
    range. len(breaks) <= n_classes - 1 (nice-ness may merge classes,
    exactly like upstream's nice option trades class count for round
    numbers)."""
    if hi <= lo:
        return []
    step = nice_step((hi - lo) / n_classes)
    first = math.ceil(lo / step) * step
    out = []
    b = first
    while b <= hi:
        if lo < b < hi:
            # kill float drift so breaks print as the round numbers they are
            out.append(round(b, 10))
        b += step
    return out


def classify_by_breaks(col: Column, breaks: list[float]) -> Column:
    """Class index 0..len(breaks) from ascending interior breaks
    (value < breaks[i] → class i; else last class)."""
    expr = F.lit(len(breaks))
    for i in reversed(range(len(breaks))):
        expr = F.when(col < F.lit(breaks[i]), F.lit(i)).otherwise(expr)
    return expr.cast("int")
