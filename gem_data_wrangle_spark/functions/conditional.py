"""Conditional / case expressions (SURVEY §2.9)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def case_when_capacity(
    year: Column,
    start_year: Column,
    retirement_year: Column,
    allocated: Column,
    horizon_end: int = 2050,
) -> Column:
    """Per-year capacity value (``GEM/Coalplants_GEM.R:143-147``):
    0 before start; 0 from retirement (when retirement <= horizon);
    else the allocated capacity."""
    return (
        F.when(year < start_year, F.lit(0.0))
        .when(
            retirement_year.isNotNull()
            & (year >= retirement_year)
            & (retirement_year <= F.lit(horizon_end)),
            F.lit(0.0),
        )
        .otherwise(allocated)
    )


def classify_first_mention(
    text: Column,
    labels: Sequence[tuple[str, str]],
    tie_label: str | None = None,
    default: str = "Not Sure",
) -> Column:
    """Substring classification with first-mention-wins tiebreak
    (``GEM/GasOilplants_GEM.R:25-39``): each ``(needle, label)`` in
    ``labels``; if several needles present, the earliest position wins
    (``str_locate`` parity; ``instr`` = 0 means absent)."""
    lowered = F.lower(text)
    positions = [(F.instr(lowered, needle), label) for needle, label in labels]
    result = F.lit(default)
    # Build from the default outward: a needle claims the row if present
    # and no other present needle occurs earlier.
    for i, (pos_i, label_i) in enumerate(positions):
        earlier_other = F.lit(False)
        for j, (pos_j, _) in enumerate(positions):
            if i == j:
                continue
            earlier_other = earlier_other | ((pos_j > 0) & (pos_j < pos_i))
        result = F.when((pos_i > 0) & ~earlier_other, F.lit(label_i)).otherwise(result)
    if tie_label is not None and len(positions) >= 2:
        p0, p1 = positions[0][0], positions[1][0]
        result = F.when((p0 > 0) & (p0 == p1), F.lit(tie_label)).otherwise(result)
    return result


def ifelse_coalesce(primary: Column, fallback: Column) -> Column:
    """``ifelse(is.na(x), y, x)`` (``GEM/TotalData_GEM.R:33``)."""
    return F.coalesce(primary, fallback)
