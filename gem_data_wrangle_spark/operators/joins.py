"""Join operators (SURVEY §2.4).

Every reference join is a one-key equi left-join with a small right
side, so each builder broadcasts the dimension explicitly — at 100 TB
the fact side never shuffles for these. AQE would usually infer the
broadcast; stating it makes the plan deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_left_enrich(fact: DataFrame, dim: DataFrame, on: str | Sequence[str], broadcast_dim: bool = True) -> DataFrame:
    """Left-join an aggregated summary back onto the detail rows
    (``GEM/Coalplants_GEM.R:74-76``)."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how="left")


def join_left_coalesce(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    coalesce_pairs: dict[str, tuple[str, str]],
    drop_after: Sequence[str] = (),
    broadcast_right: bool = True,
) -> DataFrame:
    """Left join then ``ifelse(is.na(x), y, x)``
    (``GEM/TotalData_GEM.R:31-34``): for each output column name map
    ``(primary, fallback)`` → ``coalesce(primary, fallback)``."""
    r = F.broadcast(right) if broadcast_right else right
    out = left.join(r, on=on, how="left")
    out = out.withColumns({name: F.coalesce(F.col(a), F.col(b)) for name, (a, b) in coalesce_pairs.items()})
    return out.drop(*drop_after)


def join_lookup_dim(
    df: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    overrides: dict[str, Column] | None = None,
) -> DataFrame:
    """Broadcast dimension lookup (``countrycode()`` replacement,
    ``GEM/Coalplants_GEM.R:200-201``). ``overrides`` patches values
    post-join (the reference's manual Kosovo→XK)."""
    out = df.join(F.broadcast(dim), on=key, how="left")
    for col_name, expr in (overrides or {}).items():
        out = out.withColumn(col_name, expr)
    return out


def join_fallback_chain(
    fact: DataFrame,
    specific: DataFrame,
    general: DataFrame,
    specific_on: str | Sequence[str],
    general_on: str | Sequence[str] | None,
    value_col: str,
    out_col: str,
    default: float | None = None,
) -> DataFrame:
    """Two-level enrichment fallback (``GEM/TotalData_GEM.R:115-135``):
    country-specific value, else global value, else a default. Two
    broadcast left-joins + one ``coalesce`` — zero fact-side shuffles.

    ``specific``/``general`` must expose ``value_col``; they are
    renamed internally to avoid collisions. ``general_on=None`` means
    the general level is keyless (a global scalar) and is attached with
    a broadcast cross join.
    """
    s = specific.withColumnRenamed(value_col, "_v_specific")
    g = general.withColumnRenamed(value_col, "_v_general")
    out = fact.join(F.broadcast(s), on=specific_on, how="left")
    if general_on is None:
        out = out.crossJoin(F.broadcast(g))
    else:
        out = out.join(F.broadcast(g), on=general_on, how="left")
    chain = [F.col("_v_specific"), F.col("_v_general")]
    if default is not None:
        chain.append(F.lit(default))
    return out.withColumn(out_col, F.coalesce(*chain)).drop("_v_specific", "_v_general")
