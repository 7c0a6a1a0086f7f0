"""Cleaning / filtering operators (SURVEY §2.2–§2.3).

All pure-Column builders: Catalyst sees plain predicates and pushes
them into the Parquet scan (verify with ``.explain`` → PushedFilters).
R's ``filter`` drops NA predicate rows, which matches SQL three-valued
logic — these compose without special NA handling unless noted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Order-defining projection (``GEM/Coalplants_GEM.R:17-38``)."""
    return df.select(*cols)


def project_drop(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop named columns (``GEM/Coalplants_GEM.R:158-162``)."""
    return df.drop(*cols)


def rename_cols(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename (``GEM/Coalplants_GEM.R:186-198``)."""
    return df.withColumnsRenamed(mapping)


def add_literals(df: DataFrame, values: dict[str, object], typed_nulls: dict[str, str] | None = None) -> DataFrame:
    """Constant columns incl. typed NULLs (``GEM/Coalplants_GEM.R:199-210``)."""
    cols: dict[str, Column] = {k: F.lit(v) for k, v in values.items()}
    for name, dtype in (typed_nulls or {}).items():
        cols[name] = F.lit(None).cast(dtype)
    return df.withColumns(cols)


def cast_numeric(df: DataFrame, cols: Sequence[str], dtype: str = "double") -> DataFrame:
    """String→double cast (``GEM/Coalplants_GEM.R:59-60``,
    ``GEM/solarplants_GEM.R:21-23``). Non-numeric strings become NULL,
    matching R ``as.numeric`` warnings-to-NA."""
    # try_cast: Spark 4 ANSI mode makes plain cast throw on malformed
    # strings; R as.numeric yields NA — try_cast matches that.
    return df.withColumns({c: F.col(c).try_cast(dtype) for c in cols})


def filter_isin(df: DataFrame, column: str, allowed: Sequence[str]) -> DataFrame:
    """Status whitelist (``GEM/Coalplants_GEM.R:41``). ``%in%`` is
    NA-safe-false, identical to Spark ``isin`` under 3VL (NULL never
    matches)."""
    return df.filter(F.col(column).isin(list(allowed)))


def filter_not_and(df: DataFrame, cond_a: Column, cond_b: Column) -> DataFrame:
    """Drop rows where both conditions hold
    (``GEM/Coalplants_GEM.R:46-47``). NULL conjuncts make the NOT
    evaluate NULL → row dropped, same as R ``filter(!(a & b))`` on NA."""
    return df.filter(~(cond_a & cond_b))


def filter_capacity_known(
    df: DataFrame,
    column: str,
    sentinels: Sequence[str] = ("N/A", "unknown"),
    drop_null_zero: bool = True,
) -> DataFrame:
    """Drop unknown capacities, while the column is still string-typed.

    Two reference variants:

    * ``drop_null_zero=True`` — every non-coal script
      (``GEM/GasOilplants_GEM.R:88-92``, ``Hydroplants_GEM.R:122-127``,
      nuclear/solar/wind/bio/geo): sentinel strings OR NULL OR zero.
    * ``drop_null_zero=False`` — the coal variant
      (``GEM/Coalplants_GEM.R:54``): only the sentinel strings; NULL
      and zero capacities survive (R ``%in%`` is NA-safe-false, so
      ``!(cap %in% sentinels)`` keeps NA rows).
    """
    c = F.col(column)
    cond = c.isin(list(sentinels))
    if drop_null_zero:
        cond = cond | c.isNull() | (c.try_cast("double") == 0.0)
    # `cond IS NOT TRUE` so NULL capacity is kept in the coal variant
    # (plain `~cond` would drop it under 3VL).
    return df.filter(~F.coalesce(cond, F.lit(False)))


def filter_notnull(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop NULL-key rows (``GEM/Coalplants_GEM.R:122-123``)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def filter_null_or_ge(df: DataFrame, column: str, threshold: float) -> DataFrame:
    """Keep NULL or >= threshold (``GEM/Coalplants_GEM.R:127-128``:
    retirement NULL or >= 2024)."""
    c = F.col(column)
    return df.filter(c.isNull() | (c.try_cast("double") >= F.lit(threshold)))


def replace_value_global(df: DataFrame, old: str, new: str) -> DataFrame:
    """Whole-table sentinel replace ``df[df == ">0"] <- "unknown"``
    (``GEM/Coalplants_GEM.R:50``). Full-cell equality on every string
    column — exactly ``DataFrame.replace`` restricted to strings."""
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    if not str_cols:
        return df
    return df.replace(old, new, subset=str_cols)


def impute_year(
    df: DataFrame,
    year_col: str,
    status_col: str,
    future_statuses: Sequence[str],
    operating_statuses: Sequence[str] = ("operating",),
    missing_sentinels: Sequence[str] = ("not found", "unknown"),
    future_year: int = 2030,
    operating_year: int = 2024,
) -> DataFrame:
    """Start-year imputation (``GEM/Hydroplants_GEM.R:102-107``; also
    nuclear:41-46, solar:53-58, wind:46-51, bio:42-47, geo:40-45).
    Coal/gasoil instead *drop* such rows (``filter_not_and``)."""
    y = F.col(year_col)
    missing = y.isNull() | y.isin(list(missing_sentinels))
    return df.withColumn(
        year_col,
        F.when(F.col(status_col).isin(list(future_statuses)) & missing, F.lit(str(future_year)))
        .when(F.col(status_col).isin(list(operating_statuses)) & missing, F.lit(str(operating_year)))
        .otherwise(y),
    )
