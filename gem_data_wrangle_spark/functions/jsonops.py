"""Semi-structured (JSON) column extraction.

No reference analogue (the reference's inputs are flat xlsx/csv);
a 100 TB pipeline routinely carries a JSON properties/metadata column
per event or document, and extraction must stay JVM-side: both
``get_json_object`` (path probe, no schema needed) and ``from_json``
(full typed parse) are Catalyst expressions inside whole-stage
codegen — never a Python UDF. Prefer ``from_json`` when several fields
are read (one parse, then struct field access is free); use
``json_get`` for one-off probes where declaring a schema isn't worth
it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_get(col: Column | str, path: str, cast: str | None = None) -> Column:
    """Extract one JSON path (``$.field`` syntax) as string, optionally
    ``try_cast`` to a type (ANSI-safe: malformed values → NULL, the
    R-``as.numeric`` parity contract used throughout this engine)."""
    c = F.get_json_object(F.col(col) if isinstance(col, str) else col, path)
    return c.try_cast(cast) if cast else c


def parse_json_struct(df: DataFrame, col: str, schema: str, out: str = "_json") -> DataFrame:
    """Parse a JSON column once into a typed struct column (``schema``
    in DDL form, e.g. ``"k INT, tags ARRAY<STRING>"``). Downstream
    field reads are struct projections — no repeated parsing."""
    return df.withColumn(out, F.from_json(F.col(col), schema))
