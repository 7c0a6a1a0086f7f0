"""Deterministic sampling / splitting for training-data pipelines.

``hash_split`` assigns each row to a named split from the md5 of its
key — stable across runs, engines, partitionings, and cluster sizes
(no RNG, no state), which is the property a reproducible train/val/
test split actually needs. Bucket granularity is one hex nibble
(16ths); compose two nibbles for 1/256ths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, nibbles: int = 1) -> Column:
    """Deterministic bucket 0..16^nibbles-1 from the md5 of the key
    (cast to string). Portable: identical in any engine with md5."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, nibbles), 16, 10).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign rows to named splits by 16ths: ``splits`` maps name →
    number of nibble-buckets (must sum to 16). Default 12/2/2 =
    train 75% / val 12.5% / test 12.5% (in expectation)."""
    splits = splits or {"train": 12, "val": 2, "test": 2}
    if sum(splits.values()) != 16:
        raise ValueError("split buckets must sum to 16")
    bucket = hash_bucket(F.col(key_col))
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = (bucket >= lo) & (bucket < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn(out_col, expr)
