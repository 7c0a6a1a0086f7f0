from gem_data_wrangle_spark.operators import (
    aggregates,
    dedup,
    joins,
    kernels,
    ml_lsh,
    multimodal,
    quality,
    sampling,
    similarity,
    skew,
    textops,
)

__all__ = [
    "aggregates",
    "dedup",
    "joins",
    "kernels",
    "ml_lsh",
    "multimodal",
    "quality",
    "sampling",
    "similarity",
    "skew",
    "textops",
]
