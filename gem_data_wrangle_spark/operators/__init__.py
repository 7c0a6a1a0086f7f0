from gem_data_wrangle_spark.operators import (
    aggregates,
    dedup,
    joins,
    kernels,
    multimodal,
    similarity,
    textops,
)

__all__ = [
    "aggregates",
    "dedup",
    "joins",
    "kernels",
    "multimodal",
    "similarity",
    "textops",
]
