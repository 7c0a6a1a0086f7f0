from gem_data_wrangle_spark.functions import cleaning, conditional, strings

__all__ = ["cleaning", "conditional", "strings"]
