from gem_data_wrangle_spark.plans.gem import FuelConfig, run_fuel_pipeline

__all__ = ["FuelConfig", "run_fuel_pipeline"]
