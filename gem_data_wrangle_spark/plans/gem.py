"""The per-fuel GEM pipelines as one parameterized lazy plan.

The reference repeats the same ~230-line script eight times with
per-fuel variations (SURVEY §2, §3); here each fuel is a ``FuelConfig``
and the pipeline is a single composition of the engine's operators —
one Catalyst job end-to-end, no intermediate materialization (the
reference materializes ~11 intermediate data.frames per script,
``GEM/Coalplants_GEM.R:17-229``).

Canonical trace re-expressed (coal):
read → select (:17-38) → status filter (:41) → unknown-start drop
(:46-47) → ">0" sentinel replace (:50) → capacity filter (:54) → cast
(:59-60) → coordinate harmonization (:63-76) → ownership explode +
allocation (:104-119) → key/retirement filters (:122-128) → year
expansion + per-year case (:134-152) → group-sum (:165-171) → ISO2 +
literals (:177-210) → rename/reorder (:186-223).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gem_data_wrangle_spark.functions import cleaning as C
from gem_data_wrangle_spark.functions import strings as S
from gem_data_wrangle_spark.operators import aggregates as A
from gem_data_wrangle_spark.operators import kernels as K
from gem_data_wrangle_spark.operators.joins import join_lookup_dim

# The 19-column output contract, identical in every reference script
# (``GEM/Coalplants_GEM.R:214-219``, ``GEM/TotalData_GEM.R:38-41``).
CANONICAL_COLUMNS = [
    "asset_id", "asset_name", "company_id", "company_name", "country_iso2",
    "country_name", "region", "coordinates", "workforce_size",
    "workforce_source", "sector", "technology", "capacity", "capacity_unit",
    "production_year", "plant_age_years", "plant_age_rank",
    "capacity_factor", "emission_factor",
]


@dataclass
class FuelConfig:
    """Per-fuel variation points (SURVEY §1.4, §2.10)."""

    technology: str | None               # e.g. "CoalCap"; None → the input
                                         # carries a per-row `technology`
                                         # column (gas/oil classification,
                                         # GEM/GasOilplants_GEM.R:225-229) —
                                         # add it to extra_group_cols
    unit_id_col: str                     # "GEM unit/phase ID" | "GEM unit ID" | "GEM phase ID"
    owner_col: str = "Owner"             # "Owner(s)" for gas/oil + bioenergy
    retirement_col: str | None = "Retired year"  # None → hydro (always-NA)
    status_allowed: tuple[str, ...] = (
        "operating", "construction", "announced", "pre-construction",
        "pre-permit", "permitted",
    )
    equal_share: bool = True             # False → coal/gasoil drop-capacity variant
    impute_missing_years: bool = True    # False → coal/gasoil drop such rows instead
    future_statuses: tuple[str, ...] = (
        "announced", "construction", "pre-construction", "pre-permit",
        "permitted",
    )
    location_col: str = "GEM location ID"
    country_col: str = "Country/Area"
    capacity_col: str = "Capacity (MW)"
    start_year_col: str = "Start year"
    plant_age_col: str | None = None
    extra_group_cols: tuple[str, ...] = field(default_factory=tuple)


COAL = FuelConfig(
    technology="CoalCap", unit_id_col="GEM unit/phase ID",
    retirement_col="Planned retirement", equal_share=False,
    impute_missing_years=False, plant_age_col="Plant age (years)",
)
GASOIL = FuelConfig(
    technology="GasCap", unit_id_col="GEM unit ID", owner_col="Owner(s)",
    retirement_col="Planned retire", equal_share=False,
    impute_missing_years=False,
)
HYDRO = FuelConfig(
    technology="RenewablesCap", unit_id_col="GEM unit ID",
    retirement_col=None, country_col="Country 1",
    start_year_col="Start Year",
)
NUCLEAR = FuelConfig(
    technology="NuclearCap", unit_id_col="GEM unit ID",
    retirement_col="Retirement Year",
)
SOLAR = FuelConfig(technology="RenewablesCap", unit_id_col="GEM phase ID", country_col="Country")
WIND = FuelConfig(technology="RenewablesCap", unit_id_col="GEM phase ID")
BIOENERGY = FuelConfig(technology="RenewablesCap", unit_id_col="GEM phase ID", owner_col="Owner(s)")
GEOTHERMAL = FuelConfig(technology="RenewablesCap", unit_id_col="GEM unit ID")


def run_fuel_pipeline(df: DataFrame, cfg: FuelConfig, country_dim: DataFrame) -> DataFrame:
    """units table → owner-level capacity time series (19-col contract).

    Lazy end-to-end: Catalyst prunes the scan to the referenced columns
    and pushes the status/sentinel filters below the ownership explode
    and the 28× year expansion — the two cardinality multipliers — so
    the expansion happens on the minimal surviving set, exactly the
    manual optimization order the reference hand-codes (SURVEY §4).
    """
    # --- clean (GEM/Coalplants_GEM.R:41-60) ---
    out = C.filter_isin(df, "Status", cfg.status_allowed)
    out = C.replace_value_global(out, ">0", "unknown")
    if cfg.impute_missing_years:
        out = C.impute_year(
            out, cfg.start_year_col, "Status", future_statuses=cfg.future_statuses
        )
    else:
        start = F.col(cfg.start_year_col)
        out = C.filter_not_and(
            out,
            F.col("Status").isin(list(cfg.future_statuses)),
            start.isNull() | start.isin(["unknown", "not found"]),
        )
    out = C.filter_capacity_known(out, cfg.capacity_col)
    out = C.cast_numeric(out, [cfg.capacity_col, "Latitude", "Longitude"])

    # --- coordinate harmonization (:63-76) ---
    out = K.harmonize_coordinates(out, cfg.location_col)

    # --- ownership split (:104-119 / Hydroplants:159-193) ---
    out = K.split_ownership(
        out, cfg.owner_col, cfg.capacity_col, equal_share=cfg.equal_share
    )
    out = C.filter_notnull(out, [cfg.unit_id_col])
    if cfg.retirement_col is not None:
        out = C.filter_null_or_ge(out, cfg.retirement_col, 2024)

    # --- year expansion + per-year capacity (:134-152) ---
    out = K.expand_years(
        out,
        start_year_col=cfg.start_year_col,
        retirement_col=cfg.retirement_col,
    )

    # --- group-sum to (location, owner, year) (:165-171) ---
    group_cols = [
        cfg.location_col, cfg.unit_id_col, cfg.country_col, "Region",
        "company_name", "production_year", "Latitude", "Longitude",
        *cfg.extra_group_cols,
    ]
    if cfg.plant_age_col:
        group_cols.append(cfg.plant_age_col)
    out = A.agg_sum_groups(out, group_cols, {"capacity": "capacity"})

    # --- enrich + canonical contract (:177-223) ---
    out = join_lookup_dim(
        out.withColumnRenamed(cfg.country_col, "country_name"),
        country_dim.select("country_name", "iso2"),
        key="country_name",
        overrides={"iso2": F.when(F.col("country_name") == "Kosovo", "XK").otherwise(F.col("iso2"))},
    )
    out = (
        out.withColumn("coordinates", S.concat_coords(F.col("Latitude"), F.col("Longitude")))
        .withColumnsRenamed(
            {
                cfg.unit_id_col: "asset_id",
                cfg.location_col: "asset_name",
                "Region": "region",
                "iso2": "country_iso2",
            }
        )
        .withColumns(
            {
                "company_id": F.lit(None).cast("string"),
                "workforce_size": F.lit(None).cast("double"),
                "workforce_source": F.lit(None).cast("string"),
                "sector": F.lit("Power"),
                **({"technology": F.lit(cfg.technology)} if cfg.technology is not None else {}),
                "capacity_unit": F.lit("MW"),
                "plant_age_years": (
                    F.col(cfg.plant_age_col).try_cast("double")
                    if cfg.plant_age_col
                    else F.lit(None).cast("double")
                ),
                "plant_age_rank": F.lit(None).cast("double"),
                "capacity_factor": F.lit(None).cast("double"),
                "emission_factor": F.lit(None).cast("double"),
            }
        )
    )
    return out.select(*CANONICAL_COLUMNS)


def consolidate_total(
    fuel_outputs: list[DataFrame],
    emission_factors: DataFrame | None = None,
    country_dim: DataFrame | None = None,
) -> DataFrame:
    """``TotalData_GEM.R`` consolidation: union the fuel outputs, mint
    deterministic surrogate company IDs (:21-34), and (optionally)
    attach emission factors with the 2-level country→global fallback
    (:101-135) — handled by ``operators.joins.join_fallback_chain``.

    ``emission_factors`` is the Climate-Trace-shaped table
    (source_type, iso3_country, emissions_factor) with "Global" rows
    for the fallback level; ``country_dim`` supplies the iso2→iso3
    bridge (``GEM/TotalData_GEM.R:101-103``).
    """
    total = A.union_rows(fuel_outputs, allow_missing=True)
    total = total.drop("company_id")
    total = K.surrogate_ids(total, "company_name", id_col="company_id")
    if emission_factors is not None:
        from gem_data_wrangle_spark.operators.joins import join_fallback_chain

        if country_dim is None:
            raise ValueError("country_dim required to bridge iso2→iso3")
        iso_bridge = country_dim.select(
            F.col("iso2").alias("country_iso2"), F.col("iso3").alias("country_iso3")
        ).distinct()
        total = total.join(F.broadcast(iso_bridge), on="country_iso2", how="left")
        # technology → Climate Trace source_type (GEM/TotalData_GEM.R:106-113)
        total = total.withColumn(
            "source_type",
            F.when(F.col("technology") == "CoalCap", "coal")
            .when(F.col("technology") == "GasCap", "gas")
            .when(F.col("technology") == "OilCap", "oil"),
        )
        specific = emission_factors.filter(F.col("iso3_country") != "Global").select(
            F.col("iso3_country").alias("country_iso3"),
            F.col("source_type"),
            F.col("emissions_factor"),
        )
        general = emission_factors.filter(F.col("iso3_country") == "Global").select(
            F.col("source_type"), F.col("emissions_factor")
        )
        total = join_fallback_chain(
            total.drop("emission_factor"),
            specific,
            general,
            specific_on=["country_iso3", "source_type"],
            general_on=["source_type"],
            value_col="emissions_factor",
            out_col="emission_factor",
            default=0.0,
        )
        # non-fossil technologies carry factor 0 (GEM/TotalData_GEM.R:134)
        total = total.withColumn(
            "emission_factor",
            F.when(F.col("source_type").isNotNull(), F.col("emission_factor")).otherwise(F.lit(0.0)),
        )
    return total.select(*CANONICAL_COLUMNS)
