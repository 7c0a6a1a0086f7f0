"""End-to-end GEM fuel pipeline on a synthetic mini-tracker exercising
the full operator chain (FIXTURES.md §A1 shape) plus consolidation."""

from pyspark.sql import functions as F

from gem_data_wrangle_spark.data.country_codes import country_dim
from gem_data_wrangle_spark.plans.gem import (
    CANONICAL_COLUMNS,
    COAL,
    HYDRO,
    consolidate_total,
    run_fuel_pipeline,
)

SCHEMA = (
    "`GEM unit/phase ID` string, `GEM location ID` string, `Country/Area` string, "
    "Owner string, `Capacity (MW)` string, Status string, `Start year` string, "
    "`Planned retirement` string, Latitude string, Longitude string, "
    "Region string, `Plant age (years)` string"
)

ROWS = [
    # operating unit, two owners with pct, shared location
    ("U1", "L1", "France", "A Corp [60%]; B Ltd [40%]", "1000", "operating",
     "2000", None, "48.1", "2.1", "Europe", "24"),
    ("U2", "L1", "France", "A Corp [100%]", "500", "operating",
     "2005", None, "48.3", "2.3", "Europe", "19"),
    # announced with unknown start → dropped by coal variant
    ("U3", "L2", "Germany", "C GmbH [100%]", "800", "announced",
     "unknown", None, "52.0", "13.0", "Europe", None),
    # retired status → dropped by status filter
    ("U4", "L3", "Spain", "D SA [100%]", "300", "retired",
     "1980", "2010", "40.0", "-3.0", "Europe", "44"),
    # owner without pct → capacity dropped (coal strict variant)
    ("U5", "L4", "Kosovo", "E Co; F Co", "400", "operating",
     "2010", None, "42.6", "21.1", "Europe", "14"),
    # retirement before 2024 → dropped
    ("U6", "L5", "France", "G SARL [100%]", "200", "operating",
     "1990", "2020", "47.0", "3.0", "Europe", "34"),
    # capacity sentinel → dropped
    ("U7", "L6", "France", "H SA [100%]", "N/A", "operating",
     "2001", None, "46.0", "4.0", "Europe", "23"),
    # retirement inside horizon zeroes later years
    ("U8", "L7", "India", "I Ltd [100%]", "600", "operating",
     "2010", "2030", "20.0", "77.0", "Asia", "14"),
]


def _units(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_coal_pipeline_end_to_end(spark):
    out = run_fuel_pipeline(_units(spark), COAL, country_dim(spark))
    assert out.columns == CANONICAL_COLUMNS
    rows = out.collect()
    by_key = {(r["asset_id"], r["company_name"], r["production_year"]): r for r in rows}

    # year expansion: every surviving unit-owner × 28 years
    years = sorted({r["production_year"] for r in rows})
    assert years[0] == 2023 and years[-1] == 2050 and len(years) == 28

    # ownership allocation
    assert by_key[("U1", "A Corp", 2025)]["capacity"] == 600.0
    assert by_key[("U1", "B Ltd", 2025)]["capacity"] == 400.0

    # dropped rows: unknown-start announced, retired status, pre-2024
    # retirement, N/A capacity
    gone = {"U3", "U4", "U6", "U7"}
    assert gone.isdisjoint({r["asset_id"] for r in rows})

    # coal strict variant: no-pct owners contribute 0 capacity
    assert by_key[("U5", "E Co", 2025)]["capacity"] == 0.0

    # retirement inside horizon zeroes from the retirement year on
    assert by_key[("U8", "I Ltd", 2029)]["capacity"] == 600.0
    assert by_key[("U8", "I Ltd", 2030)]["capacity"] == 0.0
    assert by_key[("U8", "I Ltd", 2023)]["capacity"] == 600.0

    # enrichment: ISO2 + Kosovo override + constants
    assert by_key[("U1", "A Corp", 2023)]["country_iso2"] == "FR"
    assert by_key[("U5", "E Co", 2023)]["country_iso2"] == "XK"
    r = by_key[("U1", "A Corp", 2023)]
    assert r["sector"] == "Power" and r["technology"] == "CoalCap"
    assert r["capacity_unit"] == "MW" and r["plant_age_years"] == 24.0
    # U1+U2 share L1 with disagreeing coords → harmonized to the mean
    assert r["coordinates"] == "48.2, 2.2"


def test_hydro_equal_share_variant(spark):
    df = _units(spark).withColumnsRenamed(
        {"GEM unit/phase ID": "GEM unit ID", "Country/Area": "Country 1",
         "Start year": "Start Year"}
    )
    out = run_fuel_pipeline(df, HYDRO, country_dim(spark))
    rows = {(r["asset_id"], r["company_name"], r["production_year"]): r for r in out.collect()}
    # equal-share fallback: U5 owners get 200 each (hydro semantics)
    assert rows[("U5", "E Co", 2025)]["capacity"] == 200.0
    assert rows[("U5", "F Co", 2025)]["capacity"] == 200.0
    # hydro imputes unknown start year (2030 for announced) instead of dropping
    assert ("U3", "C GmbH", 2029) in rows and rows[("U3", "C GmbH", 2029)]["capacity"] == 0.0
    assert rows[("U3", "C GmbH", 2030)]["capacity"] == 800.0


def test_consolidation_surrogate_ids_and_emission_factors(spark):
    coal_out = run_fuel_pipeline(_units(spark), COAL, country_dim(spark))
    ef = spark.createDataFrame(
        [("coal", "FRA", 0.9), ("coal", "Global", 1.1)],
        "source_type string, iso3_country string, emissions_factor double",
    )
    total = consolidate_total([coal_out], emission_factors=ef, country_dim=country_dim(spark))
    rows = total.collect()
    assert total.columns == CANONICAL_COLUMNS
    ids = {r["company_name"]: r["company_id"] for r in rows}
    assert all(v and v.startswith("TFL") for v in ids.values())
    assert len(set(ids.values())) == len(ids)  # unique per company
    by = {(r["company_name"], r["country_iso2"]): r["emission_factor"] for r in rows}
    assert by[("A Corp", "FR")] == 0.9        # country-specific factor
    assert by[("I Ltd", "IN")] == 1.1         # global fallback


def test_all_fuel_configs_run(spark):
    """Every per-fuel FuelConfig is runnable: the remaining fuels are
    column-name/flag permutations of the four oracle-checked variants;
    this instantiates each against a renamed copy of the shared
    fixture and checks the canonical contract."""
    from gem_data_wrangle_spark.plans import gem as G

    base = _units(spark)
    cases = {
        "NUCLEAR": (G.NUCLEAR, {"GEM unit/phase ID": "GEM unit ID",
                                "Planned retirement": "Retirement Year"}),
        "SOLAR": (G.SOLAR, {"GEM unit/phase ID": "GEM phase ID",
                            "Country/Area": "Country",
                            "Planned retirement": "Retired year"}),
        "WIND": (G.WIND, {"GEM unit/phase ID": "GEM phase ID",
                          "Planned retirement": "Retired year"}),
        "BIOENERGY": (G.BIOENERGY, {"GEM unit/phase ID": "GEM phase ID",
                                    "Owner": "Owner(s)",
                                    "Planned retirement": "Retired year"}),
        "GEOTHERMAL": (G.GEOTHERMAL, {"GEM unit/phase ID": "GEM unit ID",
                                      "Planned retirement": "Retired year"}),
    }
    for name, (cfg, renames) in cases.items():
        df = base.withColumnsRenamed(renames)
        out = run_fuel_pipeline(df, cfg, country_dim(spark))
        assert out.columns == CANONICAL_COLUMNS, name
        rows = out.limit(5).collect()
        assert rows, name
        assert all(r["technology"] == cfg.technology for r in rows), name
