"""Physical-plan regression guards: the scale-relevant properties
documented in PLANS.md must survive refactors."""

import re

import __spark_entry__ as entrymod


def _plan(spark, name, sf_dir, mode="simple"):
    df = entrymod.queries()[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_isin_pushdown(spark, sf_dir):
    plan = _plan(spark, "filter_isin", sf_dir)
    assert re.search(r"DataFilters: \[l_returnflag#\d+ IN \(A,R\)", plan)


def test_pipeline_prunes_columns_and_pushes_year_filter(spark, sf_dir):
    plan = _plan(spark, "gem_coal_pipeline", sf_dir)
    # only the two referenced orders columns reach the scan
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans and all(
        set(re.sub(r"#\d+L?", "", s).split(",")) <= {"o_orderkey", "o_custkey"}
        for s in scans
    )
    # year filter sits below the aggregation, above the year explode
    filt = plan.index("Filter production_year")
    agg = plan.index("HashAggregate")
    assert filt > agg  # plans print top-down: filter appears under the agg


def test_fallback_chain_broadcasts_both_dims(spark, sf_dir):
    plan = _plan(spark, "join_fallback_chain", sf_dir)
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_expand_years_is_narrow(spark, sf_dir):
    plan = _plan(spark, "expand_years", sf_dir)
    assert "Generate explode" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle at all
    assert "Join" not in plan                        # no cross join


def test_harmonize_has_no_expand(spark, sf_dir):
    # the min/max-struct rewrite must not regress to count_distinct's
    # Expand + double aggregate
    plan = _plan(spark, "harmonize_coordinates", sf_dir)
    assert "Expand" not in plan
