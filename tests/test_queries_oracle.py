"""The main correctness gate: every oracled query must match DuckDB at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json."""

import pytest

from azure_iot_realtime_data_pipeline_spark.plans.oracles import ORACLES
from azure_iot_realtime_data_pipeline_spark.plans.queries import QUERIES

from .parity import compare_spark_duckdb

ORACLED = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    ok, msg = compare_spark_duckdb(df, ORACLES[name], sf_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing
