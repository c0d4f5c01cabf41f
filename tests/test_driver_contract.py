"""Mimics the driver's correctness gate: run every ``queries()`` entry in
Spark and its ``oracle_sql()`` twin in DuckDB on the same parquet tables,
compare row count + column names + exact sorted values."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
    TPCH_TABLES,
)

import os

SF_DIR = os.environ.get("ENGINE_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    duck_df = con.execute(ORACLES[name]).df()
    con.close()

    assert len(spark_df) == len(duck_df), f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    a, b = _normalize(spark_df), _normalize(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert set(df.columns) == {"doc_id", "status", "n_spans", "extracted_text"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
