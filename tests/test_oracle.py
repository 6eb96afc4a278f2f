"""t2-style correctness: every registered query with an oracle must
hash-match DuckDB on the same parquet (driver runs sf0.01; so do we)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_conn
from wing_binlog_go_spark.registry import all_queries

_QUERIES = all_queries()
_ORACLE_KEYS = [k for k, v in _QUERIES.items() if v.oracle is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, duck, name):
    spec = _QUERIES[name]
    df = spec.spark(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_non_oracle_queries_run(spark, sf_dir):
    for name, spec in _QUERIES.items():
        if spec.oracle is None:
            n = spec.spark(spark, sf_dir).count()
            assert n >= 0, name
