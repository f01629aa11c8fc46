"""SQL-surface battery: every entry's spark.sql result matches DuckDB
running the same text (shared-ANSI oracle)."""

import pytest

from query_optimizer_spark.harness import result_hash
from query_optimizer_spark.sqlsurface import SURFACE, run_surface

from .conftest import SF_DIR
from .test_spark_exec import duck_hash


@pytest.mark.parametrize("name", sorted(SURFACE))
def test_surface_matches_duckdb(name, spark, duck):
    from query_optimizer_spark.sqlsurface import oracle_sql_of

    df = run_surface(spark, SF_DIR, name)
    got = result_hash(df)
    expected = duck_hash(duck, oracle_sql_of(name))
    assert got[0] > 0, f"{name} returned no rows -- weak test"
    assert got == expected, f"{name}: spark={got} duck={expected}"
