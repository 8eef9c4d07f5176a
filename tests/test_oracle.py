"""Every registry query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's correctness gate (BASELINE.md t2)."""

from __future__ import annotations

import duckdb
import pytest

from kaylee_spark.queries import load_all
from kaylee_spark.sources import TABLES, table_path
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_SMOKE, t)}'")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only contract: runs and yields a stable schema
        assert sdf.shape[1] > 0
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
