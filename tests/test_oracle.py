"""Every registry query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's correctness gate (BASELINE.md t2)."""

from __future__ import annotations

import duckdb
import pytest

from kaylee_spark.queries import DRIVER_CAP, load_all, load_everything
from kaylee_spark.sources import TABLES, table_path
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare

# main + extra: demotion out of the driver window must not lose local
# oracle verification
REGISTRY = load_everything()


def test_driver_registry_fits_window():
    """The driver records verdicts for only the first DRIVER_CAP main
    entries (round-1 finding) — the main registry must never overflow."""
    assert len(load_all()) <= DRIVER_CAP


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
