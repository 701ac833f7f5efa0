from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from us_dot_flights_lakehouse_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def patch_defining_module(monkeypatch, fn, name: str, value) -> None:
    """Monkeypatch ``name`` in the module where ``fn`` was DEFINED, not in
    an aggregator that merely re-exports it. Required since the round-13
    mechanical split of queries/llm.py and queries/relational.py into
    family modules: a function's globals (read_table, helpers) resolve in
    its family module, so patching the aggregator's attribute is a no-op
    for the function under test. Split-proof: follows fn.__module__."""
    import sys

    monkeypatch.setattr(sys.modules[fn.__module__], name, value)
