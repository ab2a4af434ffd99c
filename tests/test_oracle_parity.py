"""Every oracle-checked entry in __spark_entry__ must match DuckDB at
sf0.001 — the same compare the driver runs at sf0.01 (row count + columns +
order-insensitive value hash)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import compare

QUERIES = sorted(entrymod.oracle_sql().keys())

# Queries allowed to return 0 rows at sf0.001 — everything else failing
# the nonzero guard is a vacuous green (the r3 verdict's finding: four
# driver rows "passed" on empty results and proved nothing). Keep this
# list EMPTY unless a query has a documented reason to be empty at the
# smoke scale.
ZERO_ROWS_OK: set[str] = set()


@pytest.mark.parametrize("name", QUERIES)
def test_query_parity(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    n = compare(q(spark, SF_SMOKE), duck, sql, name)
    assert n > 0 or name in ZERO_ROWS_OK, (
        f"{name}: 0 rows at {SF_SMOKE} — vacuous parity; fix the query "
        f"window/predicates or whitelist with a documented reason"
    )


def test_all_queries_have_callables():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} has no queries() entry"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "rel_id", "pred", "subj_id", "obj_id", "score"
    }
