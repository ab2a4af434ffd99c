"""Local stand-in for the driver's Spark-vs-DuckDB correctness compare:
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canon(rows, colnames) -> list[str]:
    order = sorted(range(len(colnames)), key=lambda k: colnames[k])
    return sorted(
        "|".join(_norm(r[k]) for k in order) for r in rows
    )


def compare(spark_df, con, sql: str, name: str = "q") -> int:
    srows = spark_df.collect()
    scols = spark_df.columns
    rel = con.sql(sql)
    drows = rel.fetchall()
    dcols = rel.columns
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    sc = canon([tuple(r) for r in srows], scols)
    dc = canon(drows, dcols)
    if sc != dc:
        diff_s = [x for x in sc if x not in set(dc)][:5]
        diff_d = [x for x in dc if x not in set(sc)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
    return len(srows)
