"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables and asserts row-count, column-name and exact value equality
(order-insensitive, columns sorted by name — mirroring the driver's compare).
Stricter than the driver: values must match exactly, which our determinism
contract (decimal-exact arithmetic, string projections) is designed to meet.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from oc_meta_spark.sources.tables import TABLES

_SENTINEL_NULL = ("\x00__null__",)


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _canon(v: Any) -> Any:
    if v is None:
        return _SENTINEL_NULL
    if isinstance(v, float) and math.isnan(v):
        return ("\x00__nan__",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("n", float(v)) if abs(v) < 2**52 else ("n", v)
    if isinstance(v, float):
        return ("n", v)
    return (type(v).__name__, str(v))


def _sorted_canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: [(x[0], str(x[1:])) for x in t])
    return out


def compare_query(spark, name: str, builder, oracle: str | None, sf_dir: str) -> None:
    df = builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    assert len(spark_cols) == len(set(spark_cols)), f"{name}: duplicate column names"
    if oracle is None:
        assert len(spark_rows) >= 0
        return
    oracle_cols, oracle_rows = run_oracle(oracle, sf_dir)
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    s = _sorted_canonical(spark_cols, spark_rows)
    o = _sorted_canonical(oracle_cols, oracle_rows)
    for i, (sr, orow) in enumerate(zip(s, o)):
        assert sr == orow, f"{name}: row {i} differs\n  spark : {sr}\n  oracle: {orow}"
