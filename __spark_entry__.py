"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`oc_meta_spark`; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the hierarchy-revenue rollup (chained equi-joins + exact decimal
    aggregation) — the generic shape of the reference's venue-hierarchy
    traversal + entity counting (SURVEY J6/A1).
    """
    from oc_meta_spark.plans.registry import load_all

    q = load_all()["J6_hierarchy_revenue"]
    return q.builder(spark, "/root/testdata/sf0.001")


def _with_worker_imports(builder: Callable) -> Callable:
    """The driver owns the SparkSession and may run from any cwd; pandas
    UDFs are pickled by module reference, so ship the package to executor
    workers (addPyFile, once per context) before building each plan."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from oc_meta_spark.session import ensure_worker_imports

        ensure_worker_imports(spark)
        return builder(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from oc_meta_spark.plans.registry import load_all

    return {name: _with_worker_imports(q.builder) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    from oc_meta_spark.plans.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
