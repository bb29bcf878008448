"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``geospark`` package; this file is the
thin contract wrapper.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geospark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on /root/testdata/sf0.001: derived points ->
    cell assignment -> broadcast-then-refine PIP join -> per-zone
    per-cell tile aggregate."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
