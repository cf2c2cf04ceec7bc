"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k query end-to-end (tokenizer
pandas UDF -> packed varbyte posting blocks -> broadcast-join scoring ->
TakeOrderedAndProject) on /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline suite; pairs are column-name
and type aligned for the driver's DuckDB value-hash compare. As of round 2
EVERY registry entry carries an oracle — including the math engine (the
mx_* queries run the real TeX parser / subpath join / MNC scorer over a
deterministic template corpus whose expected output is closed-form in SQL),
snippet window bounds, the media stubs, and the streaming batch twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.entry_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["ft_bm25_or2"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
