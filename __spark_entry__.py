"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship KG-construction query at
sf0.001; ``queries()``/``oracle_sql()`` expose the operator suite in
``knowledgegraphgenerator_spark.queries`` (SURVEY.md §2 coverage map in
that module's docstring). Column names are aliased identically on both
sides; values are integers/strings (or deterministically rounded once)
so the order-insensitive value-hash matches across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledgegraphgenerator_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (normalize → dictionary → link →
    optimise → triples) over /root/testdata/sf0.001 documents."""
    return QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
