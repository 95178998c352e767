"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship north-rule pipeline (transcripts -> edge
table -> PageRank to convergence) at sf0.001. ``queries``/``oracle_sql``
expose the engine's query surface with DuckDB oracle twins (see
kgraph_framework_spark/queries.py and sql_oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kgraph_framework_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: converged PageRank over the transcript-derived
    union graph at sf0.001; returns (vertex, score)."""
    from pyspark.sql import functions as F

    from kgraph_framework_spark.operators.edges import union_graph
    from kgraph_framework_spark.plans.pagerank import pagerank
    from kgraph_framework_spark.session import tune_session
    from kgraph_framework_spark.sources.transcripts import transcripts_from_events

    tune_session(spark)
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, union_graph(t), tol=1e-6, max_iters=50)
    return res.state.select("vertex", F.col("score").cast("double").alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _q.REGISTRY.items() if sql is not None
    }
