"""Driver-local dimension-table construction.

``spark.createDataFrame(rows, schema)`` parallelizes local rows into
``defaultParallelism`` slices — 32 near-empty partitions for a 20-row
ontology dimension on ``local[32]``. Every later ``collect()`` or
broadcast-hash build over such a frame then runs a 32-task job with a
Python-worker pickle round trip per task (measured: ~0.9-2.2 s per
collect, ~0.2 s per broadcast build on the kg plan path — pure constant
overhead). A dimension table is by definition driver-sized, so ONE slice
is the right layout: collects and broadcast builds become single-task
jobs. Scale note: this touches only relations already materialized on
the driver (the broadcast-sized side); corpus relations never go through
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_dim_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """``createDataFrame`` for driver-local dimension rows, single slice.

    Empty ``rows`` falls back to the plain path (``parallelize([], 1)``
    yields an RDD Spark can't infer emptiness from in the same way).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
