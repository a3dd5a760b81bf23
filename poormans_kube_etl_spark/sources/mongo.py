"""Optional MongoDB metrics sink — K1 parity (reference src/mongodb.js:15-19,32).

The reference appends one run-metrics document per completed ingest to
Mongo collection ``es_load_dates``. SURVEY.md chose a parquet
``ingest_metrics`` table as the primary sink (Mongo is incidental to
the dataflow); this module provides the Mongo form for drop-in parity
when the `mongo-spark-connector` jar is on the classpath
(``--packages org.mongodb.spark:mongo-spark-connector_2.13``). The jar
is NOT bundled here — the writer fails with an actionable error instead
of a raw ClassNotFoundException.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_COLLECTION = "es_load_dates"  # reference src/mongodb.js:32


def write_metrics_mongo(
    metrics: DataFrame,
    uri: str,
    database: str,
    collection: str = DEFAULT_COLLECTION,
) -> None:
    """Append metrics rows (D5 shape) to a Mongo collection.

    Equivalent of the reference's ``insert(doc)`` per completed ingest;
    use as ``orchestrator.metrics()`` post-hoc export or wire it into a
    custom finalize. Raises RuntimeError when the connector isn't on the
    classpath.
    """
    try:
        (
            metrics.write.format("mongodb")
            .mode("append")
            .option("connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .save()
        )
    except Exception as e:  # connector jar missing → actionable message
        msg = str(e)
        if "ClassNotFound" in msg or "Failed to find" in msg or "DataSource" in msg:
            raise RuntimeError(
                "mongodb Spark connector not on the classpath; launch with "
                "--packages org.mongodb.spark:mongo-spark-connector_2.13:10.x "
                "or keep the default parquet ingest_metrics sink"
            ) from e
        raise
