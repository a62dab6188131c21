"""Kafka producer sink (reference: sink/kafka/driver_sarama.go:21-48 —
async fire-and-forget producer, notably NOT ack-aware). The Spark
equivalent is ``writeStream.format("kafka")``, which IS commit-gated:
the batch's offsets commit only after the producer flush succeeds, so
this sink is strictly stronger than the reference's.

The spark-sql-kafka connector jar is not present in this environment;
the builder is import-gated and raises a clear error when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_payload(batch_df: DataFrame, key_col: str = "conv_id") -> DataFrame:
    """Serialize rows to the Kafka writer's (key, value) contract:
    key = the partitioning key column (preserves the reference's
    per-key partitioning, frame.proto:36), value = JSON of the full
    row. Factored out so the serialization is contract-testable on a
    plain batch DataFrame without the connector jar."""
    return batch_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*batch_df.columns)).alias("value"),
    )


def kafka_batch_writer(bootstrap: str, topic: str):
    """foreachBatch writer serializing transcript rows to Kafka via
    kafka_payload."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        payload = kafka_payload(batch_df)
        try:
            (
                payload.write.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap)
                .option("topic", topic)
                .save()
            )
        except Exception as exc:  # pragma: no cover - jar not in image
            raise NotImplementedError(
                "spark-sql-kafka connector jar is not on the classpath in "
                "this environment; add org.apache.spark:spark-sql-kafka-0-10 "
                "to spark.jars.packages to enable the Kafka sink"
            ) from exc

    return write
