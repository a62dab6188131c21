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


def kafka_batch_writer(bootstrap: str, topic: str):
    """foreachBatch writer serializing transcript rows to Kafka:
    key = conv_id (preserves the reference's per-key partitioning,
    frame.proto:36), value = JSON of the row."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        payload = batch_df.select(
            F.col("conv_id").cast("string").alias("key"),
            F.to_json(F.struct(*batch_df.columns)).alias("value"),
        )
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
