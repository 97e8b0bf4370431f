"""Streaming item monitor — the kafka_mon analogue (SURVEY.md S18/T6).

The reference runs a Kafka consumer over the spider's item topic and fires an
alert when `regexp` extraction of the price field crosses a threshold
(`/root/reference/kafka_mon.py:17-29`: ``re.findall('单价(\\d+)元', price)``
cast to int ``< 8000``).  Spark-side this is a Structured Streaming filter:
``readStream`` (kafka in production, any source in tests) → ``from_json`` the
item payload → ``regexp_extract + cast + predicate`` → alert sink.

The transformation is source-agnostic: it takes a streaming OR batch
DataFrame of (key, value) rows as produced by sinks.kafka_frame, so the
identical Column logic is unit-testable without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRICE_RE = r"单价(\d+)元"  # kafka_mon.py:27


def price_alerts(
    frame: DataFrame,
    threshold: int = 8000,
    price_field: str = "price",
) -> DataFrame:
    """(key, value-json) frame → rows whose extracted price < threshold.

    Returns (tablename, price_value, value) — works on streams and batches.
    """
    price = F.get_json_object("value", f"$.{price_field}")
    # try_cast: a non-matching extract yields '' which must become NULL,
    # not an ANSI cast error (kafka_mon tolerates unparseable prices)
    val = F.regexp_extract(price, PRICE_RE, 1).try_cast("int")
    return (
        frame.withColumn("price_value", val)
        .where(F.col("price_value").isNotNull() & (F.col("price_value") < threshold))
        .select(F.col("key").alias("tablename"), "price_value", "value")
    )


def monitor_kafka(spark, brokers: str, topic: str, threshold: int = 8000):
    """Production wiring: kafka source → alert stream (needs a broker)."""
    src = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
        .selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")
    )
    return price_alerts(src, threshold)
