"""Sink surface (SURVEY.md §2.1 S6-S14, S17) — the reference's pluggable item
pipelines re-expressed as DataFrame writers.

Common discipline shared by every reference pipeline
(`/root/reference/SP/pipelines/pipelines_rdbm.py:43-56,79-88` ×6 sinks):
project item fields in ``idx`` order filling declared defaults (P1), cleanse
values (P2), prepend the ``keyid`` rowkey and append audit columns
``bizdate, ctime, spider`` (D4), bucket rows, then batch-write with a
row-level fallback that drops poison rows.  Here the projection/cleansing/
audit steps are Column expressions, bucketing is Spark's native task batching,
and the retry-fallback becomes an explicit *validation filter* — poison rows
are split out declaratively before the write instead of discovered by failed
inserts (`SURVEY.md §4`).

Sinks needing live services (JDBC S6, Kafka S11) expose the exact frame
shape + a thin write call, gated so the sandbox (no broker/db) tests the
frame, not the socket.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import clean, rowkey

DEFAULT_VARCHAR = 255  # every field defaults to VARCHAR(255) (`pipelines_rdbm.py:53`)


def project_items(
    df: DataFrame,
    fields: list[str],
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """P1: ordered projection with declared defaults for missing fields."""
    defaults = defaults or {}
    cols = []
    for f_ in fields:
        if f_ in df.columns:
            cols.append(F.coalesce(F.col(f_), F.lit(defaults.get(f_, ""))).alias(f_))
        else:
            cols.append(F.lit(defaults.get(f_, "")).alias(f_))
    return df.select(*cols)


def cleanse(df: DataFrame) -> DataFrame:
    """P2: strip control chars + trim every string column
    (`pipelines_clean.py:14-29`)."""
    return df.select(
        *[
            clean(F.col(c)).alias(c) if t == "string" else F.col(c)
            for c, t in df.dtypes
        ]
    )


def with_audit(df: DataFrame, bizdate: str, ctime: str, spider: str) -> DataFrame:
    """D4/P1: keyid rowkey first, audit columns last
    (`pipelines_rdbm.py:79-88`)."""
    keyed = df.withColumn("keyid", rowkey(bizdate, *[F.col(c) for c in df.columns]))
    return keyed.select(
        "keyid",
        *df.columns,
        F.lit(bizdate).alias("bizdate"),
        F.lit(ctime).alias("ctime"),
        F.lit(spider).alias("spider"),
    )


def split_poison(df: DataFrame, max_len: int = DEFAULT_VARCHAR):
    """The reference's insert-retry row fallback drops rows a batch insert
    chokes on (`pipelines_rdbm.py:96-103`) — with VARCHAR(255) columns the
    dominant poison is oversize values.  Declarative equivalent: (ok, poison)
    split by value length."""
    checks = [
        F.length(F.coalesce(F.col(c), F.lit(""))) <= max_len
        for c, t in df.dtypes
        if t == "string"
    ]
    pred = F.lit(True)
    for c in checks:
        pred = pred & c
    return df.where(pred), df.where(~pred)


# ------------------------------------------------------------------ sinks

def write_csv(df: DataFrame, path: str, mode: str = "append") -> None:
    """S12 datafile sink (`pipelines_datafile.py:36-113`): header + append;
    newline/delimiter safety comes from cleanse() + csv quoting."""
    df.write.mode(mode).option("header", True).csv(path)


def write_hive_text(df: DataFrame, path: str, mode: str = "append") -> None:
    """S7 HDFS/Hive sink (`pipelines_hdfs.py:41-127`): '\\x01'-delimited text
    rows, all columns string, plus a DDL sidecar mirroring checktable's
    ``CREATE TABLE … string`` (`pipelines_hdfs.py:69-77`)."""
    os.makedirs(path, exist_ok=True)
    ddl = {c: "string" for c in df.columns}
    with open(os.path.join(path, "_schema.json"), "w") as fh:
        json.dump(ddl, fh)
    df.select(
        F.concat_ws("\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]).alias("value")
    ).write.mode(mode).text(os.path.join(path, "data"))


def kafka_frame(df: DataFrame, tablename: str, ctime: str) -> DataFrame:
    """S11 kafka sink frame (`pipelines_kafka.py:26-44`): key = tablename,
    value = item JSON + ctime.  Feed to ``.write.format('kafka')`` when a
    broker exists; the frame itself is broker-independent."""
    return df.withColumn("ctime", F.lit(ctime)).select(
        F.lit(tablename).alias("key"),
        F.to_json(F.struct("*")).alias("value"),
    )


def write_kafka(frame: DataFrame, brokers: str, topic: str) -> None:
    """S11 transport (requires a live broker + kafka package)."""
    (
        frame.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **props) -> None:
    """S6 RDBMS sink seam (`pipelines_rdbm.py:34-105`): bucketed appends are
    native; run split_poison() first for the row-fallback semantics."""
    df.write.mode(mode).jdbc(url, table, properties={str(k): str(v) for k, v in props.items()})


# ------------------------------------------------------------------ meta

def refresh_meta(spark, spider: str, item_tables: dict[str, str], author: str = "way"):
    """S17 metadata catalog (`easy_meta.py:37-105`): one row per column of
    every item table — (spider, tb, col, comments, px, author, times)."""
    rows = []
    for tb, ddl in item_tables.items():
        for px, field in enumerate(ddl.split(","), start=1):
            name = field.strip().split(" ", 1)[0]
            rows.append((spider, tb, name, name, px, author, time.strftime("%Y-%m-%d")))
    return spark.createDataFrame(
        rows, "spider string, tb string, col string, comments string, px int, author string, times string"
    )
