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


# ---------------------------------------------------- connector frame seams
#
# S8/S9/S10/S13: the reference's HBase/MongoDB/Elasticsearch/Doris pipelines
# all share the same discipline — per-item dict shaping + audit columns +
# batch write with row fallback.  The *frame shaping* is engine logic and
# lives here, fully tested; the transport (happybase/pymongo/es helpers/
# streamload HTTP) needs a live service and stays a thin call the caller
# wires on a real cluster (same gating as write_kafka/write_jdbc).

def hbase_frame(df: DataFrame, bizdate: str, ctime: str, spider: str) -> DataFrame:
    """S8 (`pipelines_hbase.py:85-118`): (keyid, cells map<'cf:<col>',str>);
    values stringified exactly as there (``str(value)`` → missing = 'None'),
    audit cells cf:bizdate/cf:ctime/cf:spider appended.  Feed rows to
    happybase ``batch.put(keyid, cells)`` on a live cluster."""
    keyed = df.withColumn("keyid", rowkey(bizdate, *[F.col(c) for c in df.columns]))
    cells = []
    for c in df.columns:
        cells += [F.lit(f"cf:{c}"), F.coalesce(F.col(c).cast("string"), F.lit("None"))]
    cells += [
        F.lit("cf:bizdate"), F.lit(bizdate),
        F.lit("cf:ctime"), F.lit(ctime),
        F.lit("cf:spider"), F.lit(spider),
    ]
    return keyed.select("keyid", F.create_map(*cells).alias("cells"))


def mongo_frame(df: DataFrame, bizdate: str, ctime: str, spider: str) -> DataFrame:
    """S9 (`pipelines_mongodb.py:65-96`): document per row with ``_id`` =
    keyid + audit fields; feed to ``collection.insert_many``."""
    keyed = df.withColumn("_id", rowkey(bizdate, *[F.col(c) for c in df.columns]))
    return keyed.select(
        "_id", *df.columns,
        F.lit(bizdate).alias("bizdate"),
        F.lit(ctime).alias("ctime"),
        F.lit(spider).alias("spider"),
    )


def es_frame(df: DataFrame, tablename: str, bizdate: str, ctime: str, spider: str) -> DataFrame:
    """S10 (`pipelines_elasticsearch.py:60-84`): bulk-index action per row —
    (_op_type='index', _index=tablename, _id=keyid, _source JSON with audit
    fields); feed to ``elasticsearch.helpers.bulk``."""
    keyed = df.withColumn("_id", rowkey(bizdate, *[F.col(c) for c in df.columns]))
    source = F.to_json(
        F.struct(
            *df.columns,
            F.lit(bizdate).alias("bizdate"),
            F.lit(ctime).alias("ctime"),
            F.lit(spider).alias("spider"),
        )
    )
    return keyed.select(
        F.lit("index").alias("_op_type"),
        F.lit(tablename).alias("_index"),
        "_id",
        source.alias("_source"),
    )


def doris_frame(df: DataFrame, bizdate: str, ctime: str, spider: str) -> DataFrame:
    """S13 (`pipelines_doris.py:80-105`): stream-load row — keyid first, every
    value stringified (``str(value)`` → missing = 'None'), audit columns last;
    serialize with ``to_json(struct('*'))`` per row for the HTTP stream load."""
    keyed = df.withColumn("keyid", rowkey(bizdate, *[F.col(c) for c in df.columns]))
    vals = [
        F.coalesce(F.col(c).cast("string"), F.lit("None")).alias(c)
        for c in df.columns
    ]
    return keyed.select(
        "keyid", *vals,
        F.lit(bizdate).alias("bizdate"),
        F.lit(ctime).alias("ctime"),
        F.lit(spider).alias("spider"),
    )


# ------------------------------------------------------------------ meta

def refresh_meta(spark, spec, insertime: str | None = None):
    """S17 metadata catalog with full `easy_meta.py:37-105` parity: one row
    per column of every item table, schema (spider, spider_comment, tb,
    tb_comment, col_px, col, col_comment, author, addtime, insertime).

    Column order per table mirrors the reference's idx sort with the audit
    frame around it: keyid (idx -99) first, declared columns in DDL order,
    then bizdate (1001) / ctime (1002) / spider (1003); comments come from
    ``spec.comments`` (the Field dicts there), audit comments are the
    reference's fixed strings."""
    insertime = insertime or time.strftime("%Y-%m-%d %H:%M:%S")
    rows = []
    for tb, ddl in spec.item_tables.items():
        cols = [("keyid", "唯一标识")]
        tb_comments = spec.comments.get(tb, {})
        for field in ddl.split(","):
            name = field.strip().split(" ", 1)[0]
            cols.append((name, tb_comments.get(name, "")))
        cols += [("bizdate", "业务日期"), ("ctime", "入库时间"), ("spider", "爬虫名称")]
        for px, (name, comment) in enumerate(cols, start=1):
            rows.append(
                (
                    spec.name, spec.describe, tb, spec.table_desc.get(tb, ""),
                    px, name, comment, spec.author, spec.addtime, insertime,
                )
            )
    return spark.createDataFrame(
        rows,
        "spider string, spider_comment string, tb string, tb_comment string,"
        " col_px int, col string, col_comment string, author string,"
        " addtime string, insertime string",
    )
