"""Scalar-function surface (F1-F16) vs the reference's pure-Python utils, and
the sink discipline (P1/P2/D4 + S7/S11/S12/S17 shapes).
"""

import base64
import glob
import os

from pyspark.sql import functions as F

from spiderman_spark.functions import scalars as S
from spiderman_spark.parselib import ITEM_TABLES
from spiderman_spark.sources import sinks


# ---- reference-faithful pure-python oracles (from tool.py semantics)

def ref_file_type(u):
    types = set(S.FILE_TYPES)
    ft = u.split(".")[-1]
    if "&" in ft:
        ft = ft.split("&")[0]
    if "?" in ft:
        ft = ft.split("?")[0]
    if ft.strip().lower() in types:
        return ft.strip().lower()
    import re

    m = re.findall("data:image/(.*);", u)
    ft = m[0] if m else ""
    return ft.strip().lower() if ft.strip().lower() in types else ""


def ref_url_ok(u, extra=None):
    return not any(kw in u for kw in S.DIRTY_WORDS + list(extra or []))


URLS = [
    "http://a.test/x.PDF",  # case: reference lowercases before whitelist check
    "http://a.test/f.jpg?x=1",
    "http://a.test/f.gif&y=2",
    "http://a.test/f.tar.gz",
    "http://a.test/noext",
    "data:image/png;base64,xxx",
    "http://baidu.com/f.png",
    "javascript:void(0)",
    "mailto:x@qq.com",
    "http://ok.test/deep/path/file.mp4",
]


def test_file_type_and_url_check(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {
        r["url"]: (r["ft"], r["ok"])
        for r in df.select(
            "url",
            S.file_type(F.col("url")).alias("ft"),
            S.url_ok(F.col("url")).alias("ok"),
        ).collect()
    }
    for u in URLS:
        # reference compares the lowered ext but returns the raw segment;
        # ours returns the lowered ext — compare case-insensitively
        assert got[u][0] == ref_file_type(u).lower(), u
        assert got[u][1] == ref_url_ok(u), u


def test_clean_b64_epoch_str2dict_cookies(spark):
    df = spark.createDataFrame(
        [("  a\x01b\xa0c\n\t\r  ", "hello", 1700000000123, "k1: v1\nk2: v2", "a=1; b=2")],
        "dirty string, plain string, ts long, kv string, cookie string",
    )
    r = df.select(
        S.clean(F.col("dirty")).alias("clean"),
        S.b64_encode(F.col("plain")).alias("b64"),
        S.b64_decode(S.b64_encode(F.col("plain"))).alias("rt"),
        S.epoch_to_str(F.col("ts"), "ms", "yyyy-MM-dd").alias("day"),
        S.str2dict(F.col("kv")).alias("m"),
        S.cookies_to_map(F.col("cookie")).alias("ck"),
        S.sanitize_filename(F.lit('a:b*c?d"e<f>g|h.png')).alias("fn"),
        S.price_value(F.lit("单价8500元")).alias("price"),
    ).collect()[0]
    assert r["clean"] == "abc"
    assert r["b64"] == base64.b64encode(b"hello").decode()
    assert r["rt"] == "hello"
    assert r["day"] == "2023-11-14"  # epoch ms → date (UTC session tz)
    assert r["m"] == {"k1": "v1", "k2": "v2"}
    assert r["ck"] == {"a": "1", "b": "2"}
    assert r["fn"] == "abcdefgh.png"
    assert r["price"] == 8500


def test_aes_roundtrip_and_rotation(spark):
    key = "0123456789abcdef"
    df = spark.createDataFrame([("secret-payload", "u1"), ("x", "u2")], "v string, k string")
    out = df.select(
        "v",
        S.aes_decrypt_b64(S.aes_encrypt_b64(F.col("v"), key), key).alias("rt"),
        S.pick_rotating(["UA-a", "UA-b", "UA-c"], F.col("k")).alias("ua"),
    ).collect()
    assert all(r["v"] == r["rt"] for r in out)
    assert all(r["ua"] in ("UA-a", "UA-b", "UA-c") for r in out)
    # deterministic: same key → same pick on rerun
    again = df.select(S.pick_rotating(["UA-a", "UA-b", "UA-c"], F.col("k")).alias("ua")).collect()
    assert [r["ua"] for r in again] == [r["ua"] for r in out]


def test_sink_discipline_and_shapes(spark, workdir):
    raw = spark.createDataFrame(
        [("t1\n", None, "x" * 300), ("t2", "d2", "ok")],
        "title string, desc string, blob string",
    )
    projected = sinks.project_items(raw, ["title", "desc", "missing"], {"missing": "dflt", "desc": "-"})
    assert projected.columns == ["title", "desc", "missing"]
    row = projected.where("title = 't2'").collect()[0]
    assert row["desc"] == "d2" and row["missing"] == "dflt"

    cleaned = sinks.cleanse(projected)
    assert cleaned.where("title = 't1'").count() == 1  # \n stripped

    audited = sinks.with_audit(cleaned, "20240101", "2024-01-01 00:00:00", "zhifang")
    assert audited.columns == ["keyid", "title", "desc", "missing", "bizdate", "ctime", "spider"]
    assert audited.select("keyid").distinct().count() == 2

    ok, poison = sinks.split_poison(sinks.cleanse(raw))
    assert ok.count() == 1 and poison.count() == 1  # 300-char blob dropped

    # S12 csv + S7 hive-text shapes
    csv_path = os.path.join(workdir, "csv")
    sinks.write_csv(audited, csv_path)
    assert spark.read.option("header", True).csv(csv_path).count() == 2
    ht_path = os.path.join(workdir, "ht")
    sinks.write_hive_text(audited, ht_path)
    lines = spark.read.text(os.path.join(ht_path, "data")).collect()
    assert len(lines) == 2 and all(l["value"].count("\x01") == 6 for l in lines)
    assert os.path.exists(os.path.join(ht_path, "_schema.json"))

    # S11 kafka frame shape
    kf = sinks.kafka_frame(cleaned, "zhifang_list", "2024-01-01 00:00:00")
    assert kf.columns == ["key", "value"]
    kr = kf.collect()[0]
    assert kr["key"] == "zhifang_list" and '"ctime":"2024-01-01 00:00:00"' in kr["value"]

    # S17 meta rows: one per (column + audit frame), col_px ordered — full
    # easy_meta parity is asserted in test_refresh_meta_matches_easy_meta


def test_rowkey_null_position_distinct(spark):
    """ADVICE fix: concat_ws drops NULLs, so ('a', NULL, 'b') and
    ('a', 'b', NULL) must NOT collide — NULLs coalesce to a sentinel."""
    from pyspark.sql import functions as F

    from spiderman_spark.functions.scalars import rowkey

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None), ("a", "b", "")],
        "x string, y string, z string",
    )
    keys = [
        r["k"]
        for r in df.select(
            rowkey("20240101", F.col("x"), F.col("y"), F.col("z")).alias("k")
        ).collect()
    ]
    assert len(set(keys)) == 3


def test_refresh_meta_matches_easy_meta(spark):
    """S17 full parity (`easy_meta.py:37-105`): keyid first (idx -99), DDL
    columns with their Field-dict comments, audit columns 1001-1003 last,
    col_px enumerated over the sorted frame."""
    from spiderman_spark.spiderspec import ZHIFANG

    meta = sinks.refresh_meta(spark, ZHIFANG, insertime="2024-01-01 00:00:00")
    assert meta.columns == [
        "spider", "spider_comment", "tb", "tb_comment", "col_px", "col",
        "col_comment", "author", "addtime", "insertime",
    ]
    lst = [
        (r["col_px"], r["col"], r["col_comment"], r["tb_comment"])
        for r in meta.where("tb = 'zhifang_list'").orderBy("col_px").collect()
    ]
    want = [
        (1, "keyid", "唯一标识", "列表"),
        (2, "title", "房屋标题", "列表"),
        (3, "desc", "房屋描述", "列表"),
        (4, "location", "房屋地址楼层", "列表"),
        (5, "price", "房屋价格", "列表"),
        (6, "detail_full_url", "详情链接", "列表"),
        (7, "pkey", "md5(detail_full_url)", "列表"),
        (8, "pagenum", "页码", "列表"),
        (9, "bizdate", "业务日期", "列表"),
        (10, "ctime", "入库时间", "列表"),
        (11, "spider", "爬虫名称", "列表"),
    ]
    assert lst == want
    assert meta.where("spider_comment = 'zhifang demo spider'").count() == meta.count()
    n_expected = sum(len(d.split(",")) + 4 for d in ZHIFANG.item_tables.values())
    assert meta.count() == n_expected


def test_aes_modes_roundtrip_and_reference_demo(spark):
    """F12 full surface: ECB/CBC x base64/hex round-trips, and the CBC demo
    ciphertext documented in the reference (`SP/utils/aes.py:79-96`) decrypts
    to its JSON img-url payload with the same key/iv."""
    import json

    from pyspark.sql import functions as F

    from spiderman_spark.functions import scalars as S

    df = spark.createDataFrame([("hello 世界 0123456789",)], "t string")
    for mode, iv in (("ECB", ""), ("CBC", "ABCDEF1G34123412")):
        for coding in ("base64", "hex"):
            rt = df.select(
                S.aes_decrypt_coded(
                    S.aes_encrypt_coded(F.col("t"), "123456781234567G", mode, coding, iv),
                    "123456781234567G", mode, coding, iv,
                ).alias("rt")
            ).collect()[0]["rt"]
            assert rt == "hello 世界 0123456789", (mode, coding)

    demo_path = "/root/reference/SP/utils/aes.py"
    import re

    src = open(demo_path, encoding="utf-8").read()
    ct = re.search(r'cipher_text = "([A-Za-z0-9+/=]+)"', src).group(1)
    out = (
        spark.createDataFrame([(ct,)], "ct string")
        .select(
            S.aes_decrypt_coded(
                F.col("ct"), "123456781234567G", "CBC", "base64", "ABCDEF1G34123412"
            ).alias("pt")
        )
        .collect()[0]["pt"]
    )
    urls = json.loads(out)
    assert isinstance(urls, list) and urls and all(u.endswith(".jpg") for u in urls)


def test_jdbc_derby_live_roundtrip(spark):
    """S6 un-gated (VERDICT r2 #6): a REAL JDBC transport round-trip against
    Apache Derby, embedded in the Spark JVM via the jars PySpark bundles —
    write_jdbc appends with the reference pipeline's audit frame
    (`pipelines_rdbm.py:34-105`), read back through the same driver."""
    from pyspark.sql import functions as F

    from spiderman_spark.sources.sinks import (
        cleanse,
        project_items,
        split_poison,
        with_audit,
        write_jdbc,
    )

    url = "jdbc:derby:memory:s6db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    raw = spark.createDataFrame(
        [("t1", " loc\x01 one ", "500"), ("t2", "loc two", "x" * 300)],
        "title string, location string, price string",
    )
    frame = with_audit(
        cleanse(project_items(raw, ["title", "location", "price"])),
        "20240101", "2024-01-01 00:00:00", "zhifang",
    )
    ok, poison = split_poison(frame)
    assert poison.count() == 1  # the 300-char price row
    write_jdbc(ok, url, "zhifang_list", mode="overwrite", **props)
    write_jdbc(ok, url, "zhifang_list", mode="append", **props)  # bucketed appends
    back = spark.read.jdbc(url, "zhifang_list", properties=props)
    assert back.count() == 2
    rows = back.collect()
    assert {r["title"] for r in rows} == {"t1"}
    assert all(r["location"] == "loc one" for r in rows)  # cleansed
    assert sorted(back.columns) == sorted(
        ["keyid", "title", "location", "price", "bizdate", "ctime", "spider"]
    )
    # per-row audit keyid is deterministic: both appends share it
    assert len({r["keyid"] for r in rows}) == 1


def test_aes_cbc_requires_iv():
    """ADVICE r2: CBC with a missing/short IV must fail at call time — Spark
    would otherwise pick a random IV that the coder strips, silently
    producing an unrecoverable ciphertext."""
    import pytest
    from pyspark.sql import functions as F

    from spiderman_spark.functions import scalars as S

    for fn in (S.aes_encrypt_coded, S.aes_decrypt_coded):
        with pytest.raises(ValueError, match="16-byte IV"):
            fn(F.lit("x"), "123456781234567G", "CBC", "base64", "")
        with pytest.raises(ValueError, match="16-byte IV"):
            fn(F.lit("x"), "123456781234567G", "CBC", "hex", "short")


def test_fingerprint_components_are_delimited():
    """ADVICE r2: ':'-joining lets distinct (url, body) pairs collide because
    URLs legally contain ':' — length-prefixed components must not."""
    from spiderman_spark.functions.urltools import fingerprint

    assert fingerprint("GET", "http://h/a:b", "") != fingerprint(
        "GET", "http://h/a", "b:"
    )
    assert fingerprint("GET", "http://h/a", "b") != fingerprint(
        "GEThttp", "://h/a", "b"
    )
    # determinism + body sensitivity retained
    assert fingerprint("POST", "http://h/x", "p=1") == fingerprint(
        "POST", "http://h/x", "p=1"
    )
    assert fingerprint("POST", "http://h/x", "p=1") != fingerprint(
        "POST", "http://h/x", "p=2"
    )


def test_connector_frame_seams(spark):
    """S8/S9/S10/S13 frame shapes mirror the reference pipelines' per-item
    dicts (cells/doc/bulk-action/stream-load row), audit fields included,
    missing values stringified to 'None' exactly as `str(None)` there."""
    import json

    df = spark.createDataFrame(
        [("t1", None), ("t2", "v2")], "title string, extra string"
    )
    bz, ct, sp = "20240101", "2024-01-01 00:00:00", "zhifang"

    hb = sinks.hbase_frame(df, bz, ct, sp).collect()
    assert {r["keyid"] for r in hb} == {
        r["keyid"] for r in sinks.hbase_frame(df, bz, ct, sp).collect()
    }  # deterministic
    cells = dict(hb[0]["cells"])
    assert cells["cf:title"] == "t1" and cells["cf:extra"] == "None"
    assert cells["cf:bizdate"] == bz and cells["cf:spider"] == sp

    mg = sinks.mongo_frame(df, bz, ct, sp)
    assert mg.columns == ["_id", "title", "extra", "bizdate", "ctime", "spider"]
    assert mg.where("_id IS NULL").count() == 0

    es = sinks.es_frame(df, "zhifang_list", bz, ct, sp).collect()
    assert all(r["_op_type"] == "index" and r["_index"] == "zhifang_list" for r in es)
    src = json.loads(es[1]["_source"])
    assert src["title"] == "t2" and src["bizdate"] == bz and src["spider"] == sp

    dr = sinks.doris_frame(df, bz, ct, sp)
    assert dr.columns == ["keyid", "title", "extra", "bizdate", "ctime", "spider"]
    row = dr.where("title = 't1'").collect()[0]
    assert row["extra"] == "None" and row["keyid"].startswith("20240101_")
