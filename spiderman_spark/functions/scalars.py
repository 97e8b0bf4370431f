"""Scalar function surface (SURVEY.md §2.8 F1-F16) — every helper the
reference's utils expose, as JVM-side Column expressions (no Python UDFs).

Reference sources: `/root/reference/SP/utils/tool.py` (clean/coalesce/md5/
base64/timestamp/file-type/url-check), `SP/utils/base.py:38-46` (pkey/rowkey),
`SP/utils/aes.py` (AES helpers), `SP/pipelines/pipelines_file.py:23`
(filename sanitize), `SP/utils/cookies_tool.py:59-64` (cookie parse),
`SP/middlewares/SPMiddleWare.py:40-46` (UA rotation), `test_html.py:15-24`
(str2dict).  Everything here compiles into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# control/garbage chars removed by clean() (`SP/utils/tool.py:17-27`,
# `SP/pipelines/pipelines_clean.py:14-29`)
_CLEAN_CHARS = "\x01\xa0\n\t\r"

# extension whitelist (`SP/utils/tool.py:93-99`); 'tar.gz' can't match a
# last-dot-segment scan there either — kept for parity
FILE_TYPES = (
    "pdf ppt xls xlsx doc docx txt wps "
    "bmp gif jpg jpeg png tif swf "
    "rar zip arj gz tar 7z "
    "rmvb mp4 rm mpg mpeg avi mov wmv "
    "mid mp3 wma wav"
).split()

# URL dirty-word blacklist (`SP/utils/tool.py:121-125`)
DIRTY_WORDS = [
    "baidu.com", "javascript", "mailto:", "sougou.com",
    "@qq.com", "@gmail.com", "@163.com", "@yahoo.com", "@msn.com",
    "@hotmail.com", "@aol.com", "@ask.com",
    "@live.com", "@0355.net", "@163.net", "@263.net", "@3721.net", "@yeah",
]


def clean(col: Column) -> Column:
    """F1: None→'', strip control chars, trim."""
    return F.trim(F.translate(F.coalesce(col, F.lit("")), _CLEAN_CHARS, ""))


def first_nonempty(*cols: Column) -> Column:
    """F2: first non-empty value (reference ``coalesce`` treats '' as empty)."""
    out = F.lit("")
    for c in reversed(cols):
        cc = F.coalesce(c, F.lit(""))
        out = F.when(cc != "", cc).otherwise(out)
    return out


def md5_lower(col: Column) -> Column:
    """F3: md5 hexdigest (`tool.py:46-53`)."""
    return F.md5(col.cast("string"))


def pkey(col: Column) -> Column:
    """D3: UPPER(md5(url)) primary key (`base.py:38-40`)."""
    return F.upper(F.md5(col.cast("string")))


def rowkey(bizdate: str, *cols: Column) -> Column:
    """D4: ``bizdate_<hash>`` rowkey. The reference uses uuid1 (time/MAC
    dependent, `base.py:43-46`); the deterministic replacement hashes the
    identifying columns instead (SURVEY.md §7.3.2).

    NULLs coalesce to a sentinel before concat_ws (which silently DROPS null
    members): without it ('a', NULL, 'b') and ('a', 'b', NULL) would collide
    to the same primary key."""
    safe = [F.coalesce(c.cast("string"), F.lit("\x00NULL")) for c in cols]
    return F.concat(F.lit(bizdate), F.lit("_"), F.md5(F.concat_ws("|", *safe)))


def b64_encode(col: Column) -> Column:
    """F4 (`tool.py:56-63`)."""
    return F.base64(col.cast("binary"))


def b64_decode(col: Column) -> Column:
    """F4 (`tool.py:66-73`)."""
    return F.unbase64(col).cast("string")


def epoch_to_str(col: Column, unit: str = "ms", fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """F5: epoch s/ms → formatted string (`tool.py:76-85`)."""
    secs = (col.cast("long") / 1000).cast("long") if unit == "ms" else col.cast("long")
    return F.date_format(F.timestamp_seconds(secs), fmt)


def file_type(url: Column, extra: list[str] | None = None) -> Column:
    """F6: extension sniffing with ?/& suffix strip + data-url fallback
    (`tool.py:88-113`); '' when not whitelisted."""
    types = FILE_TYPES + list(extra or [])
    last = F.element_at(F.split(url, r"\."), -1)
    ext = F.lower(F.trim(F.element_at(F.split(F.element_at(F.split(last, "&"), 1), r"\?"), 1)))
    data_ext = F.lower(F.trim(F.regexp_extract(url, r"data:image/(.*);", 1)))
    return (
        F.when(ext.isin(types), ext)
        .when(data_ext.isin(types), data_ext)
        .otherwise(F.lit(""))
    )


def url_ok(url: Column, extra: list[str] | None = None) -> Column:
    """F7/P3: True iff the url contains no blacklisted substring
    (`tool.py:116-134`)."""
    ok = F.lit(True)
    for kw in DIRTY_WORDS + list(extra or []):
        ok = ok & ~url.contains(kw)
    return ok


def str2dict(col: Column) -> Column:
    """F9: 'k: v' lines → map (`test_html.py:15-24`)."""
    return F.str_to_map(col, F.lit("\n"), F.lit(": "))


def cookies_to_map(col: Column) -> Column:
    """F16: cookie string → map (`cookies_tool.py:59-64`)."""
    return F.str_to_map(F.trim(col), F.lit("; "), F.lit("="))


def aes_encrypt_coded(
    col: Column, key: str, mode: str = "ECB", coding: str = "base64", iv: str = ""
) -> Column:
    """F12 full surface (`SP/utils/aes.py:26-77`): MODE_ECB | MODE_CBC with a
    caller-supplied IV, PKCS padding ('PKCS5Padding' there), base64 or
    (lowercase) hex coding.  The reference ships the IV out-of-band while
    Spark's CBC output prepends it — stripped here so ciphertexts interop.
    Our base64 is single-line RFC 4648 (the reference's ``encodebytes``
    wraps at 76 chars for long payloads)."""
    _check_iv(mode, iv)
    ct = F.aes_encrypt(
        col.cast("binary"), F.lit(key), F.lit(mode), F.lit("PKCS"),
        F.lit(iv.encode() if iv else b""),
    )
    if mode == "CBC":
        ct = F.substring(ct, 17, 2**31 - 1)  # drop Spark's prepended IV
    return F.base64(ct) if coding == "base64" else F.lower(F.hex(ct))


def _check_iv(mode: str, iv: str) -> None:
    """CBC without a caller IV would let Spark pick a random one that is then
    stripped from the ciphertext — an unrecoverable round-trip.  Fail at call
    time instead, mirroring the reference's required-IV contract
    (`SP/utils/aes.py:49-59` passes iv into AES.new for CBC)."""
    if mode == "CBC" and len(iv.encode()) != 16:
        raise ValueError(
            f"CBC mode requires a 16-byte IV (got {len(iv.encode())} bytes)"
        )


def aes_decrypt_coded(
    col: Column, key: str, mode: str = "ECB", coding: str = "base64", iv: str = ""
) -> Column:
    _check_iv(mode, iv)
    raw = F.unbase64(col) if coding == "base64" else F.unhex(col)
    if mode == "CBC":
        raw = F.concat(F.lit(iv.encode()), raw)  # re-prepend the shared IV
    return F.aes_decrypt(raw, F.lit(key), F.lit(mode), F.lit("PKCS")).cast("string")


def aes_encrypt_b64(col: Column, key: str) -> Column:
    """F12: AES-ECB + PKCS padding + base64, as `SP/utils/aes.py:15-43`
    (Spark >=3.3 builtin; key must be 16/24/32 bytes)."""
    return aes_encrypt_coded(col, key)


def aes_decrypt_b64(col: Column, key: str) -> Column:
    return aes_decrypt_coded(col, key)


def sanitize_filename(col: Column) -> Column:
    """F15: strip characters illegal in filenames (`pipelines_file.py:23`)."""
    return F.regexp_replace(col, r'[:*?"<>|]', "")


def pick_rotating(options: list[str], key: Column) -> Column:
    """F13: deterministic rotation replacing random.choice (UA/cookie pick,
    `SPMiddleWare.py:40-46`): element keyed by hash so reruns reproduce."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(key), F.lit(len(options))) + 1).cast("int"))


def price_value(col: Column) -> Column:
    """F14/P7: extract the integer from '单价NNNN元' (`kafka_mon.py:25-29`)."""
    return F.regexp_extract(col, r"单价(\d+)元", 1).cast("int")
