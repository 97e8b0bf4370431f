"""Pure parse callbacks — shared by the Spark mapInPandas stage and the
reference simulator, so item and child-request production is identical by
construction.

Mirrors the reference's parse registry (`SP/spiders/zhifang.py:55-61`):
``list_parse`` yields one ``zhifang_list`` item + one detail request per row
(`zhifang.py:63-96`); ``detail_parse`` yields one ``zhifang_detail`` item plus
one ``zhifang_file`` item per image URL (`zhifang.py:98-132`) — images become
*file items* handled by the decoupled downloader, not frontier requests.
"""

from __future__ import annotations

import hashlib
import json

from .functions.urltools import urljoin

ITEM_TABLES = {
    "zhifang_list": (
        "title string, desc string, location string, price string,"
        " detail_full_url string, pkey string, pagenum string"
    ),
    "zhifang_detail": (
        "type1 string, type2 string, type3 string, plot_name string,"
        " area string, look_time string, source_id string, fkey string"
    ),
    "zhifang_file": (
        "file_url string, file_type string, file_name string, status string,"
        " file_path string, fkey string"
    ),
}

PAGE_CALLBACKS = ("list", "detail")


def parse_body(url: str, body: str) -> tuple[list[tuple[str, dict]], list[dict]]:
    """JSON response body → ([(tablename, item_dict)], [child request dicts])."""
    doc = json.loads(body)
    items: list[tuple[str, dict]] = []
    children: list[dict] = []
    if doc["kind"] == "list":
        for row in doc["rows"]:
            full = urljoin(url, row["detail_url"])
            pkey = hashlib.md5(full.encode()).hexdigest().upper()
            items.append(
                (
                    "zhifang_list",
                    {
                        "title": row["title"],
                        "desc": row["desc"],
                        "location": row["location"],
                        "price": row["price"],
                        "detail_full_url": full,
                        "pkey": pkey,
                        "pagenum": str(doc["pagenum"]),
                    },
                )
            )
            children.append(
                {
                    "url": full,
                    "method": "GET",
                    "callback": "detail",
                    "meta": {"fkey": pkey, "pagenum": str(doc["pagenum"])},
                }
            )
    elif doc["kind"] == "detail":
        fkey = hashlib.md5(url.encode()).hexdigest().upper()
        row = dict(doc["fields"])
        row["fkey"] = fkey
        items.append(("zhifang_detail", row))
        for img_rel in doc["image_urls"]:
            full = urljoin(url, img_rel)
            items.append(
                (
                    "zhifang_file",
                    {
                        "file_url": full,
                        "file_type": full.rsplit(".", 1)[-1],
                        "file_name": full.rsplit("/", 1)[-1],
                        "status": "未下载",
                        "file_path": "",
                        "fkey": fkey,
                    },
                )
            )
    return items, children
