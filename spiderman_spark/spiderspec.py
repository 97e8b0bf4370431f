"""SpiderSpec — declarative spider definition, the codegen-free equivalent of
the reference's ``easy_scrapy.py`` template generator.

The reference scaffolds a new spider by writing three files from string
templates (`/root/reference/easy_scrapy.py:11-338,368-421`): a spider module
(parse callbacks + callback registry), an items module (field dicts), and a
job script (seed generator).  Here the same three concerns are one dataclass:

- ``item_tables``: tablename → DDL (replaces the Item field dicts; column
  order in the DDL is the ``idx`` order);
- ``callbacks``: callback name → dont_filter flag (replaces the
  ``get_callback`` registry, `SP/spiders/zhifang.py:55-61`);
- ``parse``: one pure function ``(url, body) -> (items, child_requests)``
  (replaces the per-callback parse methods — shared verbatim by the Spark
  mapInPandas stage and the reference simulator, so parity is by
  construction);
- ``make_seeds``: pages → ordered seed request dicts (replaces the job
  script's ``make_job``).

CrawlEngine takes a spec and runs any spider; ZHIFANG is the demo spider the
reference ships.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from . import parselib


@dataclass(frozen=True)
class SpiderSpec:
    name: str
    item_tables: dict  # tablename -> DDL string
    callbacks: dict  # callback name -> dont_filter (True = skip dedup)
    parse: Callable  # (url, body) -> ([(tablename, item_dict)], [request_dict])
    make_seeds: Callable | None = None  # (pages) -> [request_dict]
    # callbacks whose fetched pages run the parse stage (others, e.g. 'file',
    # are payload fetches handled by the downloader)
    page_callbacks: tuple = ("list", "detail")
    # metadata-catalog surface (S17): what the reference introspects from the
    # spider docstring + Item field dicts (`easy_meta.py:37-76`) is declared
    # here — per-table descriptions, per-column comments, and the spider's
    # @Describe/@Author/@Time header lines
    table_desc: dict = field(default_factory=dict)  # tablename -> description
    comments: dict = field(default_factory=dict)  # tablename -> {col: comment}
    describe: str = ""
    author: str = ""
    addtime: str = ""


ZHIFANG = SpiderSpec(
    name="zhifang",
    item_tables=dict(parselib.ITEM_TABLES),
    callbacks={"list": True, "detail": True},
    parse=parselib.parse_body,
    page_callbacks=parselib.PAGE_CALLBACKS,
    # reference comments: `SP/items/zhifang_items.py:10-49`, `SP/items/items.py:17-27`
    table_desc={
        "zhifang_list": "列表",
        "zhifang_detail": "详情",
        "zhifang_file": "附件",
    },
    comments={
        "zhifang_list": {
            "title": "房屋标题", "desc": "房屋描述", "location": "房屋地址楼层",
            "price": "房屋价格", "detail_full_url": "详情链接",
            "pkey": "md5(detail_full_url)", "pagenum": "页码",
        },
        "zhifang_detail": {
            "type1": "户型楼层", "type2": "朝向类型", "type3": "面积结构",
            "plot_name": "小区名称", "area": "所在区域", "look_time": "看房时间",
            "source_id": "房源标号", "fkey": "等于list.pkey",
        },
        "zhifang_file": {
            "file_url": "附件链接", "file_type": "附件类型", "file_name": "附件名称",
            "status": "下载状态", "file_path": "文件存储路径", "fkey": "外键",
        },
    },
    describe="zhifang demo spider",
    author="way",
    addtime="2020-05-09 15:31",
)
