"""HTML -> text extraction (S3 analog: the reference's hand-rolled FASTQ
pull parser, ``lib/parse_fastq.py:6-39``, whose graft is the page-payload
parse) and URL structure projections (P11 analog: ``get_coords`` parsing
``(tile,x,y)`` from the record name, ``lib/parse_sam.py:41-43``).

Extraction is a deterministic pure function of the html bytes — the
byte-identical-text-per-url invariant (BASELINE.json input_hint) is
checked in tests by extracting twice and diffing. Vectorized pandas UDF
(Arrow batches); regex-based tag stripping with script/style removal —
deliberately simple and stable, NOT a browser emulation.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'", "&nbsp;": " "}


def extract_text(html: bytes | None) -> str:
    """Deterministic tag-strip extraction of one html payload."""
    if html is None:
        return ""
    stripped = _TAG_RE.sub(b" ", _SCRIPT_RE.sub(b" ", bytes(html)))
    text = stripped.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES.items():
        text = text.replace(ent, ch)
    return _WS_RE.sub(" ", text).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(htmls: pd.Series) -> pd.Series:
    return htmls.map(extract_text)


def url_host(col: Column) -> Column:
    """Host part of a url (graft of the tile grouping key)."""
    return F.regexp_extract(col, r"^[a-z]+://([^/]+)", 1)


def url_path_depth(col: Column) -> Column:
    """Number of path segments (graft of the (x, y) coordinate ints)."""
    path = F.regexp_extract(col, r"^[a-z]+://[^/]+(/.*)?$", 1)
    seg = F.filter(F.split(path, "/"), lambda s: s != "")
    return F.size(seg)
