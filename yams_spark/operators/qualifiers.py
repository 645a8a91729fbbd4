"""Inline query-qualifier parsing → DataFrame predicates.

The reference strips inline qualifiers (``name:``, ``ext:``, ``mime:``,
``lines:``, ``pages:``, ``section:``, ``selector:``) from a query string
and turns them into filter hints (query_qualifiers.hpp:11-36,216-360); it
also parses relative/natural time filters ("7d", "yesterday",
src/cli/time_parser.cpp). Spark recast: parse driver-side, emit Column
predicates; the query remainder feeds the lexical scorer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUALIFIER_RE = re.compile(
    r"\b(name|ext|mime|lang|source|site|lines|pages|section|selector|before|after):(\"[^\"]*\"|'[^']*'|\S+)"
)

_REL_TIME_RE = re.compile(r"^(\d+)([smhdw])$")
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


@dataclass
class ParsedQuery:
    text: str
    qualifiers: dict[str, str] = field(default_factory=dict)


def parse_qualifiers(query: str) -> ParsedQuery:
    """Strip ``key:value`` qualifiers; return cleaned text + qualifier map.
    Values may be quoted; later duplicates win (reference keeps last)."""
    quals: dict[str, str] = {}

    def strip(m: re.Match[str]) -> str:
        value = m.group(2)
        if value and value[0] in "\"'" and value[-1] == value[0]:
            value = value[1:-1]
        quals[m.group(1)] = value
        return " "

    cleaned = _QUALIFIER_RE.sub(strip, query)
    cleaned = " ".join(cleaned.split())
    return ParsedQuery(text=cleaned, qualifiers=quals)


def parse_time(value: str, now: datetime | None = None) -> datetime:
    """Relative ("7d", "30m"), natural ("yesterday", "today"), or ISO."""
    now = now or datetime.now(timezone.utc)
    v = value.strip().lower()
    m = _REL_TIME_RE.match(v)
    if m:
        return now - timedelta(seconds=int(m.group(1)) * _UNIT_SECONDS[m.group(2)])
    if v == "yesterday":
        return (now - timedelta(days=1)).replace(hour=0, minute=0, second=0, microsecond=0)
    if v == "today":
        return now.replace(hour=0, minute=0, second=0, microsecond=0)
    return datetime.fromisoformat(value)


def _glob_to_rlike(glob: str) -> str:
    out = "^"
    for ch in glob:
        if ch == "*":
            out += ".*"
        elif ch == "?":
            out += "."
        else:
            out += re.escape(ch)
    return out + "$"


def qualifier_predicates(
    parsed: ParsedQuery,
    url_col: str = "url",
    lang_col: str = "lang",
    ts_col: str = "warc_ts",
    now: datetime | None = None,
) -> list[Column]:
    """Map the qualifier dict to Column predicates over the pages schema."""
    preds: list[Column] = []
    q = parsed.qualifiers
    if "name" in q:
        preds.append(F.col(url_col).rlike(_glob_to_rlike("*" + q["name"] + "*")))
    if "ext" in q:
        preds.append(F.col(url_col).endswith("." + q["ext"].lstrip(".")))
    if "site" in q:
        preds.append(F.col(url_col).contains("://" + q["site"]) | F.col(url_col).contains("://www." + q["site"]))
    if "lang" in q:
        preds.append(F.col(lang_col) == q["lang"])
    if "after" in q:
        preds.append(F.col(ts_col) >= F.lit(parse_time(q["after"], now)))
    if "before" in q:
        preds.append(F.col(ts_col) < F.lit(parse_time(q["before"], now)))
    return preds


def apply_qualifiers(df: DataFrame, query: str, **cols) -> tuple[DataFrame, str]:
    """Filter ``df`` by the inline qualifiers of ``query``; return the
    filtered frame and the cleaned query text."""
    parsed = parse_qualifiers(query)
    for pred in qualifier_predicates(parsed, **cols):
        df = df.where(pred)
    return df, parsed.text


def workspace_scope_filter(
    df: DataFrame, prefixes: list[str], path_col: str = "url"
) -> DataFrame:
    """Workspace scoping: keep rows whose path/url starts with one of the
    workspace roots (the reference scopes every list/search/grep call to
    the active workspace prefix set; empty prefix list = unscoped). A
    prefix disjunction stays Catalyst-side and pushes down as
    StringStartsWith into the scan."""
    if not prefixes:
        return df
    pred = None
    for p in prefixes:
        c = F.col(path_col).startswith(p)
        pred = c if pred is None else (pred | c)
    return df.where(pred)


def metadata_query_filter(
    mime_type: str | None = None,
    name_pattern: str | None = None,
    required_tags: list[str] = (),
    any_tags: list[str] = (),
    exclude_tags: list[str] = (),
    created_after: int | None = None,
    created_before: int | None = None,
    modified_after: int | None = None,
    modified_before: int | None = None,
    custom_fields: dict[str, str] | None = None,
    mime_col: str = "mime_type",
    name_col: str = "name",
    tags_col: str = "tags",
    created_col: str = "created_ts",
    modified_col: str = "modified_ts",
):
    """MetadataQuery::matches (src/api/content_metadata.cpp:319-384) as
    one Catalyst predicate: exact mime, FULL-regex name match
    (std::regex_match semantics — the pattern is anchored), required /
    any / exclude tag keys over the tag map, closed timestamp range
    gates (strict < / > rejections), and custom key=value equality.
    Pure scan-level filter — pushdown-friendly for every non-regex
    clause."""
    from pyspark.sql import functions as F

    pred = F.lit(True)
    if mime_type is not None:
        pred = pred & (F.col(mime_col) == mime_type)
    if name_pattern is not None:
        pred = pred & F.col(name_col).rlike(f"^(?:{name_pattern})$")
    tags = F.col(tags_col)
    for t in required_tags:
        pred = pred & F.map_contains_key(tags, F.lit(t))
    if any_tags:
        any_pred = F.lit(False)
        for t in any_tags:
            any_pred = any_pred | F.map_contains_key(tags, F.lit(t))
        pred = pred & any_pred
    for t in exclude_tags:
        pred = pred & ~F.map_contains_key(tags, F.lit(t))
    if created_after is not None:
        pred = pred & ~(F.col(created_col) < F.lit(created_after))
    if created_before is not None:
        pred = pred & ~(F.col(created_col) > F.lit(created_before))
    if modified_after is not None:
        pred = pred & ~(F.col(modified_col) < F.lit(modified_after))
    if modified_before is not None:
        pred = pred & ~(F.col(modified_col) > F.lit(modified_before))
    for k, v in (custom_fields or {}).items():
        pred = pred & (
            F.element_at(tags, F.lit(k)).isNotNull()
            & (F.element_at(tags, F.lit(k)) == v)
        )
    return pred
