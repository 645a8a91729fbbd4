"""Tests for the evaluation operator and query-qualifier parsing."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from yams_spark.operators import qualifiers
from yams_spark.operators.evaluation import labeled_pairs, pairwise_f1


def test_pairwise_f1_hand_computed(spark) -> None:
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("d", "e"), ("a", "d")],
        "url_a string, url_b string",
    )
    truth = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2), ("d", 3), ("e", 3)], "url string, family_id long"
    )
    members = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("d", "g2"), ("e", "g2")], "url string, group_key string"
    )
    row = pairwise_f1(labeled_pairs(pairs, truth), members).collect()[0]
    # matches: (a,b) tp; (d,e) tp; (a,c) pred F label F tn; (b,c) tn; (a,d) tn
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (2, 0, 0, 3)
    assert row["f1"] == pytest.approx(1.0)


def test_parse_qualifiers() -> None:
    p = qualifiers.parse_qualifiers('ext:html lang:en find me site:example.com "x"')
    assert p.qualifiers == {"ext": "html", "lang": "en", "site": "example.com"}
    assert p.text == 'find me "x"'
    p2 = qualifiers.parse_qualifiers('name:"some file" rest')
    assert p2.qualifiers["name"] == "some file"


def test_parse_time_relative_and_natural() -> None:
    now = datetime(2024, 6, 15, 12, 0, 0, tzinfo=timezone.utc)
    assert qualifiers.parse_time("7d", now) == datetime(2024, 6, 8, 12, 0, tzinfo=timezone.utc)
    assert qualifiers.parse_time("30m", now) == datetime(2024, 6, 15, 11, 30, tzinfo=timezone.utc)
    assert qualifiers.parse_time("yesterday", now) == datetime(2024, 6, 14, 0, 0, tzinfo=timezone.utc)
    assert qualifiers.parse_time("2024-01-02T03:04:05") == datetime(2024, 1, 2, 3, 4, 5)


def test_apply_qualifiers_filters(spark) -> None:
    df = spark.createDataFrame(
        [
            ("https://a.example/x.html", datetime(2024, 1, 5), "en"),
            ("https://b.example/y.pdf", datetime(2024, 1, 1), "de"),
        ],
        "url string, warc_ts timestamp, lang string",
    )
    out, text = qualifiers.apply_qualifiers(df, "ext:html lang:en after:2024-01-02 hello")
    assert text == "hello"
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["url"].endswith("x.html")


def test_workspace_scope_filter(spark) -> None:
    from yams_spark.operators.qualifiers import workspace_scope_filter

    df = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",), ("file:///ws/z",)],
        ["url"],
    )
    got = {
        r["url"]
        for r in workspace_scope_filter(
            df, ["https://a.example/", "file:///ws/"]
        ).collect()
    }
    assert got == {"https://a.example/x", "file:///ws/z"}
    assert workspace_scope_filter(df, []).count() == 3  # unscoped


def test_metadata_query_filter(spark):
    from yams_spark.operators.qualifiers import metadata_query_filter

    rows = [
        ("a", "text/html", "report_1.txt",
         {"project": "x", "keep": ""}, 100, 200),
        ("b", "text/plain", "report_2.txt",
         {"project": "y", "tmp": ""}, 150, 250),
        ("c", "text/html", "notes.md", {"project": "x"}, 50, 300),
        ("d", "text/html", "report_3.txt", {}, 120, 220),
    ]
    df = spark.createDataFrame(
        rows, "k string, mime_type string, name string, "
        "tags map<string,string>, created_ts long, modified_ts long"
    )

    def keys(**kw):
        return {
            r["k"] for r in df.where(metadata_query_filter(**kw)).collect()
        }

    assert keys(mime_type="text/html") == {"a", "c", "d"}
    # std::regex_match = FULL match: 'report_' alone matches nothing
    assert keys(name_pattern="report_") == set()
    assert keys(name_pattern=r"report_\d\.txt") == {"a", "b", "d"}
    assert keys(required_tags=["project", "keep"]) == {"a"}
    assert keys(any_tags=["keep", "tmp"]) == {"a", "b"}
    assert keys(exclude_tags=["tmp"]) == {"a", "c", "d"}
    assert keys(created_after=100, created_before=130) == {"a", "d"}
    assert keys(modified_after=220, modified_before=300) == {"b", "c", "d"}
    assert keys(custom_fields={"project": "x"}) == {"a", "c"}
    assert keys(
        mime_type="text/html", required_tags=["project"],
        custom_fields={"project": "x"}, created_after=60,
    ) == {"a"}
