"""Query router (operators/router.py): intent / mode / community
branches pinned against the reference's rules (query_router.cpp)."""

from __future__ import annotations

import pytest

from yams_spark.operators.router import route_queries, route_query


CASES = [
    # (query, intent, intent_reason, mode, mode_reason, community)
    ("src/main.py", "path", "path_separator", "path", "path_intent", "code"),
    ("./relative", "path", "path_separator", "path", "path_intent", "code"),
    ("getFooBar", "code", "camel_case", "literal", "code_intent", "code"),
    ("get_foo", "code", "code_signature", "literal", "code_intent", "code"),
    ("ns::method", "code", "code_signature", "literal", "code_intent", "code"),
    ("notes.txt", "code", "file_extension", "literal", "code_intent", "code"),
    ("report.pdf2", "code", "file_extension", "literal", "code_intent", "code"),
    ('"exact phrase"', "mixed", "short_query_fallback", "literal",
     "quoted_literal", None),
    # regex chars don't make code intent (4 alnum tokens -> prose), but
    # they do force literal retrieval
    ("foo.*bar[0-9]", "prose", "token_count>=3", "literal", "regex_like",
     None),
    ("the quick brown fox", "prose", "token_count>=3", "semantic",
     "prose_intent", None),
    ("one two three four five six seven", "prose", "token_count>=3",
     "semantic", "long_prose", None),
    ("hello", "mixed", "short_query_fallback", "literal",
     "short_query_literal_bias", None),
    ("", "mixed", "empty_query", "hybrid", "empty_query", None),
    ("study of gene mutation effects", "prose", "token_count>=3",
     "semantic", "prose_intent", "scientific"),
    ("vacation photo album ideas", "prose", "token_count>=3",
     "semantic", "prose_intent", "media"),
]


@pytest.mark.parametrize(
    "query,intent,intent_reason,mode,mode_reason,community", CASES
)
def test_route_branches(
    spark, query, intent, intent_reason, mode, mode_reason, community
) -> None:
    d = route_query(spark, query)
    assert d["intent"] == intent, d
    assert d["intent_reason"] == intent_reason, d
    assert d["mode"] == mode, d
    assert d["mode_reason"] == mode_reason, d
    assert d["community"] == community, d


def test_route_details(spark) -> None:
    # scientific confidence grows with hits: 0.55 + 0.10/hit, capped 1.0
    d = route_query(spark, "study analysis trial evidence here")
    assert d["community"] == "scientific"
    assert d["community_confidence"] == pytest.approx(0.95)
    assert d["community_reason"] == "scientific_terms=4"
    # media reason names the FIRST media token
    m = route_query(spark, "my podcast and video list")
    assert m["community_reason"] == "media_term=podcast"
    # dotfile is NOT a file extension (dot at position 0)
    assert route_query(spark, ".bashrc")["intent"] == "mixed"
    # "Ab" capital-first is not camel; interior upper is
    assert route_query(spark, "Hello world foo")["intent"] == "prose"
    assert route_query(spark, "heLLo")["intent"] == "code"


def test_route_queries_batch(spark) -> None:
    d = spark.createDataFrame(
        [(1, "src/x.py"), (2, "plain words here")], "id long, query string"
    )
    out = {r["id"]: r for r in route_queries(d).collect()}
    assert out[1]["mode"] == "path" and out[2]["mode"] == "semantic"
    # narrow plan: no shuffle operators
    plan = route_queries(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
