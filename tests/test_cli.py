"""CLI surface: the reference's command verbs over the operators
(yams_spark/cli.py), driven in-process with an injected session."""

from __future__ import annotations

import json

from yams_spark.cli import main


def _jsonl(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]


def test_cli_grep_and_search(spark, tmp_path, capsys) -> None:
    docs = spark.createDataFrame(
        [(1, "the stream flows\nno match here\nstream again"),
         (2, "nothing relevant")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)

    assert main(["grep", "stream", "--count", "--docs", p], spark=spark) == 0
    rows = _jsonl(capsys)
    assert rows == [{"doc_id": 1, "n_matches": 2}]

    assert main(["grep", "stream", "-C", "1", "--docs", p], spark=spark) == 0
    lines = _jsonl(capsys)
    assert [r["line_no"] for r in lines] == [1, 2, 3]
    assert [r["is_match"] for r in lines] == [True, False, True]

    assert main(["search", "stream flows", "--docs", p], spark=spark) == 0
    hits = _jsonl(capsys)
    assert hits and hits[0]["doc_id"] == "1"


def test_cli_get_ls_snapshot(spark, tmp_path, capsys) -> None:
    docs = spark.createDataFrame(
        [("/a/readme.txt", "aabb0011", 1), ("/b/other.txt", "ccdd2233", 2)],
        "path string, doc_hash string, warc_ts long",
    )
    p = str(tmp_path / "d.parquet")
    docs.write.parquet(p)

    assert main(["get", "readme.txt", "--docs", p, "--recency-col", "warc_ts"],
                spark=spark) == 0
    got = _jsonl(capsys)
    assert got[0]["matched_via"] == "basename" and got[0]["path"] == "/a/readme.txt"

    assert main(["ls", "--name", "read", "--docs", p], spark=spark) == 0
    assert [r["path"] for r in _jsonl(capsys)] == ["/a/readme.txt"]

    files = spark.createDataFrame(
        [("/a/x.txt", "h1"), ("/a/y.txt", "h2")], "path string, file_hash string"
    )
    fp = str(tmp_path / "files.parquet")
    files.write.parquet(fp)
    assert main(["snapshot", "--files", fp, "--snapshot-id", "s1"], spark=spark) == 0
    snap = _jsonl(capsys)[0]
    assert snap["snapshot_id"] == "s1" and snap["files_count"] == 2
    assert len(snap["tree_root_hash"]) == 64


def test_cli_kg(spark, tmp_path, capsys) -> None:
    docs = spark.createDataFrame(
        [(1, "Alpha Beta met Gamma Delta")], "doc_id long, text string"
    )
    p = str(tmp_path / "kd.parquet")
    docs.write.parquet(p)
    assert main(["kg", "--docs", p, "--pagerank-iters", "2"], spark=spark) == 0
    counts = _jsonl(capsys)[0]
    assert counts["kg_nodes"] >= 3 and counts["kg_edges"] == 2


def test_cli_grep_files_with_matches(spark, tmp_path, capsys) -> None:
    docs = spark.createDataFrame(
        [(1, "a stream here"), (2, "nothing")], "doc_id long, text string"
    )
    p = str(tmp_path / "fw.parquet")
    docs.write.parquet(p)
    assert main(["grep", "stream", "-l", "--docs", p], spark=spark) == 0
    assert _jsonl(capsys) == [{"doc_id": 1}]
    assert main(["grep", "stream", "-L", "--docs", p], spark=spark) == 0
    assert _jsonl(capsys) == [{"doc_id": 2}]


def test_cli_route_and_facets(spark, tmp_path, capsys) -> None:
    assert main(["route", "src/main.py"], spark=spark) == 0
    d = _jsonl(capsys)[0]
    assert d["intent"] == "path" and d["mode"] == "path"
    assert d["community"] == "code"

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"s{i % 3}") for i in range(30)],
        "doc_id long, lang string, source string",
    )
    p = str(tmp_path / "facet_docs.parquet")
    docs.write.parquet(p)
    # small table -> auto digits = 0 -> exact counts
    assert main(["facets", "lang", "source", "--docs", p], spark=spark) == 0
    rows = _jsonl(capsys)
    got = {(r["field"], r["value"]): r["n"] for r in rows}
    assert got[("lang", "en")] == 15 and got[("source", "s0")] == 10
    assert not any(r["approximate"] for r in rows)
    # explicit sampling digit flips the approximate flag
    assert main(
        ["facets", "lang", "--sample-digits", "1", "--docs", p], spark=spark
    ) == 0
    assert all(r["approximate"] for r in _jsonl(capsys))


def test_cli_graph_bfs(spark, tmp_path, capsys) -> None:
    edges = spark.createDataFrame(
        [("a", "b", "r1"), ("b", "c", "r1"), ("a", "x", "r2")],
        "src string, dst string, relation string",
    )
    p = str(tmp_path / "edges.parquet")
    edges.write.parquet(p)
    assert main(["graph", "a", "--edges", p, "--depth", "2"], spark=spark) == 0
    rows = _jsonl(capsys)
    assert {(r["node"], r["depth"]) for r in rows} == {
        ("a", 0), ("b", 1), ("x", 1), ("c", 2),
    }
    # relation filter prunes the r2 edge
    assert main(["graph", "a", "--edges", p, "--relation", "r1"],
                spark=spark) == 0
    assert {r["node"] for r in _jsonl(capsys)} == {"a", "b", "c"}


def test_cli_topo(spark, tmp_path, capsys) -> None:
    clusters = spark.createDataFrame(
        [("c0", 4, 0.4, 0.8, [1.0, 0.0]), ("c1", 2, 0.2, 0.5, [0.0, 1.0])],
        "cluster_id string, member_count long, persistence double, "
        "cohesion double, centroid array<double>",
    )
    mem = spark.createDataFrame(
        [("d0", "c0"), ("d1", "c0"), ("e0", "c1")],
        "doc_hash string, cluster_id string",
    )
    cp, mp = str(tmp_path / "cl.parquet"), str(tmp_path / "mem.parquet")
    clusters.write.parquet(cp)
    mem.write.parquet(mp)
    assert main([
        "topo", "--clusters", cp, "--memberships", mp,
        "--seed", "d0=2.0", "--seed", "e0", "--alpha", "1.0",
    ], spark=spark) == 0
    rows = _jsonl(capsys)
    assert [r["cluster_id"] for r in rows] == ["c0", "c1"]
    # alpha=1: pure sparse mass (2.0 vs 1.0) + 0.05*persistence
    assert abs(rows[0]["route_score"] - (1.0 + 0.02)) < 1e-9
    assert abs(rows[1]["route_score"] - (0.5 + 0.01)) < 1e-9


def test_cli_filetype_archive_title(spark, tmp_path, capsys) -> None:
    from yams_spark.functions.archive_codecs import build_zip
    from yams_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [
            ("m1", "image", b"\x89PNG\r\n\x1a\n" + b"\0" * 32,
             "image/png", None, None, None),
            ("m2", "archive",
             build_zip([("a.txt", b"hello members " * 4)]),
             "application/zip", None, None, None),
        ],
        MEDIA_SCHEMA,
    )
    p = str(tmp_path / "cli_media.parquet")
    media.write.parquet(p)

    assert main(["filetype", "--media", p], spark=spark) == 0
    rows = {r["media_id"]: r for r in _jsonl(capsys)}
    assert rows["m1"]["mime"] == "image/png"
    assert rows["m2"]["mime"] == "application/zip"

    assert main(["archive", "--media", p], spark=spark) == 0
    listing = {r["media_id"]: r for r in _jsonl(capsys) if r["format"]}
    assert listing["m2"]["total_files"] == 1

    assert main(["archive", "--media", p, "--members"], spark=spark) == 0
    members = _jsonl(capsys)
    assert members[0]["member_name"] == "a.txt"

    docs = spark.createDataFrame(
        [(1, "<title>T1</title>", "a.html", "text/html", ".html"),
         (2, "def f():", "b.py", "text/plain", ".py")],
        "doc_id long, text string, name string, mime_type string, "
        "ext string",
    )
    dp = str(tmp_path / "cli_title_docs.parquet")
    docs.write.parquet(dp)
    assert main(["title", "--docs", dp], spark=spark) == 0
    titles = {r["doc_id"]: r["title"] for r in _jsonl(capsys)}
    assert titles[1] == "T1" and titles[2] == "def f():"
