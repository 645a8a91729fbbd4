"""KG relation summary + document-topology analysis
(kg_relation_summary.cpp / kg_topology_analysis.cpp) — hand-computed."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from yams_spark.operators.kg_summary import (
    analyze_document_topology,
    expand_file_node_keys,
    file_relation_summaries,
    normalize_relation_expr,
)


def test_normalize_relation_name(spark):
    cases = [
        ("  Call  ", "calls"),             # trim + lower + alias
        ("rename-to", "renamed_to"),       # '-' -> '_' then alias
        ("Blob Version", "has_version"),   # space -> '_' then alias
        ("a - b", "a___b"),                # per-char map, NOT collapsed
        ("LINKS to", "links_to"),          # no alias
        ("   ", ""),                       # whitespace-only -> empty
        ("version", "has_version"),
        ("move_from", "moved_from"),
    ]
    df = spark.createDataFrame([Row(r=c[0]) for c in cases])
    got = [r[0] for r in df.select(normalize_relation_expr("r")).collect()]
    assert got == [c[1] for c in cases]


def test_expand_file_node_keys(spark):
    df = spark.createDataFrame(
        [
            Row(path="path:file:a/b", hash="doc:h1"),
            Row(path="file:a/b", hash="blob:h1"),
            Row(path="a/b", hash="h1"),
            Row(path="", hash=None),
        ]
    )
    rows = df.select(
        expand_file_node_keys("path", "hash").alias("keys")
    ).collect()
    # kg_relation_summary.cpp:19-77 - both sibling forms re-derived
    assert set(rows[0].keys) == {"path:file:a/b", "file:a/b", "doc:h1", "blob:h1"}
    assert set(rows[1].keys) == set(rows[0].keys)
    assert set(rows[2].keys) == set(rows[0].keys)
    assert rows[3].keys == []


def test_file_relation_summaries(spark):
    files = spark.createDataFrame(
        [(1, "a", None), (2, "zzz", None)],  # file 2 resolves no node
        "file_id long, path string, hash string",
    )
    nodes = spark.createDataFrame(
        [Row(node_key="path:file:a", node_id=10), Row(node_key="file:a", node_id=11)]
    )
    edges = spark.createDataFrame(
        [
            # id-keyed duplicate -> counted once
            Row(edge_id=1, src_node_id=10, dst_node_id=20, relation="call"),
            Row(edge_id=1, src_node_id=10, dst_node_id=20, relation="call"),
            # synthetic (id 0) duplicate -> deduped on src:dst:relation
            Row(edge_id=0, src_node_id=21, dst_node_id=10, relation="include"),
            Row(edge_id=0, src_node_id=21, dst_node_id=10, relation="include"),
            # reaches the file via its second node
            Row(edge_id=2, src_node_id=11, dst_node_id=22, relation="Call"),
            # whitespace-only relation -> dropped after normalization
            Row(edge_id=3, src_node_id=10, dst_node_id=23, relation="  "),
            # unrelated edge -> no file
            Row(edge_id=4, src_node_id=99, dst_node_id=98, relation="call"),
        ]
    )
    out = file_relation_summaries(files, nodes, edges, top_limit=5).collect()
    assert {r.file_id for r in out} == {1}  # file 2 -> nullopt branch
    by_rel = {r.relation: r for r in out}
    assert by_rel["calls"].rel_count == 2   # edge 1 (deduped) + edge 2
    assert by_rel["includes"].rel_count == 1
    assert all(r.total_edges == 3 for r in out)
    # count desc, then name asc
    assert [r.relation for r in sorted(out, key=lambda r: r.rank)] == [
        "calls", "includes"]
    # top-limit cut
    top1 = file_relation_summaries(files, nodes, edges, top_limit=1).collect()
    assert [(r.file_id, r.relation) for r in top1] == [(1, "calls")]


def test_analyze_document_topology_hand_computed(spark):
    # docs 0..5; chain 0-1-2 (0<->1 reciprocal), pair 3->4 one-way;
    # 5 isolated; self-loop on 2; stray edge to 99; duplicate 3->4
    docs = spark.createDataFrame([Row(node_id=n) for n in range(6)])
    edges = spark.createDataFrame(
        [
            Row(src=0, dst=1),
            Row(src=1, dst=0),
            Row(src=1, dst=2),
            Row(src=3, dst=4),
            Row(src=3, dst=4),
            Row(src=2, dst=2),
            Row(src=4, dst=99),
        ]
    )
    s = analyze_document_topology(docs, edges).collect()[0]
    assert s.document_node_count == 6
    assert s.semantic_edge_count == 3          # {0,1} {1,2} {3,4}
    assert s.documents_with_semantic_neighbors == 5
    assert s.isolated_document_count == 1      # doc 5
    assert abs(s.avg_semantic_degree - 3 / 6) < 1e-12
    assert abs(s.semantic_coverage - 5 / 6) < 1e-12
    # components: {0,1,2}, {3,4}, {5} -> 3; largest 3
    assert s.connected_component_count == 3
    assert s.largest_component_size == 3
    # reciprocity: only {0,1}
    assert s.reciprocal_semantic_edge_count == 1
    assert s.documents_with_reciprocal_neighbors == 2
    assert s.reciprocal_community_count == 1
    assert s.largest_reciprocal_community_size == 2
    assert s.reciprocal_singleton_document_count == 4
    assert s.unreciprocated_semantic_edge_count == 2
    assert abs(s.semantic_reciprocity - 1 / 3) < 1e-12
