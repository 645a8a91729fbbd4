"""Tree snapshots with Merkle roots (operators/snapshots.py) vs a plain-
Python reference of the tree_builder.cpp hashing semantics."""

from __future__ import annotations

import hashlib

from yams_spark.operators.snapshots import (
    DIR_MODE,
    FILE_MODE,
    merkle_tree,
    tree_diff_summary,
    tree_snapshot,
)


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _node(entries: list[tuple[str, str, str]]) -> str:
    """entries: (mode, name, hash) — sorted by name, line-serialized."""
    lines = [f"{m} {n}\t{h}" for m, n, h in sorted(entries, key=lambda e: e[1])]
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


FILES = [
    ("/a/x.txt", _h("x")),
    ("/a/y.txt", _h("y")),
    ("/b/z.txt", _h("z")),
    ("/top.txt", _h("t")),
]


def test_merkle_tree_hand_computed(spark) -> None:
    files = spark.createDataFrame(FILES, "path string, file_hash string")
    got = {r["path"]: (r["node_hash"], r["n_entries"]) for r in merkle_tree(files).collect()}

    a = _node([(FILE_MODE, "x.txt", _h("x")), (FILE_MODE, "y.txt", _h("y"))])
    b = _node([(FILE_MODE, "z.txt", _h("z"))])
    root = _node(
        [(DIR_MODE, "a", a), (DIR_MODE, "b", b), (FILE_MODE, "top.txt", _h("t"))]
    )
    assert got["/a"] == (a, 2)
    assert got["/b"] == (b, 1)
    assert got[""] == (root, 3)

    # Merkle property: changing one leaf changes exactly its ancestor chain
    files2 = spark.createDataFrame(
        [("/a/x.txt", _h("CHANGED"))] + FILES[1:], "path string, file_hash string"
    )
    got2 = {r["path"]: r["node_hash"] for r in merkle_tree(files2).collect()}
    assert got2["/a"] != a and got2[""] != root
    assert got2["/b"] == b


def test_tree_snapshot_row(spark) -> None:
    files = spark.createDataFrame(FILES, "path string, file_hash string")
    row = tree_snapshot(files, "2024-01-01T00:00:00Z", "/", "label1").collect()[0]
    assert row["snapshot_id"] == "2024-01-01T00:00:00Z"
    assert row["files_count"] == 4
    assert row["snapshot_label"] == "label1"
    assert row["tree_root_hash"] == {
        r["path"]: r["node_hash"] for r in merkle_tree(files).collect()
    }[""]


def test_tree_diff_summary_hand_computed(spark) -> None:
    base = spark.createDataFrame(
        [("/a/1", "h1"), ("/a/2", "h2"), ("/a/3", "h3"), ("/a/4", "h4")],
        "path string, file_hash string",
    )
    target = spark.createDataFrame(
        [
            ("/a/1", "h1"),      # unchanged
            ("/a/2", "hX"),      # modified
            ("/b/3", "h3"),      # renamed (deleted /a/3 + added /b/3, same hash)
            ("/a/5", "h5"),      # added
        ],
        "path string, file_hash string",
    )
    row = tree_diff_summary(base, target).collect()[0]
    assert (
        row["files_added"], row["files_deleted"], row["files_modified"],
        row["files_renamed"], row["files_unchanged"],
    ) == (1, 1, 1, 1, 1)
    # no-rename case: empty inner join still yields the zero row
    row2 = tree_diff_summary(base, base).collect()[0]
    assert row2["files_renamed"] == 0 and row2["files_unchanged"] == 4
