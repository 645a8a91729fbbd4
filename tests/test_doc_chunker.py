"""Embedding-side document chunking: 7 strategies
(reference include/yams/vector/document_chunker.h:19-27)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yams_spark.functions.doc_chunker import (
    STRATEGIES,
    DocChunkingConfig,
    chunk_documents,
    chunk_text,
)

SAMPLE = (
    "# Title\n\nFirst sentence here. Second one follows! A third? Yes.\n\n"
    "## Section two\n\nAnother paragraph with more words in it. "
    "And a closing sentence.\n\nFinal paragraph."
)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_offsets_are_exact(strategy) -> None:
    cfg = DocChunkingConfig(strategy=strategy, target_chunk_size=40,
                            max_chunk_size=80, overlap_size=10)
    chunks = chunk_text(SAMPLE, cfg)
    assert chunks, strategy
    for c in chunks:
        assert c["content"] == SAMPLE[c["start_offset"]:c["end_offset"]]
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


@pytest.mark.parametrize("strategy", ["fixed_size", "sliding_window"])
def test_char_windows_cover_everything(strategy) -> None:
    cfg = DocChunkingConfig(strategy=strategy, target_chunk_size=30, overlap_size=10)
    chunks = chunk_text(SAMPLE, cfg)
    covered = set()
    for c in chunks:
        covered.update(range(c["start_offset"], c["end_offset"]))
    assert covered == set(range(len(SAMPLE)))
    if strategy == "sliding_window":
        # consecutive windows overlap by overlap_size
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_offset"] == a["start_offset"] + 20
    else:
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_offset"] == a["end_offset"]


def test_sentence_and_paragraph_shapes() -> None:
    s = chunk_text(SAMPLE, DocChunkingConfig(strategy="sentence_based",
                                             target_chunk_size=60))
    # sentence packing never splits a sentence: every chunk ends at a
    # sentence boundary (punctuation + optional whitespace) or text end
    for c in s:
        tail = c["content"].rstrip()
        assert tail[-1] in ".!?" or c["end_offset"] == len(SAMPLE)
    p = chunk_text(SAMPLE, DocChunkingConfig(strategy="paragraph_based",
                                             target_chunk_size=60))
    for c in p:
        assert "\n\n" not in c["content"].strip("\n") or len(c["content"]) > 60


def test_markdown_sections_start_at_headings() -> None:
    chunks = chunk_text(SAMPLE, DocChunkingConfig(strategy="markdown_aware",
                                                  target_chunk_size=60))
    starts = {c["start_offset"] for c in chunks}
    assert 0 in starts
    assert SAMPLE.index("## Section two") in starts


def test_recursive_respects_max() -> None:
    text = ("word " * 100).strip()  # no \n\n, no '. ' -> falls through to ' '
    chunks = chunk_text(text, DocChunkingConfig(strategy="recursive",
                                                target_chunk_size=50,
                                                max_chunk_size=80))
    assert all(len(c["content"]) <= 80 for c in chunks)
    assert all(" " not in (text[c["end_offset"]:c["end_offset"] + 1]) or True
               for c in chunks)


def test_semantic_groups_similar_sentences() -> None:
    text = (
        "apple banana cherry fruit salad mix. apple banana cherry fruit bowl mix. "
        "quantum chromodynamics lattice gauge theory. "
        "quantum chromodynamics gauge coupling theory."
    )
    chunks = chunk_text(text, DocChunkingConfig(strategy="semantic",
                                                semantic_threshold=0.3,
                                                max_chunk_size=500))
    # the two fruit sentences group together, the physics ones apart from them
    assert len(chunks) < 4
    assert "apple" in chunks[0]["content"] and "quantum" not in chunks[0]["content"]


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=300),
       st.sampled_from(["fixed_size", "sliding_window", "sentence_based",
                        "paragraph_based", "recursive", "markdown_aware"]))
def test_property_offsets_and_monotonicity(text, strategy) -> None:
    cfg = DocChunkingConfig(strategy=strategy, target_chunk_size=37,
                            max_chunk_size=74, overlap_size=9)
    chunks = chunk_text(text, cfg)
    prev_start = -1
    for c in chunks:
        assert c["content"] == text[c["start_offset"]:c["end_offset"]]
        assert c["start_offset"] > prev_start
        prev_start = c["start_offset"]


def test_chunk_documents_spark(spark) -> None:
    docs = spark.createDataFrame(
        [("h1", SAMPLE), ("h2", "short text."), ("h3", "")],
        "doc_hash string, text string",
    )
    out = chunk_documents(
        docs, DocChunkingConfig(strategy="sentence_based", target_chunk_size=60)
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["document_hash"], []).append(r)
        assert r["chunk_id"] == f"{r['document_hash']}:{r['chunk_index']}"
    assert set(by_doc) == {"h1", "h2"}  # empty doc -> no chunks
    want = chunk_text(SAMPLE, DocChunkingConfig(strategy="sentence_based",
                                                target_chunk_size=60))
    got = sorted(by_doc["h1"], key=lambda r: r["chunk_index"])
    assert [r["content"] for r in got] == [c["content"] for c in want]
