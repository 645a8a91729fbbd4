"""Grep / content-scan with the reference's literal-prefilter cascade, and
FTS-style snippet generation.

* ``grep_scan`` — the two-phase "ripgrep strategy" of
  ``reference src/app/services/grep_service.cpp:412-446``: extract the
  longest literal run from the regex (LiteralExtractor); if it is >= 3
  chars, a cheap substring prefilter (Boyer-Moore-Horspool in the
  reference; ``F.contains`` → a Tungsten substring scan here) drops
  non-candidate rows *before* the full regex ever runs. On 100 TB the
  cascade is the difference between a regex over every byte and a regex
  over the (typically tiny) literal-hit subset — and both phases stay in
  whole-stage codegen, no Python.
* ``grep_lines`` — per-line matches with line numbers (the CLI surface
  shape: file/line/text), via posexplode over split lines.
* ``snippet_expr`` / ``with_snippets`` — the FTS5
  ``snippet(documents_fts, 0, '<b>', '</b>', '...', 16)`` analog
  (``reference src/metadata/repository/search_ops.cpp:191``): a 16-token
  window centered on the first matching query term, matched tokens wrapped
  in <b>..</b>. Pure Catalyst array ops — reproducible in DuckDB SQL for
  the oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the reference enables the BMH prefilter at literal length >= 3
#: (grep_service.cpp:422)
MIN_LITERAL_LENGTH = 3

_META = set("\\^$.|?*+()[]{}")


def extract_literal(pattern: str) -> str:
    """Longest guaranteed-literal run in a regex (LiteralExtractor.extract):
    runs are broken by metacharacters, and a char followed by ?, * or {
    is excluded (it may not occur in a match)."""
    runs: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 2] if i + 2 < n else ""
            if pattern[i + 1].isalnum():
                # \d \w \s \b \B \1 ... are regex classes/anchors, NOT the
                # literal letter: flush the run (literal_extractor.cpp:44-58;
                # appending the class letter would prefilter on a substring
                # that never occurs in real matches)
                runs.append("".join(cur))
                cur = []
            elif nxt in "?*{":
                # escaped punctuation that is itself quantified (\.?) may
                # not occur in a match
                runs.append("".join(cur))
                cur = []
            else:
                cur.append(pattern[i + 1])  # escaped literal: \. \* ...
            i += 2
            continue
        if c in _META:
            if c in "?*{" and cur:
                cur.pop()  # previous char is optional/repeated
            runs.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    runs.append("".join(cur))
    return max(runs, key=len) if runs else ""


def grep_scan(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    literal_text: bool = False,
) -> DataFrame:
    """Per-document match counts for ``pattern``, two-phase.

    Returns (id, n_matches) for documents with >= 1 match. Phase 1 is the
    literal substring prefilter (skipped if no literal >= 3 chars can be
    extracted, exactly like the reference); phase 2 runs the real regex
    only on prefilter survivors. ``literal_text=True`` treats the pattern
    as a verbatim string (grep -F).
    """
    if literal_text:
        literal = pattern
        regex = re.escape(pattern)
    else:
        literal = extract_literal(pattern)
        regex = pattern
    out = docs
    if len(literal) >= MIN_LITERAL_LENGTH:
        out = out.where(F.contains(F.col(text_col), F.lit(literal)))
    return (
        out.select(
            F.col(id_col),
            F.regexp_count(F.col(text_col), F.lit(regex)).alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
    )


def grep_lines(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level grep: (id, line_no, line) for matching lines — the CLI
    output shape. Same literal cascade before the per-line regex."""
    literal = extract_literal(pattern)
    out = docs
    if len(literal) >= MIN_LITERAL_LENGTH:
        out = out.where(F.contains(F.col(text_col), F.lit(literal)))
    lines = out.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    return lines.where(F.col("line").rlike(pattern)).select(
        F.col(id_col), (F.col("idx") + 1).alias("line_no"), "line"
    )


def snippet_expr(
    tokens_col: Column | str,
    term: str,
    window: int = 16,
    open_tag: str = "<b>",
    close_tag: str = "</b>",
    ellipsis: str = "...",
) -> Column:
    """FTS5-style ``snippet(fts, col, '<b>', '</b>', '...', 16)`` over a
    tokenized column: ``window`` tokens starting at most window/2-1 before
    the first occurrence of ``term``, occurrences wrapped in tags, joined
    by ' ', with the ellipsis affixed on whichever side the window clips
    (exactly the FTS5 contract, search_ops.cpp:191). NULL when absent."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    pos = F.array_position(toks, term)  # 1-based, 0 if absent
    start = F.greatest(pos - (window // 2 - 1), F.lit(1))
    snip = F.slice(toks, start, window)
    marked = F.transform(
        snip,
        lambda t: F.when(
            t == term, F.concat(F.lit(open_tag), t, F.lit(close_tag))
        ).otherwise(t),
    )
    body = F.concat_ws(" ", marked)
    pre = F.when(start > 1, F.lit(ellipsis)).otherwise(F.lit(""))
    post = F.when(
        start + window - 1 < F.size(toks), F.lit(ellipsis)
    ).otherwise(F.lit(""))
    return F.when(pos > 0, F.concat(pre, body, post))


def with_snippets(
    docs: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
) -> DataFrame:
    """(id, snippet) for documents containing ``term`` after tokenize-lower
    (the search-result decoration column, search_ops.cpp:191)."""
    toks = F.expr(
        f"filter(split(lower(regexp_replace({text_col}, '[^0-9a-zA-Z]+', ' ')), ' '), "
        "x -> x <> '')"
    )
    out = docs.select(F.col(id_col), snippet_expr(toks, term, window).alias("snippet"))
    return out.where(F.col("snippet").isNotNull())
