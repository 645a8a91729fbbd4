"""Golden + property tests for the byte-faithful HTML extractor port.

Goldens in goldens_html_extract.json were produced by a standalone build of
the reference algorithm (html_text_extractor.cpp:112-508) and pin text,
title, and meta-description outputs byte-for-byte, covering: malformed /
unterminated script/style/comment blocks, numeric & hex entities at the
0/128 boundaries, std::stoi leading-digit semantics, stray '<'/'>' chars,
CRLF handling, and mixed-case tags.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yams_spark.functions import html_extract as hx

GOLDENS = json.loads((Path(__file__).parent / "goldens_html_extract.json").read_text())


@pytest.mark.parametrize("idx", range(len(GOLDENS)))
def test_goldens(idx: int) -> None:
    row = GOLDENS[idx]
    html = bytes.fromhex(row["html_hex"])
    assert hx.extract_text_from_html(html) == bytes.fromhex(row["text_hex"])
    assert hx.extract_title(html) == bytes.fromhex(row["title_hex"])
    assert hx.extract_meta_description(html) == bytes.fromhex(row["meta_hex"])


def test_empty_and_plain() -> None:
    assert hx.extract_text_from_html(b"") == b""
    assert hx.extract_text_from_html(b"plain") == b"plain"
    assert hx.extract_title(b"no title here") == b""
    assert hx.extract_meta_description(b"<p>x</p>") == b""


def test_block_tags_newlines() -> None:
    # each block tag (open or close) emits one '\n'; runs cap at 2
    assert hx.extract_text_from_html(b"<p>a</p><p>b</p>") == b"a\n\nb"
    assert hx.extract_text_from_html(b"<div>a</div><div></div><div>b</div>") == b"a\n\nb"
    assert hx.extract_text_from_html(b"a<br>b") == b"a\nb"
    # inline tags don't break lines
    assert hx.extract_text_from_html(b"a<span>b</span>c") == b"abc"


def test_entities() -> None:
    assert hx.extract_text_from_html(b"&amp;&lt;&gt;") == b"&<>"
    assert hx.extract_text_from_html(b"&#65;&#x42;") == b"AB"
    # out-of-range codes stay literal
    assert hx.extract_text_from_html(b"&#200;") == b"&#200;"
    assert hx.extract_text_from_html(b"&#0;") == b"&#0;"
    # stoi leading-digit semantics: &#66x; -> 'B'
    assert hx.extract_text_from_html(b"&#66x;") == b"B"
    assert hx.extract_text_from_html(b"&copy;") == "©".encode()


def test_script_style_comment_removal() -> None:
    assert (
        hx.extract_text_from_html(b"a<script>var x = '<p>hi</p>';</script>b") == b"ab"
    )
    assert hx.extract_text_from_html(b"a<STYLE>p{}</Style>b") == b"ab"
    assert hx.extract_text_from_html(b"a<!-- <p>z</p> -->b") == b"ab"
    # unterminated script: only the '<' is skipped; the rest flows through
    # tag stripping ('>' chars dropped) — matches the C++ oracle
    assert hx.extract_text_from_html(b"a<script>xx") == b"ascriptxx"


def test_large_html_fallback_path() -> None:
    # >5MB: block tags are NOT converted and entities NOT decoded
    body = b"<p>x &amp; y</p>" + b"z" * (hx.MAX_REGEX_SIZE + 1)
    out = hx.extract_text_from_html(body)
    assert out.startswith(b"x &amp; y")  # entities kept on fallback path
    assert b"\n" not in out[:10]  # no block-tag newline


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_clean_whitespace_fast_equals_reference(data: bytes) -> None:
    assert hx.clean_whitespace(data) == hx.clean_whitespace_reference(data)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                b"<p>", b"</p>", b"<br/>", b"a b", b"&amp;", b"&#65;", b"&#x41;",
                b"<script>x</script>", b"<!--c-->", b"\r\n", b"  ", b"<", b">",
                b"<title>t</title>", b"\xc3\xa9", b"&#999;",
            ]
        ),
        max_size=25,
    )
)
def test_extract_is_deterministic(parts: list[bytes]) -> None:
    html = b"".join(parts)
    assert hx.extract_text_from_html(html) == hx.extract_text_from_html(html)
