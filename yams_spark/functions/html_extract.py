"""Byte-faithful re-implementation of the reference HTML text extractor.

Semantics mirror ``/root/reference/src/extraction/html_text_extractor.cpp``
(lines 112-508) exactly, operating on raw bytes:

1. ``remove_script_and_style`` (:165-214) — strip <script>/<style> blocks
   (case-insensitive) and <!-- --> comments; malformed (unterminated) blocks
   skip only the '<'.
2. ``convert_block_tags_to_newlines`` (:216-273) — every tag is removed; block
   tags (open or close) additionally emit a single '\n'.
3. ``strip_html_tags`` (:275-289) — '<'..'>' state machine; stray '>' chars
   are dropped; an unterminated '<' drops the rest of the input.
4. ``decode_html_entities`` (:291-371) — 18 named entities, decimal
   ``&#d;`` and hex ``&#xH;`` only for 0<code<128, C++ ``std::stoi``
   leading-digits semantics, out-of-int-range -> keep as-is.
5. ``clean_whitespace`` (:373-416) — collapse space runs to one space, at
   most 2 consecutive newlines ('\r' counts as a newline), trim.

HTML larger than 5 MiB takes the fallback path (:119-130): steps 1, 3, 5
only.  All functions take and return ``bytes`` so the invariant "byte-
identical extracted text per url" is well-defined.
"""

from __future__ import annotations

import re

MAX_REGEX_SIZE = 5 * 1024 * 1024  # html_text_extractor.cpp:119

# html_text_extractor.cpp:222-225
_BLOCK_TAGS = frozenset(
    b"p div h1 h2 h3 h4 h5 h6 ul ol li blockquote pre hr table tr td th "
    b"section article header footer nav aside main br".split()
)

# html_text_extractor.cpp:296-301 (source file is UTF-8; multi-byte
# replacements are the literal UTF-8 bytes).
_ENTITIES: list[tuple[bytes, bytes]] = [
    (b"&amp;", b"&"),
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&apos;", b"'"),
    (b"&#39;", b"'"),
    (b"&nbsp;", b" "),
    (b"&ndash;", b"-"),
    (b"&mdash;", b"--"),
    (b"&copy;", "©".encode("utf-8")),
    (b"&reg;", "®".encode("utf-8")),
    (b"&trade;", "™".encode("utf-8")),
    (b"&hellip;", b"..."),
    (b"&bull;", "•".encode("utf-8")),
    (b"&ldquo;", b'"'),
    (b"&rdquo;", b'"'),
    (b"&lsquo;", b"'"),
    (b"&rsquo;", b"'"),
]

_DIGITS = frozenset(b"0123456789")
_XDIGITS = frozenset(b"0123456789abcdefABCDEF")
_DEC_RE = re.compile(rb"\d+")
_HEX_RE = re.compile(rb"(?:0[xX])?[0-9a-fA-F]+")
_INT_MAX = 2**31 - 1

# first-of " \t\n\r/" terminates a tag name (html_text_extractor.cpp:253)
_TAG_NAME_END = frozenset(b" \t\n\r/")
# C-locale isspace minus '\n'/'\r' (handled separately), bytes >= 0x80 are
# never space (cleanWhitespace html_text_extractor.cpp:395 uses std::isspace)
_SPACE_NOT_NL = frozenset(b" \t\x0b\x0c")

_WS_RUN_RE = re.compile(rb"[ \t\x0b\x0c\r\n]+")


def remove_script_and_style(html: bytes) -> bytes:
    """html_text_extractor.cpp:165-214."""
    hl = html.lower()  # ASCII-only lower, same as std::tolower per byte
    out = bytearray()
    n = len(html)
    last_pos = 0
    # Memoized forward-only finds (same results as re-searching from
    # last_pos each iteration, without the O(n^2) rescan of absent needles).
    memo = {b"<script": -2, b"<style": -2, b"<!--": -2}

    def _find(hay: bytes, needle: bytes) -> int:
        cached = memo[needle]
        if cached == -1 or cached >= last_pos:
            return cached
        found = hay.find(needle, last_pos)
        memo[needle] = found
        return found

    while last_pos < n:
        script_start = _find(hl, b"<script")
        style_start = _find(hl, b"<style")
        comment_start = _find(html, b"<!--")

        candidates = [p for p in (script_start, style_start, comment_start) if p != -1]
        if not candidates:
            out += html[last_pos:]
            break
        next_block = min(candidates)
        out += html[last_pos:next_block]

        if next_block == script_start:
            end_tag = hl.find(b"</script>", next_block)
            last_pos = next_block + 1 if end_tag == -1 else end_tag + 9
        elif next_block == style_start:
            end_tag = hl.find(b"</style>", next_block)
            last_pos = next_block + 1 if end_tag == -1 else end_tag + 8
        else:  # comment
            end_tag = html.find(b"-->", next_block)
            last_pos = next_block + 1 if end_tag == -1 else end_tag + 3
    return bytes(out)


def convert_block_tags_to_newlines(html: bytes) -> bytes:
    """html_text_extractor.cpp:216-273 — removes every tag, block tags -> \\n."""
    out = bytearray()
    n = len(html)
    pos = 0
    while pos < n:
        lt = html.find(b"<", pos)
        if lt == -1:
            out += html[pos:]
            break
        out += html[pos:lt]
        tag_end = html.find(b">", lt)
        if tag_end == -1:
            # No closing '>': C++ emits the '<' and advances one char; the
            # remainder contains no '>' so every later '<' does the same and
            # intermediate chars are copied verbatim.
            out += b"<"
            pos = lt + 1
            continue
        tag_content = html[lt + 1 : tag_end]
        if tag_content[:1] == b"/":
            tag_content = tag_content[1:]
        end = len(tag_content)
        for i, b in enumerate(tag_content):
            if b in _TAG_NAME_END:
                end = i
                break
        if tag_content[:end].lower() in _BLOCK_TAGS:
            out += b"\n"
        pos = tag_end + 1
    return bytes(out)


def strip_html_tags(html: bytes) -> bytes:
    """html_text_extractor.cpp:275-289 — in_tag state machine."""
    out = bytearray()
    n = len(html)
    pos = 0
    while pos < n:
        lt = html.find(b"<", pos)
        if lt == -1:
            out += html[pos:].replace(b">", b"")
            break
        out += html[pos:lt].replace(b">", b"")
        gt = html.find(b">", lt)
        if gt == -1:
            break  # in_tag stays true to the end: rest is dropped
        pos = gt + 1
    return bytes(out)


def _stoi_dec(num: bytes) -> int | None:
    """C++ std::stoi: parse leading digits (first char guaranteed a digit)."""
    m = _DEC_RE.match(num)
    if m is None:
        return None
    value = int(m.group())
    if value > _INT_MAX:
        return None  # stoi throws out_of_range -> caller keeps '&' as-is
    return value


def _stoi_hex(num: bytes) -> int | None:
    """C++ std::stoi(base=16): optional 0x/0X prefix then leading hex digits."""
    m = _HEX_RE.match(num)
    if m is None:
        return None
    value = int(m.group(), 16)
    if value > _INT_MAX:
        return None
    return value


def decode_html_entities(text: bytes) -> bytes:
    """html_text_extractor.cpp:291-371."""
    out = bytearray()
    n = len(text)
    pos = 0
    while pos < n:
        amp = text.find(b"&", pos)
        if amp == -1:
            out += text[pos:]
            break
        out += text[pos:amp]
        pos = amp

        decoded = False
        for entity, replacement in _ENTITIES:
            if text.startswith(entity, pos):
                out += replacement
                pos += len(entity)
                decoded = True
                break
        if decoded:
            continue

        # decimal entity &#123; (:329-344)
        if pos + 2 < n and text[pos + 1] == 0x23 and text[pos + 2] in _DIGITS:
            end = text.find(b";", pos + 2)
            if end != -1 and end - pos < 10:
                code = _stoi_dec(text[pos + 2 : end])
                if code is not None and 0 < code < 128:
                    out.append(code)
                    pos = end + 1
                    continue

        # hex entity &#x1A; (:347-363)
        if (
            pos + 3 < n
            and text[pos + 1] == 0x23
            and text[pos + 2] in (0x78, 0x58)  # x / X
            and text[pos + 3] in _XDIGITS
        ):
            end = text.find(b";", pos + 3)
            if end != -1 and end - pos < 12:
                code = _stoi_hex(text[pos + 3 : end])
                if code is not None and 0 < code < 128:
                    out.append(code)
                    pos = end + 1
                    continue

        out += b"&"
        pos += 1
    return bytes(out)


def _ws_run_repl(m: re.Match[bytes]) -> bytes:
    run = m.group()
    n_newlines = run.count(b"\n") + run.count(b"\r")
    if n_newlines == 0:
        return b" "
    lead = b" " if run[0] in _SPACE_NOT_NL else b""
    return lead + b"\n" * min(2, n_newlines)


def clean_whitespace(text: bytes) -> bytes:
    """html_text_extractor.cpp:373-416 (regex-vectorized; see the pure
    state-machine twin ``clean_whitespace_reference`` used in tests)."""
    collapsed = _WS_RUN_RE.sub(_ws_run_repl, text)
    return collapsed.strip(b" \n\r\t")


def clean_whitespace_reference(text: bytes) -> bytes:
    """Literal per-byte port of the C++ state machine, for equivalence tests."""
    out = bytearray()
    last_was_space = False
    last_was_newline = False
    consecutive_newlines = 0
    for c in text:
        if c in (0x0A, 0x0D):
            if not last_was_newline:
                consecutive_newlines = 1
                last_was_newline = True
                last_was_space = False
            else:
                consecutive_newlines += 1
            if consecutive_newlines <= 2:
                out.append(0x0A)
        elif c in _SPACE_NOT_NL:
            if not last_was_space and not last_was_newline:
                out.append(0x20)
                last_was_space = True
        else:
            out.append(c)
            last_was_space = False
            last_was_newline = False
            consecutive_newlines = 0
    return bytes(out).strip(b" \n\r\t")


def extract_text_from_html(html: bytes) -> bytes:
    """html_text_extractor.cpp:112-150 (incl. the >5MB fallback :119-130)."""
    if not html:
        return b""
    if len(html) > MAX_REGEX_SIZE:
        text = remove_script_and_style(html)
        text = strip_html_tags(text)
        return clean_whitespace(text)
    text = remove_script_and_style(html)
    text = convert_block_tags_to_newlines(text)
    text = strip_html_tags(text)
    text = decode_html_entities(text)
    return clean_whitespace(text)


def extract_title(html: bytes) -> bytes:
    """html_text_extractor.cpp:418-447."""
    hl = html.lower()
    title_start = hl.find(b"<title")
    if title_start == -1:
        return b""
    content_start = html.find(b">", title_start)
    if content_start == -1:
        return b""
    content_start += 1
    content_end = hl.find(b"</title>", content_start)
    if content_end == -1:
        return b""
    title = html[content_start:content_end]
    title = strip_html_tags(title)
    title = decode_html_entities(title)
    return clean_whitespace(title)


def extract_meta_description(html: bytes) -> bytes:
    """html_text_extractor.cpp:449-508."""
    hl = html.lower()
    n = len(html)
    pos = 0
    while pos < n:
        meta_start = hl.find(b"<meta", pos)
        if meta_start == -1:
            break
        meta_end = html.find(b">", meta_start)
        if meta_end == -1:
            break
        meta_tag = html[meta_start : meta_end + 1]
        meta_lower = meta_tag.lower()
        is_description = (
            b'name="description"' in meta_lower
            or b"name='description'" in meta_lower
            or b'property="og:description"' in meta_lower
            or b"property='og:description'" in meta_lower
        )
        if is_description:
            content_pos = meta_lower.find(b"content=")
            if content_pos != -1:
                content_pos += 8
                m = len(meta_tag)
                # std::isspace over the tag bytes (C locale)
                while content_pos < m and meta_tag[content_pos] in b" \t\n\r\x0b\x0c":
                    content_pos += 1
                if content_pos < m:
                    quote = meta_tag[content_pos : content_pos + 1]
                    if quote in (b'"', b"'"):
                        content_pos += 1
                        end_quote = meta_tag.find(quote, content_pos)
                        if end_quote != -1:
                            return decode_html_entities(
                                meta_tag[content_pos:end_quote]
                            )
        pos = meta_end + 1
    return b""
