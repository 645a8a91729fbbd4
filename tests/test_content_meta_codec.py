"""Content-metadata wire codec (content_metadata.cpp) — round-trips,
unknown-field skipping, version gate, corruption. Scalar only."""

from __future__ import annotations

import struct

from yams_spark.functions.content_meta_codec import (
    content_metadata_is_valid,
    content_name_extension,
    decode_content_metadata,
    encode_content_metadata,
)

_META = {
    "id": "doc-123",
    "name": "report.html",
    "mimeType": "text/html",
    "contentHash": "ab" * 32,
    "size": 4096,
    "createdAt": 1_700_000_000_000,
    "modifiedAt": 1_700_000_100_000,
    "accessedAt": 1_700_000_200_000,
    "tags": {"project": "x", "lang": "en"},
}


def test_roundtrip():
    blob = encode_content_metadata(_META)
    back = decode_content_metadata(blob)
    assert back == _META
    assert content_metadata_is_valid(back)


def test_unknown_fields_skipped():
    blob = bytearray(encode_content_metadata(_META))
    # bump field count and append an unknown String + StringVector +
    # StringMap field — the reader must skip all three by type
    n = struct.unpack_from("<I", blob, 4)[0]
    struct.pack_into("<I", blob, 4, n + 3)
    extra = struct.pack("<BH", 0, 6) + b"mystry" + struct.pack("<I", 3) + b"abc"
    extra += struct.pack("<BH", 3, 4) + b"vect" + struct.pack("<I", 2)
    extra += struct.pack("<I", 1) + b"p" + struct.pack("<I", 1) + b"q"
    extra += struct.pack("<BH", 4, 4) + b"mapp" + struct.pack("<I", 1)
    extra += struct.pack("<I", 1) + b"k" + struct.pack("<I", 1) + b"v"
    back = decode_content_metadata(bytes(blob) + extra)
    assert back == _META


def test_gates_and_corruption():
    blob = encode_content_metadata(_META)
    # version gate
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 0, 2)
    assert decode_content_metadata(bytes(bad)) is None
    # truncation
    assert decode_content_metadata(blob[:-3]) is None
    # unknown field TYPE is corruption (stated hardening over the C++
    # fall-through, whose subsequent parse is undefined)
    n = struct.unpack_from("<I", blob, 4)[0]
    hdr = bytearray(blob)
    struct.pack_into("<I", hdr, 4, n + 1)
    assert decode_content_metadata(
        bytes(hdr) + struct.pack("<BH", 9, 1) + b"z"
    ) is None
    # isValid gates
    assert not content_metadata_is_valid({**_META, "id": ""})
    assert not content_metadata_is_valid({**_META, "size": 0})


def test_extension_rule():
    assert content_name_extension("report.HTML") == ".HTML"
    assert content_name_extension("archive.tar.gz") == ".gz"
    assert content_name_extension(".hidden") == ""
    assert content_name_extension("noext") == ""
