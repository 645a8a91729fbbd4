"""Archive codecs (archive_content_handler.cpp tier) — cross-checked
both directions against the independent stdlib implementations
(zipfile / tarfile / gzip)."""

from __future__ import annotations

import gzip as gzip_mod
import io
import tarfile
import zipfile
import zlib

import pytest

from yams_spark.functions.archive_codecs import (
    ArchiveError,
    analyze_archive,
    build_gzip,
    build_tar,
    build_zip,
    extract_gzip,
    extract_tar_member,
    extract_zip_member,
    parse_gzip,
    parse_tar,
    parse_zip,
)

_MEMBERS = [
    ("docs/readme.txt", b"hello archive world " * 20),
    ("docs/", b""),
    ("data.bin", bytes(range(256)) * 8),
    ("empéty.md", b""),
]
_FILES = [(n, d) for n, d in _MEMBERS if not n.endswith("/")]


def _stdlib_zip(method=zipfile.ZIP_DEFLATED) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as z:
        for name, data in _MEMBERS:
            z.writestr(name, data)
    return buf.getvalue()


def test_parse_zip_of_stdlib_archive():
    blob = _stdlib_zip()
    meta = parse_zip(blob)
    assert meta["format"] == "ZIP"
    assert meta["total_files"] == 3
    assert meta["total_directories"] == 1
    assert not meta["is_encrypted"]
    assert meta["compression_method"] in ("Deflate", "Mixed")
    names = [e["name"] for e in meta["entries"]]
    assert names == [n for n, _ in _MEMBERS]
    for name, data in _FILES:
        e = next(x for x in meta["entries"] if x["name"] == name)
        assert e["uncompressed_size"] == len(data)
        assert e["crc32"] == (zlib.crc32(data) & 0xFFFFFFFF)
        assert extract_zip_member(blob, name) == data


def test_stdlib_parses_our_zip():
    for method in (0, 8):
        blob = build_zip(_FILES, method=method, comment=b"yams")
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            assert z.comment == b"yams"
            assert z.namelist() == [n for n, _ in _FILES]
            for name, data in _FILES:
                assert z.read(name) == data
            assert z.testzip() is None
        meta = parse_zip(blob)
        assert meta["compression_method"] == (
            "Deflate" if method == 8 else "Store"
        )
        assert meta["comment"] == "yams"
        for name, data in _FILES:
            assert extract_zip_member(blob, name) == data


def test_zip_errors():
    with pytest.raises(ArchiveError, match="end-of-central"):
        parse_zip(b"PK\x03\x04" + b"\0" * 60)
    blob = build_zip(_FILES)
    with pytest.raises(ArchiveError, match="no member"):
        extract_zip_member(blob, "missing")
    # corrupt a payload byte -> CRC mismatch
    bad = bytearray(build_zip([("a.txt", b"payload bytes here")], method=0))
    idx = bad.find(b"payload")
    bad[idx] ^= 0xFF
    with pytest.raises(ArchiveError, match="CRC"):
        extract_zip_member(bytes(bad), "a.txt")


def test_tar_roundtrip_both_directions():
    blob = build_tar(_FILES)
    with tarfile.open(fileobj=io.BytesIO(blob)) as t:
        assert t.getnames() == [n for n, _ in _FILES]
        for name, data in _FILES:
            assert t.extractfile(name).read() == data
    meta = parse_tar(blob)
    assert meta["total_files"] == 3 and meta["total_directories"] == 0
    # stdlib-built tar (ustar format, incl. a directory) parses back
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in _MEMBERS:
            info = tarfile.TarInfo(name.rstrip("/"))
            if name.endswith("/"):
                info.type = tarfile.DIRTYPE
            else:
                info.size = len(data)
            t.addfile(info, io.BytesIO(data) if data else None)
    blob2 = buf.getvalue()
    meta2 = parse_tar(blob2)
    assert meta2["total_files"] == 3 and meta2["total_directories"] == 1
    for name, data in _FILES:
        assert extract_tar_member(blob2, name.rstrip("/")) == data
    # checksum validation fires on corruption
    bad = bytearray(blob)
    bad[0] ^= 0x01
    with pytest.raises(ArchiveError, match="checksum"):
        parse_tar(bytes(bad))


def test_gzip_roundtrip_both_directions():
    payload = b"gzip payload " * 100
    ours = build_gzip(payload, name="body.txt", mtime=1_600_000_000)
    assert gzip_mod.decompress(ours) == payload
    with gzip_mod.GzipFile(fileobj=io.BytesIO(ours)) as g:
        assert g.read() == payload
    meta = parse_gzip(ours)
    assert meta["entries"][0]["name"] == "body.txt"
    assert meta["entries"][0]["mtime"] == 1_600_000_000
    assert meta["uncompressed_size"] == len(payload)
    theirs = gzip_mod.compress(payload, mtime=123)
    assert extract_gzip(theirs) == payload
    meta2 = parse_gzip(theirs)
    assert meta2["entries"][0]["mtime"] == 123
    with pytest.raises(ArchiveError, match="magic"):
        parse_gzip(b"\x1f\x8c" + b"\0" * 20)


def test_spark_archive_listing_and_members(spark):
    from yams_spark.operators.multimodal import (
        explode_archive_members,
        extract_archive_listing,
        synth_archive_table,
    )

    media = synth_archive_table(spark, n=15)
    listing = {
        r["media_id"]: r.asDict()
        for r in extract_archive_listing(media).collect()
    }
    assert len(listing) == 15
    # fam 0: zip deflate with 1 member (i=0)
    assert listing["a0000"]["format"] == "ZIP"
    assert listing["a0000"]["total_files"] == 1
    assert listing["a0000"]["compression_method"] == "Deflate"
    assert listing["a0001"]["compression_method"] == "Store"
    assert listing["a0002"]["format"] == "TAR"
    assert listing["a0003"]["format"] == "GZIP"
    assert listing["a0004"]["format"] == "RAR"
    members = explode_archive_members(media).collect()
    by_media = {}
    for r in members:
        by_media.setdefault(r["media_id"], []).append(r)
    # RAR rows produce no members; zip i=0 has 1, i=5 has 3 (5%3+1=3)
    assert "a0004" not in by_media
    assert len(by_media["a0000"]) == 1
    assert len(by_media["a0005"]) == 3
    row = by_media["a0000"][0]
    assert row["member_name"] == "docs/file_0_0.txt"
    assert bytes(row["member_bytes"]) == b"member 0/0 body " * 3
    # gzip member names survive
    g = by_media["a0003"][0]
    assert g["member_name"] == "docs/file_3_0.txt"


def test_analyze_archive_dispatch():
    assert analyze_archive(build_zip(_FILES))["format"] == "ZIP"
    assert analyze_archive(build_tar(_FILES))["format"] == "TAR"
    assert analyze_archive(build_gzip(b"x" * 100))["format"] == "GZIP"
    rar = analyze_archive(b"Rar!\x1a\x07\x00\x05" + b"\0" * 32)
    assert rar["format"] == "RAR" and rar["format_version"] == "5"
    assert analyze_archive(b"not an archive at all") is None
    # empty zip: EOCD only
    empty = build_zip([])
    assert analyze_archive(empty)["total_files"] == 0
