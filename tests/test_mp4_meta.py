"""MP4/ISO-BMFF container metadata (functions/mp4_meta.py): box walk vs
the structural builder oracle, both mvhd/mdhd versions, Spark pass."""

from __future__ import annotations

import pytest

from yams_spark.functions.mp4_meta import build_mp4, parse_mp4


def test_parse_roundtrip_multitrack() -> None:
    m = parse_mp4(build_mp4(duration_ms=7500, tracks=[
        {"kind": "vide", "codec": "avc1", "width": 1280, "height": 720,
         "duration_ms": 7500},
        {"kind": "soun", "codec": "mp4a", "width": 0, "height": 0,
         "duration_ms": 7400},
    ]))
    assert m["brand"] == "isom" and m["duration_ms"] == 7500
    v, a = m["tracks"]
    assert (v["kind"], v["codec"], v["width"], v["height"]) == (
        "vide", "avc1", 1280, 720)
    assert a["kind"] == "soun" and a["duration_ms"] == 7400


def test_parse_version1_and_timescales() -> None:
    # 64-bit mvhd/mdhd (version 1) and a non-1000 timescale both parse
    m = parse_mp4(build_mp4(duration_ms=3000, use_64bit=True))
    assert m["duration_ms"] == 3000
    m2 = parse_mp4(build_mp4(duration_ms=2500, timescale=90000))
    assert m2["duration_ms"] == 2500


def test_parse_errors() -> None:
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(b"\x00\x00\x00\x08ftyp")
    with pytest.raises(ValueError, match="bounds"):
        parse_mp4(b"\x00\x00\xff\xffmoov")
    good = build_mp4()
    with pytest.raises(ValueError):
        parse_mp4(good[: len(good) // 2])


def test_container_metadata_spark_pass(spark) -> None:
    from yams_spark.operators.multimodal import (
        extract_container_metadata,
        synth_media_table,
    )

    media = synth_media_table(spark, n=24)
    meta = {r["media_id"]: r for r in
            extract_container_metadata(media).collect()}
    vids = [m for m in meta.values() if m["brand"] is not None]
    # every video row parses: 2 tracks, avc1, the synthesized dims
    assert len(vids) == 8  # kinds rotate image/audio/video over 24 rows
    for v in vids:
        assert v["n_tracks"] == 2 and v["video_codec"] == "avc1"
        assert v["width"] >= 320 and v["height"] >= 240
        assert v["duration_ms"] and v["duration_ms"] % 750 == 0
    # image/audio rows yield nulls (not MP4)
    assert any(m["brand"] is None for m in meta.values())
    # pixel decode is still honestly stubbed for video
    from yams_spark.operators.multimodal import extract_media_features

    feats = {r["media_id"]: r for r in
             extract_media_features(media).collect()}
    assert all(not feats[m["media_id"]]["decoded"]
               for m in vids)
