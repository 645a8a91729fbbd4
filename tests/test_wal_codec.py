"""WAL record codec (wal_entry.cpp) — round-trips, validity gates,
corruption, stream walk, payload codecs. No Spark session needed (the
scalar codec is the wire-format surface)."""

from __future__ import annotations

import struct
import zlib

from yams_spark.streaming.wal_codec import (
    WAL_HEADER_SIZE,
    WAL_MAGIC,
    decode_delete_block,
    decode_store_block,
    decode_update_reference,
    decode_wal_entry,
    decode_wal_stream,
    encode_delete_block,
    encode_store_block,
    encode_update_reference,
    encode_wal_entry,
)


def test_roundtrip_and_layout():
    payload = encode_store_block("a" * 64, 4096, 3)
    blob = encode_wal_entry(
        "StoreBlock", sequence_num=7, transaction_id=99,
        payload=payload, timestamp=1_700_000_000_000_000,
    )
    assert len(blob) == WAL_HEADER_SIZE + 40
    assert blob[:4] == b"1LAW"  # 0x57414C31 little-endian
    e = decode_wal_entry(blob)
    assert e is not None
    assert (e["op"], e["sequence_num"], e["transaction_id"]) == (
        "StoreBlock", 7, 99,
    )
    assert e["timestamp"] == 1_700_000_000_000_000
    sb = decode_store_block(e["data"])
    # char[32] truncates the 64-char hex digest to its first 32 chars
    assert sb == {"hash": "a" * 32, "size": 4096, "ref_count": 3}
    # checksum is the zlib CRC over zero-checksum header + data
    zeroed = bytearray(blob)
    zeroed[40:44] = b"\0\0\0\0"
    assert e["checksum"] == (zlib.crc32(bytes(zeroed)) & 0xFFFFFFFF)


def test_validity_gates():
    good = encode_wal_entry("Checkpoint", sequence_num=1)
    assert decode_wal_entry(good) is not None
    assert decode_wal_entry(good[:-1] if len(good) > 48 else good[:47]) is None
    # zero sequence invalid (wal_entry.h:61-62)
    assert decode_wal_entry(encode_wal_entry(8, sequence_num=0)) is None
    # unknown op
    bad_op = bytearray(encode_wal_entry(8, sequence_num=1))
    bad_op[32] = 9
    assert decode_wal_entry(bytes(bad_op)) is None
    # version 2 accepted (dual-read), 3 rejected
    assert decode_wal_entry(
        encode_wal_entry(8, sequence_num=1, version=2)
    ) is not None
    assert decode_wal_entry(
        encode_wal_entry(8, sequence_num=1, version=3)
    ) is None
    # corrupt payload byte -> checksum mismatch
    blob = bytearray(
        encode_wal_entry("DeleteBlock", 5, payload=encode_delete_block("h1"))
    )
    blob[WAL_HEADER_SIZE] ^= 0xFF
    assert decode_wal_entry(bytes(blob)) is None


def test_stream_walk_stops_at_torn_tail():
    entries = [
        encode_wal_entry("BeginTransaction", 1, 10),
        encode_wal_entry(
            "StoreBlock", 2, 10, payload=encode_store_block("h", 10)
        ),
        encode_wal_entry("CommitTransaction", 3, 10),
    ]
    stream = b"".join(entries)
    out = decode_wal_stream(stream)
    assert [e["op"] for e in out] == [
        "BeginTransaction", "StoreBlock", "CommitTransaction",
    ]
    # torn tail: half an entry appended -> walk stops after 3
    out = decode_wal_stream(stream + entries[0][:20])
    assert len(out) == 3
    # corruption mid-stream ends the walk there
    broken = bytearray(stream)
    broken[len(entries[0]) + 50] ^= 0x01
    assert len(decode_wal_stream(bytes(broken))) == 1


def test_payload_codecs():
    assert decode_delete_block(encode_delete_block("short")) == {
        "hash": "short"
    }
    assert decode_update_reference(encode_update_reference("h", -3)) == {
        "hash": "h", "delta": -3,
    }
    assert decode_update_reference(encode_update_reference("h", 7))[
        "delta"
    ] == 7
    assert decode_store_block(b"short") is None
    # struct sizes match the C layouts (40 / 32 / 36)
    assert len(encode_store_block("h", 1, 1)) == 40
    assert len(encode_delete_block("h")) == 32
    assert len(encode_update_reference("h", 1)) == 36


def test_metadata_transaction_checkpoint_payloads():
    from yams_spark.streaming.wal_codec import (
        decode_checkpoint,
        decode_transaction,
        decode_update_metadata,
        encode_checkpoint,
        encode_transaction,
        encode_update_metadata,
    )

    blob = encode_update_metadata("h" * 64, "lang", "en")
    assert len(blob) == 32 + 8 + 4 + 2
    assert decode_update_metadata(blob) == {
        "hash": "h" * 32, "key": "lang", "value": "en",
    }
    assert decode_update_metadata(blob[:-1]) is None

    t = encode_transaction(42, 7)
    assert len(t) == 16  # u64 + u32 + 4-byte struct tail pad
    assert decode_transaction(t) == {
        "transaction_id": 42, "participant_count": 7,
    }
    c = encode_checkpoint(99, 1_700_000_000)
    assert decode_checkpoint(c) == {
        "sequence_num": 99, "timestamp": 1_700_000_000,
    }
    # full entry round-trip through the frame
    entry = encode_wal_entry("UpdateMetadata", 5, 10, payload=blob)
    e = decode_wal_entry(entry)
    assert decode_update_metadata(e["data"])["key"] == "lang"
