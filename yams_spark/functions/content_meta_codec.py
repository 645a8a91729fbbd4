"""Content-metadata wire codec — the reference's self-describing
binary metadata record (``src/api/content_metadata.cpp``).

The format (:20-170) is a tagged field list: ``u32 version`` (must be
1), ``u32 field count``, then per field ``u8 FieldType`` (String=0,
Timestamp=1, UInt32=2, StringVector=3, StringMap=4), ``u16 name
length``, the name bytes, and a type-dependent payload (String =
u32-length-prefixed bytes; Timestamp = i64 epoch millis; UInt32 = u32;
StringVector/StringMap = u32 count + strings). The reader binds only
the KNOWN field names (id/name/contentHash/mimeType, the three
timestamps, size, the tags map) and SKIPS unknown fields by type —
forward compatibility the round-trip tests pin. ``isValid``
(content_metadata.h:31-33): id, name, contentHash non-empty and
size > 0. The reference ships only the reader; the encoder here writes
exactly what that reader accepts (known fields in a fixed order).

Completes the wire-format family next to ``streaming/wal_codec`` and
``functions/manifest_codec``; the query predicate over these records is
``operators/qualifiers.metadata_query_filter``.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_content_metadata",
    "decode_content_metadata",
    "content_metadata_is_valid",
    "content_name_extension",
]

_STRING, _TIMESTAMP, _UINT32, _STRING_VECTOR, _STRING_MAP = range(5)


def _field_header(ftype: int, name: str) -> bytes:
    raw = name.encode("utf-8")
    return struct.pack("<BH", ftype, len(raw)) + raw


def _pstr(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<I", len(raw)) + raw


def encode_content_metadata(meta: dict) -> bytes:
    """Writer for the tagged-field record (known fields, fixed order;
    epoch-millis timestamps)."""
    fields: list[bytes] = []
    for key in ("id", "name", "mimeType", "contentHash"):
        if key in meta:
            fields.append(
                _field_header(_STRING, key) + _pstr(str(meta[key]))
            )
    if "size" in meta:
        fields.append(
            _field_header(_UINT32, "size")
            + struct.pack("<I", int(meta["size"]))
        )
    for key in ("createdAt", "modifiedAt", "accessedAt"):
        if key in meta:
            fields.append(
                _field_header(_TIMESTAMP, key)
                + struct.pack("<q", int(meta[key]))
            )
    tags = meta.get("tags")
    if tags is not None:
        body = struct.pack("<I", len(tags))
        for k in sorted(tags):
            body += _pstr(k) + _pstr(tags[k])
        fields.append(_field_header(_STRING_MAP, "tags") + body)
    return struct.pack("<II", 1, len(fields)) + b"".join(fields)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def pod(self, fmt: str):
        size = struct.calcsize(fmt)
        if self.pos + size > len(self.data):
            raise ValueError("buffer underflow")
        (v,) = struct.unpack_from(fmt, self.data, self.pos)
        self.pos += size
        return v

    def string(self) -> str:
        n = self.pod("<I")
        if self.pos + n > len(self.data):
            raise ValueError("buffer underflow")
        out = self.data[self.pos : self.pos + n].decode("utf-8", "replace")
        self.pos += n
        return out


def decode_content_metadata(data: bytes) -> dict | None:
    """ContentMetadata::deserialize (:64-170): version gate, known-name
    binding, unknown fields skipped by type; None on corruption."""
    r = _Reader(bytes(data))
    try:
        if r.pod("<I") != 1:
            return None
        n_fields = r.pod("<I")
        meta: dict = {"tags": {}}
        for _ in range(n_fields):
            ftype = r.pod("<B")
            name_len = r.pod("<H")
            if r.pos + name_len > len(r.data):
                return None
            name = r.data[r.pos : r.pos + name_len].decode(
                "utf-8", "replace"
            )
            r.pos += name_len
            if ftype == _STRING:
                value = r.string()
                if name in ("mimeType", "name", "id", "contentHash"):
                    meta[name] = value
            elif ftype == _TIMESTAMP:
                value = r.pod("<q")
                if name in ("createdAt", "modifiedAt", "accessedAt"):
                    meta[name] = value
            elif ftype == _UINT32:
                value = r.pod("<I")
                if name == "size":
                    meta["size"] = value
            elif ftype == _STRING_VECTOR:
                for _ in range(r.pod("<I")):
                    r.string()
            elif ftype == _STRING_MAP:
                count = r.pod("<I")
                if name == "tags":
                    meta["tags"] = {}
                    for _ in range(count):
                        k = r.string()
                        meta["tags"][k] = r.string()
                else:
                    for _ in range(count):
                        r.string()
                        r.string()
            else:
                # unknown field type: the C++ switch falls through
                # without consuming a payload — subsequent parsing is
                # undefined; treat as corruption here (stated hardening)
                return None
        return meta
    except ValueError:
        return None


def content_metadata_is_valid(meta: dict) -> bool:
    """isValid (content_metadata.h:31-33)."""
    return bool(
        meta.get("id")
        and meta.get("name")
        and meta.get("size", 0) > 0
        and meta.get("contentHash")
    )


def content_name_extension(name: str) -> str:
    """extension() (content_metadata.h:39-45): from the last dot,
    dotfiles have none, case preserved."""
    pos = name.rfind(".")
    if pos > 0:
        return name[pos:]
    return ""
