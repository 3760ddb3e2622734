"""Chunk payload container: named binary sections in one bytes blob.

Replaces the reference's implicit parquet page framing
(parquet/src/main/java/com/exasol/hadoop/parquet/ExaParquetWriterImpl.java:39-44
— block/page sizes chosen by parquet-mr). Layout (all little-endian):

    MAGIC "SGC1" | u16 n_sections | per section:
        u8 name_len | name utf-8 | u64 payload_len | payload
"""

from __future__ import annotations

import struct

MAGIC = b"SGC1"


class CorruptChunkError(ValueError):
    """Chunk payload failed structural validation (bad magic / truncation)."""


def pack_sections(sections: dict[str, bytes]) -> bytes:
    parts = [MAGIC, struct.pack("<H", len(sections))]
    for name, payload in sections.items():
        nb = name.encode("utf-8")
        if len(nb) > 255:
            raise ValueError(f"section name too long: {name}")
        parts.append(struct.pack("<B", len(nb)))
        parts.append(nb)
        parts.append(struct.pack("<Q", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def unpack_sections(buf: bytes) -> dict[str, bytes]:
    if buf[:4] != MAGIC:
        raise CorruptChunkError("bad chunk frame magic")
    try:
        (n,) = struct.unpack_from("<H", buf, 4)
        pos = 6
        out: dict[str, bytes] = {}
        for _ in range(n):
            (name_len,) = struct.unpack_from("<B", buf, pos)
            pos += 1
            name = buf[pos : pos + name_len].decode("utf-8")
            pos += name_len
            (plen,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
            if pos + plen > len(buf):
                raise CorruptChunkError(
                    f"section {name!r} truncated: needs {plen} bytes, "
                    f"{len(buf) - pos} remain"
                )
            out[name] = bytes(buf[pos : pos + plen])
            pos += plen
        return out
    except struct.error as e:
        raise CorruptChunkError(f"chunk frame truncated: {e}") from e
