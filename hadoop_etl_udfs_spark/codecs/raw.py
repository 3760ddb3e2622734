"""Raw (passthrough) blocks for bytes and int chunks.

Even "raw" is lightweight-compressed on the offsets side: value lengths go
through frame-of-reference + bit-pack (a 64-bit offset per value would often
dwarf short strings). Data bytes are stored verbatim — the passthrough path
the reference reserves for its ``uncompressed`` default
(doc/export.md:100, ExaParquetWriterImpl.java:38).
"""

from __future__ import annotations

import numpy as np

from . import forbp


def encode_bytes(lengths: np.ndarray, data: np.ndarray) -> tuple[dict[str, bytes], dict]:
    len_sections, len_meta = forbp.encode_int(lengths.astype(np.int64))
    return {"len": len_sections["bp"], "data": data.tobytes()}, {"len": len_meta}


def decode_bytes(sections: dict[str, bytes], meta: dict) -> tuple[np.ndarray, np.ndarray]:
    lengths = forbp.decode_int({"bp": sections["len"]}, meta["len"])
    data = np.frombuffer(sections["data"], dtype=np.uint8)
    return lengths, data


def encode_int(values: np.ndarray) -> tuple[dict[str, bytes], dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    return {"data": v.tobytes()}, {"n": len(v)}


def decode_int(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    return np.frombuffer(sections["data"], dtype=np.int64)
