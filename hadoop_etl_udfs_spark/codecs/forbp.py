"""Frame-of-reference + bit-packing for int64 chunks.

Replaces the reference's INT96 timestamp encode (Julian day + nanos-of-day,
parquet/src/main/java/com/exasol/hadoop/parquet/Tuple.java:133-152) and the
parquet-mr PLAIN int path: values become ``(v - min)`` residuals packed at the
minimal bit width. Epoch-microsecond crawl timestamps are near-sorted and
narrow-range, so FoR typically gets <16 bits/value vs 96.

Sections: ``meta`` is carried by the caller; payload section ``bp`` holds the
packed residuals.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bits_needed, pack_bits, unpack_bits


def encode_int(values: np.ndarray) -> tuple[dict[str, bytes], dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return {"bp": b""}, {"n": 0, "min": 0, "w": 0}
    vmin = int(v.min())
    # unsigned wrap-around subtraction: valid since every v >= vmin
    residuals = v.view(np.uint64) - np.int64(vmin).view(np.uint64)
    width = bits_needed(int(residuals.max()))
    return {"bp": pack_bits(residuals, width)}, {
        "n": len(v),
        "min": vmin,
        "w": width,
    }


def decode_int(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    n, vmin, width = meta["n"], meta["min"], meta["w"]
    residuals = unpack_bits(sections["bp"], n, width)
    return (residuals + np.uint64(np.int64(vmin).view(np.uint64))).view(np.int64)
