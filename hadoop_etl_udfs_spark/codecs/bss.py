"""Byte-stream-split codec for float-vector (embedding) chunks.

The established columnar encoding for float data (Parquet's
BYTE_STREAM_SPLIT, parquet-format Encodings.md; the reference's parquet
writer would inherit it from parquet-mr for float columns,
ExaParquetWriterImpl.java:36-45): transpose the value bytes so byte
plane k of every float lands in one contiguous stream. Embedding vectors
share sign/exponent structure, so those planes become highly repetitive
and the frame's per-section zstd stage (frame.py SGC2) compresses them
far beyond what interleaved IEEE bytes allow; mantissa planes stay
near-random and cost nothing extra. Lossless by construction — a pure
byte permutation, no quantization.

Chunk layout: "lbp" = FoR+bitpacked per-row vector lengths (constant for
fixed-dim embeddings -> packs to ~0 bits) + "p0".."p{itemsize-1}" byte
planes of the flattened little-endian child values. The "raw" variant
keeps the child bytes interleaved ("v" section) for comparison.
"""

from __future__ import annotations

import numpy as np

from . import forbp


def encode_flist(lengths: np.ndarray, values: np.ndarray) -> tuple[dict, dict]:
    """(per-row lengths, flattened float32/float64 values) -> sections."""
    itemsize = values.dtype.itemsize
    lsec, lmeta = forbp.encode_int(lengths.astype(np.int64))
    b = np.ascontiguousarray(values).view(np.uint8).reshape(-1, itemsize)
    sections = {"lbp": lsec["bp"]}
    for k in range(itemsize):
        sections[f"p{k}"] = np.ascontiguousarray(b[:, k]).tobytes()
    return sections, {"len": lmeta, "isz": itemsize}


def decode_flist(sections: dict, meta: dict) -> tuple[np.ndarray, np.ndarray]:
    lengths = forbp.decode_int({"bp": sections["lbp"]}, meta["len"])
    isz = meta["isz"]
    if "v" in sections:  # raw variant
        dt = np.float32 if isz == 4 else np.float64
        return lengths, np.frombuffer(sections["v"], dtype=dt)
    planes = [
        np.frombuffer(sections[f"p{k}"], dtype=np.uint8) for k in range(isz)
    ]
    n_vals = len(planes[0]) if planes else 0
    b = np.empty((n_vals, isz), dtype=np.uint8)
    for k in range(isz):
        b[:, k] = planes[k]
    dt = np.float32 if isz == 4 else np.float64
    return lengths, b.reshape(-1).view(dt)


def encode_flist_raw(
    lengths: np.ndarray, values: np.ndarray
) -> tuple[dict, dict]:
    lsec, lmeta = forbp.encode_int(lengths.astype(np.int64))
    return (
        {"lbp": lsec["bp"], "v": np.ascontiguousarray(values).tobytes()},
        {"len": lmeta, "isz": values.dtype.itemsize},
    )
