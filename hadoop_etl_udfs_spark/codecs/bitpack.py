"""Vectorized bit-packing of unsigned integers (numpy, no per-value Python).

The reference delegates all integer packing to parquet-mr's RLE/bit-pack
hybrid (ExaParquetWriterImpl.java:42 turns dictionary encoding on and lets
parquet-mr pack the codes). Here packing is explicit: a width-w little-endian
bitstream built with numpy shifts + ``np.packbits``.
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """Minimum bits to represent max_value (0 -> 0 bits)."""
    if max_value <= 0:
        return 0
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (uint64, each < 2**width) into a little-endian
    bitstream (value i occupies stream bits [i*width, (i+1)*width), LSB
    first). Byte-lane method: groups of 8 values -> width output bytes,
    O(8 + width) vector ops per group column instead of an (n, width) bit
    matrix."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    groups = (n + 7) // 8
    v = np.zeros(groups * 8, dtype=np.uint64)
    v[:n] = values
    V = v.reshape(groups, 8)
    out = np.zeros((groups, width), dtype=np.uint64)
    for i in range(8):
        start = i * width
        for j in range(start // 8, (start + width - 1) // 8 + 1):
            s = start - 8 * j
            contrib = V[:, i] << np.uint64(s) if s >= 0 else V[:, i] >> np.uint64(-s)
            out[:, j] |= contrib & np.uint64(0xFF)
    total_bytes = (n * width + 7) // 8
    return out.astype(np.uint8).tobytes()[: max(total_bytes, 0)]


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    groups = (n + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8)
    b = np.zeros(groups * width, dtype=np.uint64)
    b[: len(raw)] = raw
    B = b.reshape(groups, width)
    V = np.zeros((groups, 8), dtype=np.uint64)
    for i in range(8):
        start = i * width
        for j in range(start // 8, (start + width - 1) // 8 + 1):
            s = 8 * j - start
            contrib = B[:, j] << np.uint64(s) if s >= 0 else B[:, j] >> np.uint64(-s)
            V[:, i] |= contrib
    mask = (
        (np.uint64(1) << np.uint64(width)) - np.uint64(1)
        if width < 64
        else np.uint64(0xFFFFFFFFFFFFFFFF)
    )
    return (V.reshape(-1)[:n]) & mask
