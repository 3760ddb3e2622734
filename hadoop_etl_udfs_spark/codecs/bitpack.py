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
    """Pack ``values`` (uint64, each < 2**width) into a little-endian bitstream."""
    if width == 0 or len(values) == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    # (n, width) bit matrix, LSB first, then flatten row-major -> value bits
    # are contiguous in the stream.
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)
