"""Dictionary encoding for bytes and int chunks.

The explicit, chunk-local analog of parquet-mr's dictionary page the
reference turns on wholesale (ExaParquetWriterImpl.java:42
``DEFAULT_IS_DICTIONARY_ENABLED``). Codes are bit-packed at
ceil(log2(n_unique)) bits; the dictionary itself is a raw bytes block.
Optionally a *global* dictionary (built by a Spark distinct/count pass and
broadcast) supplies the value->code mapping so codes are stable across
chunks — see plans/globaldict.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import raw
from .bitpack import bits_needed, pack_bits, unpack_bits
from .varbytes import arrow_to_varbytes, varbytes_to_arrow


def _factorize_bytes(
    lengths: np.ndarray, data: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lengths,data) -> (codes uint64, uniq_lengths, uniq_data), first-occurrence order."""
    arr = varbytes_to_arrow(lengths, data, pa.large_binary())
    dict_arr = arr.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    uniq_lengths, uniq_data = arrow_to_varbytes(dict_arr.dictionary)
    return codes, uniq_lengths, uniq_data


def encode_bytes(
    lengths: np.ndarray,
    data: np.ndarray,
    global_dict: tuple[np.ndarray, np.ndarray, dict[bytes, int]] | None = None,
) -> tuple[dict[str, bytes], dict]:
    if global_dict is not None:
        # global dict: codes looked up against broadcast mapping; dictionary
        # itself is NOT stored per chunk (meta marks it external). Lookup is
        # per *chunk-local unique*, never per row: factorize locally first,
        # then remap the (few) local uniques through the global mapping.
        _, _, mapping = global_dict
        local_codes, uniq_lengths, uniq_data = _factorize_bytes(lengths, data)
        uniq_offs = np.zeros(len(uniq_lengths) + 1, dtype=np.int64)
        np.cumsum(uniq_lengths, out=uniq_offs[1:])
        ubuf = uniq_data.tobytes()
        local_to_global = np.fromiter(
            (
                mapping[ubuf[uniq_offs[i] : uniq_offs[i + 1]]]
                for i in range(len(uniq_lengths))
            ),
            dtype=np.uint64,
            count=len(uniq_lengths),
        )
        codes = local_to_global[local_codes]
        width = bits_needed(len(mapping) - 1)
        return {"codes": pack_bits(codes, width)}, {
            "n": len(lengths),
            "w": width,
            "global": True,
        }
    codes, uniq_lengths, uniq_data = _factorize_bytes(lengths, data)
    width = bits_needed(len(uniq_lengths) - 1)
    dict_sections, dict_meta = raw.encode_bytes(uniq_lengths, uniq_data)
    return {
        "codes": pack_bits(codes, width),
        "dict_len": dict_sections["len"],
        "dict_data": dict_sections["data"],
    }, {"n": len(lengths), "w": width, "n_uniq": len(uniq_lengths), "dict": dict_meta}


def decode_bytes(
    sections: dict[str, bytes],
    meta: dict,
    global_dict: tuple[np.ndarray, np.ndarray, dict[bytes, int]] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    codes = unpack_bits(sections["codes"], meta["n"], meta["w"]).astype(np.int64)
    if meta.get("global"):
        if global_dict is None:
            raise ValueError("chunk was encoded with a global dictionary")
        uniq_lengths, uniq_data = global_dict[0], global_dict[1]
    else:
        uniq_lengths, uniq_data = raw.decode_bytes(
            {"len": sections["dict_len"], "data": sections["dict_data"]}, meta["dict"]
        )
    return gather_bytes(codes, uniq_lengths, uniq_data)


def gather_bytes(
    codes: np.ndarray, uniq_lengths: np.ndarray, uniq_data: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized codes -> (lengths, data) gather (no per-value Python)."""
    uniq_offs = np.zeros(len(uniq_lengths) + 1, dtype=np.int64)
    np.cumsum(uniq_lengths, out=uniq_offs[1:])
    lengths = uniq_lengths[codes].astype(np.int64)
    total_all = int(lengths.sum())
    # int32 indices when the chunk fits (it always should) — half the memory
    # traffic of int64 on multi-MB chunks
    dt = np.int32 if total_all < 2**31 - 1 else np.int64
    # cumsum trick: src index advances by 1 inside a value and jumps to the
    # next value's start at each value boundary — 3 O(total) passes, no repeat
    starts = uniq_offs[codes].astype(dt)
    nz = lengths > 0
    s, l = starts[nz], lengths[nz].astype(dt)
    if total_all == 0:
        return lengths, np.empty(0, dtype=np.uint8)
    ends = np.cumsum(l, dtype=dt)
    adj = np.ones(total_all, dtype=dt)
    adj[0] = s[0]
    adj[ends[:-1]] = s[1:] - (s[:-1] + l[:-1]) + 1
    src = np.cumsum(adj, dtype=dt)
    return lengths, uniq_data[src]


def encode_int(values: np.ndarray) -> tuple[dict[str, bytes], dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    uniq, codes = np.unique(v, return_inverse=True)
    width = bits_needed(len(uniq) - 1)
    return {
        "codes": pack_bits(codes.astype(np.uint64), width),
        "dict": uniq.tobytes(),
    }, {"n": len(v), "w": width, "n_uniq": len(uniq)}


def decode_int(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    codes = unpack_bits(sections["codes"], meta["n"], meta["w"]).astype(np.int64)
    uniq = np.frombuffer(sections["dict"], dtype=np.int64)
    return uniq[codes]
