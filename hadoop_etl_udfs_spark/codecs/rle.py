"""Run-length encoding over sorted runs (bytes and int chunks).

The engine sorts chunks with ``sortWithinPartitions(lang, url)`` (no global
shuffle) before encoding, so low-cardinality columns like ``lang`` arrive as
long runs. Run detection is one numpy comparison
(``np.flatnonzero(a[1:] != a[:-1])``); run values go through a local
dictionary, run lengths through frame-of-reference + bit-pack.

Replaces the RLE half of parquet-mr's RLE/bit-pack hybrid that the reference
relies on implicitly (ExaParquetWriterImpl.java:42).
"""

from __future__ import annotations

import numpy as np

from . import dictenc, forbp
from .bitpack import bits_needed, pack_bits, unpack_bits


def _run_bounds(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """codes -> (run_start_indices, run_lengths)."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return starts, ends - starts


def encode_bytes(lengths: np.ndarray, data: np.ndarray) -> tuple[dict[str, bytes], dict]:
    codes, uniq_lengths, uniq_data = dictenc._factorize_bytes(lengths, data)
    starts, run_lengths = _run_bounds(codes)
    run_codes = codes[starts]
    width = bits_needed(len(uniq_lengths) - 1)
    from . import raw

    dict_sections, dict_meta = raw.encode_bytes(uniq_lengths, uniq_data)
    rl_sections, rl_meta = forbp.encode_int(run_lengths)
    return {
        "run_codes": pack_bits(run_codes, width),
        "run_len": rl_sections["bp"],
        "dict_len": dict_sections["len"],
        "dict_data": dict_sections["data"],
    }, {
        "n": int(len(lengths)),
        "n_runs": int(len(run_codes)),
        "w": width,
        "rl": rl_meta,
        "dict": dict_meta,
    }


def decode_bytes(sections: dict[str, bytes], meta: dict) -> tuple[np.ndarray, np.ndarray]:
    from . import raw

    run_codes = unpack_bits(sections["run_codes"], meta["n_runs"], meta["w"]).astype(
        np.int64
    )
    run_lengths = forbp.decode_int({"bp": sections["run_len"]}, meta["rl"])
    uniq_lengths, uniq_data = raw.decode_bytes(
        {"len": sections["dict_len"], "data": sections["dict_data"]}, meta["dict"]
    )
    codes = np.repeat(run_codes, run_lengths)
    return dictenc.gather_bytes(codes, uniq_lengths, uniq_data)


def encode_int(values: np.ndarray) -> tuple[dict[str, bytes], dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    starts, run_lengths = _run_bounds(v)
    rv_sections, rv_meta = forbp.encode_int(v[starts])
    rl_sections, rl_meta = forbp.encode_int(run_lengths)
    return {"run_vals": rv_sections["bp"], "run_len": rl_sections["bp"]}, {
        "n": int(len(v)),
        "rv": rv_meta,
        "rl": rl_meta,
    }


def decode_int(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    run_vals = forbp.decode_int({"bp": sections["run_vals"]}, meta["rv"])
    run_lengths = forbp.decode_int({"bp": sections["run_len"]}, meta["rl"])
    return np.repeat(run_vals, run_lengths)
