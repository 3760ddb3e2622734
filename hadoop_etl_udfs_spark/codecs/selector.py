"""Sampled trial-encode cost model: pick the winning codec per column-chunk.

The reference offers no such choice — every column goes through parquet-mr
with dictionary-on and a single user-chosen block codec for the whole file
(ExaParquetWriterImpl.java:36-45, COMPRESSION_TYPE at ExportHCatTable.java:44).
Here each column-chunk independently gets the codec with the smallest
estimated encoded size, estimated from cheap exact stats (ints) or a sampled
trial encode (strings); ties break toward the cheaper-to-decode codec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import fsst
from .bitpack import bits_needed
from .varbytes import varbytes_to_arrow

# decode-cost rank for tie-breaking (lower = cheaper to decode)
_DECODE_RANK = {"raw": 0, "forbp": 1, "dict": 2, "rle": 3, "fsst": 4}

_SAMPLE_VALUES = 4096     # contiguous value sample for uniq/run stats
_FSST_SAMPLE_BYTES = 1 << 16  # trial-encode window for fsst ratio


def _pick(estimates: dict[str, float]) -> str:
    return min(estimates.items(), key=lambda kv: (kv[1], _DECODE_RANK[kv[0]]))[0]


def choose_int_codec(values: np.ndarray) -> str:
    n = len(values)
    if n == 0:
        return "raw"
    v = np.ascontiguousarray(values, dtype=np.int64)
    vmin, vmax = int(v.min()), int(v.max())
    w_for = bits_needed(vmax - vmin)
    # exact run stats — one vector comparison
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    n_runs = len(change) + 1
    starts = np.concatenate(([0], change))
    run_lengths = np.diff(np.concatenate((starts, [n])))
    w_rl = bits_needed(int(run_lengths.max()) - int(run_lengths.min()))
    run_vals = v[starts]
    w_rv = bits_needed(int(run_vals.max()) - int(run_vals.min())) if n_runs else 0
    # sampled unique estimate for dict
    sample = v[:: max(1, n // _SAMPLE_VALUES)][:_SAMPLE_VALUES]
    u_frac = len(np.unique(sample)) / len(sample)
    est_uniq = max(1, int(n * u_frac)) if u_frac < 0.999 else n
    estimates = {
        "raw": 8.0 * n,
        "forbp": w_for * n / 8.0,
        "rle": n_runs * (w_rv + w_rl) / 8.0,
        "dict": est_uniq * 8.0 + n * bits_needed(est_uniq - 1) / 8.0,
    }
    return _pick(estimates)


def choose_float_codec(bit_values: np.ndarray) -> str:
    n = len(bit_values)
    if n == 0:
        return "raw"
    sample = bit_values[:: max(1, n // _SAMPLE_VALUES)][:_SAMPLE_VALUES]
    u_frac = len(np.unique(sample)) / len(sample)
    if u_frac >= 0.999:
        return "raw"
    est_uniq = max(1, int(n * u_frac))
    est_dict = est_uniq * 8.0 + n * bits_needed(est_uniq - 1) / 8.0
    return _pick({"raw": 8.0 * n, "dict": est_dict})


def choose_bytes_codec(
    lengths: np.ndarray,
    data: np.ndarray,
    global_dict=None,
    enable_fsst: bool = True,
    cache_key: str | None = None,
) -> str:
    n = len(lengths)
    if n == 0:
        return "raw"
    total = float(data.nbytes)
    avg_len = total / n
    w_len = bits_needed(int(lengths.max()) - int(lengths.min()))
    est_raw = total + n * w_len / 8.0

    # contiguous sample keeps run adjacency observable
    k = min(n, _SAMPLE_VALUES)
    s_lengths = lengths[:k]
    s_end = int(s_lengths.sum())
    s_arr = varbytes_to_arrow(s_lengths, data[:s_end], pa.large_binary())
    s_dict = s_arr.dictionary_encode()
    codes = s_dict.indices.to_numpy(zero_copy_only=False)
    s_uniq = len(s_dict.dictionary)
    u_frac = s_uniq / k
    est_uniq = n if u_frac >= 0.999 else max(1, int(n * u_frac))
    est_dict = est_uniq * avg_len + est_uniq * 2 + n * bits_needed(est_uniq - 1) / 8.0

    n_runs_s = int((codes[1:] != codes[:-1]).sum()) + 1
    r_frac = n_runs_s / k
    est_rle = (
        est_uniq * avg_len
        + est_uniq * 2
        + n * r_frac * (bits_needed(est_uniq - 1) + bits_needed(n)) / 8.0
    )

    estimates = {"raw": est_raw, "dict": est_dict, "rle": est_rle}
    if global_dict is not None:
        # broadcast dictionary: codes only, no per-chunk dictionary storage
        estimates["dict"] = n * bits_needed(len(global_dict[2]) - 1) / 8.0

    if enable_fsst and total >= 1024 and u_frac > 0.05:
        window = data[: min(data.nbytes, _FSST_SAMPLE_BYTES)]
        cached = fsst._TABLE_CACHE.get(cache_key) if cache_key else None
        if cached is not None:
            # estimate with the worker's cached table: one apply, no training
            tokens = fsst.apply_table(window, cached[1])
        else:
            _, tokens = fsst.train_and_encode(window, max_merges=64)
        used = np.unique(tokens)
        w_tok = bits_needed(len(used) - 1)
        ratio = (len(tokens) * w_tok / 8.0) / max(1.0, float(window.nbytes))
        estimates["fsst"] = total * ratio + 2048 + 1024 + n * w_len / 8.0
    return _pick(estimates)
