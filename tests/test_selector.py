"""Cost-model selector on adversarial chunks (SURVEY.md §7.1 step 2:
all-unique, all-constant, sorted, skewed) — the winner must be sane and the
encode must never be dramatically worse than the best alternative."""

import numpy as np
import pyarrow as pa

from hadoop_etl_udfs_spark.codecs import decode_array, encode_array

rng = np.random.default_rng(11)


def best_possible(arr, candidates):
    sizes = {}
    for c in candidates:
        try:
            sizes[c] = encode_array(arr, codec=c).bytes_out
        except Exception:
            pass
    return sizes


def check_auto_near_best(arr, candidates, slack=1.35):
    enc = encode_array(arr, codec="auto")
    assert decode_array(enc.payload, enc.meta).equals(arr)
    sizes = best_possible(arr, candidates)
    best = min(sizes.values())
    assert enc.bytes_out <= best * slack, (
        f"auto={enc.codec}:{enc.bytes_out} vs best={sizes}"
    )
    return enc


def test_all_constant_string():
    arr = pa.array(["same"] * 10_000)
    # raw+block-stage, rle, and dict are all near-optimal for a constant
    # column; the selector may pick any of them as long as the size is tiny
    enc = check_auto_near_best(arr, ["raw", "dict", "rle", "fsst"])
    assert enc.codec in ("rle", "dict", "raw")
    assert enc.bytes_out < 500


def test_all_unique_random_strings():
    vals = ["".join(map(chr, rng.integers(33, 127, size=20))) for _ in range(5000)]
    check_auto_near_best(pa.array(vals), ["raw", "dict", "rle", "fsst"])


def test_sorted_low_cardinality():
    arr = pa.array(sorted(rng.choice(["aa", "bb", "cc", "dd"], size=20_000)))
    enc = check_auto_near_best(arr, ["raw", "dict", "rle", "fsst"])
    assert enc.codec in ("rle", "raw")  # raw+block-stage ties rle here
    assert enc.bytes_out < 1000


def test_skewed_zipf_strings():
    # zipf: one dominant value + long tail
    tail = [f"tail-{i}" for i in range(500)]
    vals = ["dominant"] * 9000 + [tail[i % 500] for i in range(1000)]
    check_auto_near_best(pa.array(vals), ["raw", "dict", "rle", "fsst"])


def test_constant_int():
    arr = pa.array(np.full(50_000, 123456789), type=pa.int64())
    enc = encode_array(arr, codec="auto")
    assert enc.bytes_out < 200  # FoR width 0 or RLE single run
    assert decode_array(enc.payload, enc.meta).equals(arr)


def test_all_unique_random_ints():
    arr = pa.array(rng.integers(-(2**62), 2**62, size=20_000), type=pa.int64())
    enc = check_auto_near_best(arr, ["raw", "forbp", "rle", "dict"])


def test_sorted_dense_ints():
    arr = pa.array(np.arange(1_000_000, 1_050_000), type=pa.int64())
    enc = encode_array(arr, codec="auto")
    assert enc.codec == "forbp"
    assert enc.bytes_out < 50_000 * 3  # <=17 bits/value


def test_mixed_length_strings_with_outlier():
    vals = ["short"] * 1000 + ["x" * 100_000]  # one huge value skews avg_len
    enc = encode_array(pa.array(vals), codec="auto")
    assert decode_array(enc.payload, enc.meta).equals(pa.array(vals))
