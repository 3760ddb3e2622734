"""Golden-chunk tests (reference test family 1 — committed fixtures with
exact expected outputs, HdfsSerDeImportServiceTest.java:26-68): small
deterministic chunks with pinned codec metadata, so a format regression is
caught as a value change, not just a round-trip failure."""

import json

import numpy as np
import pyarrow as pa

from hadoop_etl_udfs_spark.codecs import encode_array
from hadoop_etl_udfs_spark.codecs.api import decode_array


def meta_of(enc):
    return json.loads(enc.meta)


def test_golden_rle_runs():
    arr = pa.array(["en"] * 5 + ["de"] * 3 + ["en"] * 2)
    enc = encode_array(arr, codec="rle")
    m = meta_of(enc)
    assert m["c"] == "rle" and m["n"] == 10
    assert m["m"]["n_runs"] == 3          # en-run, de-run, en-run
    assert m["m"]["w"] == 1               # 2 distinct values -> 1-bit codes
    assert decode_array(enc.payload, enc.meta).equals(arr)


def test_golden_forbp_width():
    # values 1000..1007: residual range 7 -> 3 bits, min 1000
    arr = pa.array(np.arange(1000, 1008), type=pa.int64())
    enc = encode_array(arr, codec="forbp")
    m = meta_of(enc)["m"]
    assert m["min"] == 1000 and m["w"] == 3 and m["n"] == 8
    assert enc.bytes_out < 8 * 8  # beats raw int64


def test_golden_forbp_constant_is_zero_width():
    arr = pa.array([42] * 100, type=pa.int64())
    enc = encode_array(arr, codec="forbp")
    m = meta_of(enc)["m"]
    assert m["w"] == 0
    # payload carries no residual bits at all
    from hadoop_etl_udfs_spark.codecs.frame import unpack_sections

    assert unpack_sections(enc.payload)["bp"] == b""


def test_golden_dict_codes():
    arr = pa.array(["x", "y", "x", "z", "x"])
    enc = encode_array(arr, codec="dict")
    m = meta_of(enc)["m"]
    assert m["n_uniq"] == 3 and m["w"] == 2
    assert decode_array(enc.payload, enc.meta).equals(arr)


def test_golden_fsst_learns_the_repeat():
    text = "abcdabcdabcd" * 200
    arr = pa.array([text])
    enc = encode_array(arr, codec="fsst")
    # 2400 bytes of a 4-byte period must compress > 3x
    assert enc.bytes_in / enc.bytes_out > 3
    assert decode_array(enc.payload, enc.meta).equals(arr)


def test_golden_crc_is_stable_across_encodes():
    arr = pa.array(["a", None, "bb"])
    e1 = encode_array(arr, codec="raw")
    e2 = encode_array(arr, codec="dict")
    # CRC is over the decoded canonical form — codec-independent
    assert e1.crc32 == e2.crc32
