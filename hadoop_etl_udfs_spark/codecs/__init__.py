"""Per-column lightweight-compression codec kernels (pure numpy/Arrow).

Codec families (SURVEY.md §2.9): dict, RLE, FSST, frame-of-reference +
bit-pack, raw — with sampled cost-model auto-selection (selector.py). The
top-level chunk API is :mod:`hadoop_etl_udfs_spark.codecs.api`.
"""

from .api import Encoded, decode_array, encode_array, verify_crc  # noqa: F401
