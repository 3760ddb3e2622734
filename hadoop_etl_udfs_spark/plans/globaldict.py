"""Global dictionaries: a two-pass Spark aggregate + broadcast.

Pass 1 is a real distributed aggregate (distinct + count, map-side partial
combine); the dictionary — ordered by descending frequency so hot values get
small codes — is broadcast to the encode kernels, which then emit codes only
(no per-chunk dictionary). Decode loads the same dictionary from the output
directory.

Intended for low-cardinality columns shared across chunks (``lang``,
url hosts). The reference has no analog: parquet-mr dictionaries are always
page-local (ExaParquetWriterImpl.java:42).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DICTS_SUBDIR = "global_dicts"

# (uniq_lengths int64[], uniq_data uint8[], value->code mapping)
GlobalDict = tuple[np.ndarray, np.ndarray, dict[bytes, int]]


def build_global_dict(df: DataFrame, column: str, max_size: int = 1 << 20) -> GlobalDict:
    """Distributed distinct+count; codes assigned by descending frequency.

    ``max_size`` caps driver memory — a column whose cardinality exceeds it
    should use chunk-local dictionaries instead (raises so the caller decides
    deliberately)."""
    rows = (
        df.groupBy(column)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(column))
        .limit(max_size + 1)
        .collect()
    )
    if len(rows) > max_size:
        raise ValueError(
            f"column {column!r} cardinality exceeds max_size={max_size}; "
            "use chunk-local dict"
        )
    values = [
        (r[column].encode() if isinstance(r[column], str) else bytes(r[column]))
        for r in rows
    ]
    lengths = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    mapping = {v: i for i, v in enumerate(values)}
    return lengths, data, mapping


def save_global_dict(gd: GlobalDict, out_dir: str, column: str) -> None:
    lengths, data, _ = gd
    from ..codecs.varbytes import varbytes_to_arrow

    arr = varbytes_to_arrow(lengths, data, pa.large_binary())
    path = os.path.join(out_dir, DICTS_SUBDIR)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table({"code": np.arange(len(lengths)), "value": arr}),
        os.path.join(path, f"{column}.parquet"),
    )


def load_global_dict(out_dir: str, column: str) -> GlobalDict:
    from ..codecs.varbytes import arrow_to_varbytes

    t = pq.read_table(os.path.join(out_dir, DICTS_SUBDIR, f"{column}.parquet"))
    t = t.sort_by("code")
    arr = t.column("value").combine_chunks()
    lengths, data = arrow_to_varbytes(arr)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    buf = data.tobytes()
    mapping = {buf[offs[i]: offs[i + 1]]: i for i in range(len(lengths))}
    return lengths, data, mapping
