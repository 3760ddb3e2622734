"""Pure-multiprocessing codec scaling probe (no Spark).

Generates the same synthetic chunks the bench encodes, then encodes N chunks
across P processes for P in the given list. Separates the engine's Spark
overhead from the host's codec-kernel scaling ceiling.

Usage: PYTHONPATH=. python tools/profile_codec_scaling.py [n_chunks] [procs ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHUNK_ROWS = 16384 // 2  # bench sees ~7k rows/partition at 450k docs / 64 parts


def _encode_chunk(chunk_no: int) -> tuple[float, int, int]:
    from hadoop_etl_udfs_spark.codecs.api import encode_array
    from hadoop_etl_udfs_spark.sources.pages import _gen_batch

    ids = np.arange(chunk_no * CHUNK_ROWS, (chunk_no + 1) * CHUNK_ROWS, dtype=np.uint64)
    batch = _gen_batch(ids, 42)
    t0 = time.time()
    bin_, bout = 0, 0
    for i in range(batch.num_columns):
        enc = encode_array(batch.column(i), codec="auto", cache_key=batch.schema.names[i])
        bin_ += enc.bytes_in
        bout += enc.bytes_out
    return time.time() - t0, bin_, bout


def run(n_chunks: int, procs: int) -> dict:
    with mp.Pool(procs) as pool:
        # warm the pool (imports, numpy arenas)
        pool.map(_encode_chunk, range(procs))
        t0 = time.time()
        results = pool.map(_encode_chunk, range(n_chunks))
        wall = time.time() - t0
    cpu_s = sum(r[0] for r in results)
    bytes_in = sum(r[1] for r in results)
    return {
        "procs": procs,
        "n_chunks": n_chunks,
        "wall_s": round(wall, 2),
        "kernel_cpu_s": round(cpu_s, 2),
        "mb_in": round(bytes_in / 1e6, 1),
        "mb_per_s_wall": round(bytes_in / 1e6 / wall, 1),
        "per_chunk_s": round(cpu_s / n_chunks, 3),
    }


def main() -> None:
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    procs_list = [int(p) for p in sys.argv[2:]] or [1, 8, 32]
    for p in procs_list:
        print(json.dumps(run(n_chunks, p)), flush=True)


if __name__ == "__main__":
    main()
