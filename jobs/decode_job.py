"""spark-submit entry point for decode + verification (the IMPORT direction).

    spark-submit --py-files dist/hadoop_etl_udfs_spark.zip jobs/decode_job.py \
        --input /path/to/encoded_sink --output /path/to/pages_parquet \
        [--verify-against /path/to/original_pages] [--global-dict lang]

Decodes an encoded-chunk sink back to the original columns (shuffle-free
colocated path with grouped fallback) and optionally verifies bit-identity
against the original table — the operational form of the north-rule gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="encoded-chunk sink dir")
    p.add_argument("--output", help="write decoded pages parquet here")
    p.add_argument("--verify-against", help="original pages parquet to compare")
    p.add_argument("--global-dict", action="append", default=[],
                   help="column(s) encoded with a saved global dictionary")
    p.add_argument("--schema", default=None,
                   help="output DDL (default: the pages schema)")
    p.add_argument("--sink-columns", type=int, default=5,
                   help="the sink's column count (colocated-path group "
                        "arity — NOT the output schema's width; an evolved "
                        "sink with more columns needs this raised)")
    args = p.parse_args()
    if not args.output and not args.verify_against:
        p.error("nothing to do: pass --output and/or --verify-against")

    from hadoop_etl_udfs_spark.session import get_job_spark

    spark = get_job_spark("decode_job")

    from hadoop_etl_udfs_spark.operators.encode import (
        decode_chunks,
        decode_chunks_colocated,
    )
    from hadoop_etl_udfs_spark.plans import globaldict, lineage

    gds = {
        col: globaldict.load_global_dict(args.input, col)
        for col in args.global_dict
    } or None

    from hadoop_etl_udfs_spark.operators.encode import IncompleteChunkError

    result: dict = {}
    dec = None
    # duplicated sinks (resume over drifted input) need the grouped path —
    # the colocated kernel cannot dedupe copies that landed in different files
    if lineage.sink_has_duplicates(spark, args.input):
        result["decode_path"] = "grouped (duplicated sink)"
    else:
        try:
            enc = lineage.read_encoded_colocated(spark, args.input)
            dec = decode_chunks_colocated(
                enc, schema=args.schema, n_columns=args.sink_columns,
                global_dicts=gds,
            )
            dec.cache().count()  # materialize; torn chunks raise here
            result["decode_path"] = "colocated"
        except Exception as e:
            # only a torn-chunk read (wrong split settings) is recoverable by
            # re-reading grouped; genuine decode failures (CorruptChunkError
            # etc.) must propagate, not silently decode twice
            if dec is not None:
                dec.unpersist()
                dec = None
            # worker-side exceptions reach the driver wrapped in a
            # PythonException — match the distinctive message marker every
            # IncompleteChunkError raise carries ("arrived incomplete"), not
            # the bare class name, which could appear inside an unrelated
            # traceback's quoted source
            if not (
                isinstance(e, IncompleteChunkError)
                or "arrived incomplete" in str(e)
            ):
                raise
            result["decode_path"] = "grouped (torn colocated read)"
    if dec is None or "grouped" in result["decode_path"]:
        enc = lineage.read_encoded(spark, args.input)
        dec = decode_chunks(enc, schema=args.schema, global_dicts=gds).cache()

    result["rows_decoded"] = dec.count()
    if args.output:
        dec.write.mode("overwrite").parquet(args.output)
    if args.verify_against:
        from pyspark.sql import functions as F

        orig = spark.read.parquet(args.verify_against)
        cols = dec.columns

        def fp(df):
            return df.select("*", F.xxhash64(*cols).alias("_fp"))

        missing = (
            fp(orig).select("_fp").exceptAll(fp(dec).select("_fp")).count()
        )
        result["rows_original"] = orig.count()
        result["mismatched_or_missing"] = missing
        result["bit_identical"] = (
            missing == 0 and result["rows_decoded"] == result["rows_original"]
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
