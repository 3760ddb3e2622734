"""spark-submit entry point for Iceberg table maintenance (iceberg_lite).

    spark-submit --master 'local[8]' \
        --py-files dist/hadoop_etl_udfs_spark.zip \
        jobs/iceberg_maintenance_job.py \
        --table /path/to/tbl [--expire-keep-last N] [--remove-orphans] \
        [--show-snapshots]

The operational pair of jobs/recluster_job.py: recluster = OPTIMIZE the
engine's own chunk sink; this job = VACUUM the Iceberg input table
(expire old snapshots, reclaim orphaned data files from crashed commits).
Prints one JSON line of maintenance stats. Metadata-only except for the
file deletions themselves — no Spark session needed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="Iceberg table directory")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="expire all but the most recent N snapshots")
    p.add_argument("--remove-orphans", action="store_true",
                   help="delete data files no snapshot references")
    p.add_argument("--show-snapshots", action="store_true",
                   help="include the snapshot log in the output")
    args = p.parse_args()
    if args.expire_keep_last is None and not (
        args.remove_orphans or args.show_snapshots
    ):
        p.error("nothing to do: pass --expire-keep-last, --remove-orphans "
                "and/or --show-snapshots")

    sys.path.insert(0, ".")
    from hadoop_etl_udfs_spark.sources.iceberg_lite import (
        expire_snapshots,
        iceberg_snapshots,
        remove_orphan_files,
    )

    out: dict = {"table": args.table}
    if args.expire_keep_last is not None:
        out["expire"] = expire_snapshots(args.table, args.expire_keep_last)
    if args.remove_orphans:
        out["orphans"] = remove_orphan_files(args.table)
    if args.show_snapshots:
        out["snapshots"] = iceberg_snapshots(args.table)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
