"""hadoop_etl_udfs_spark — a from-scratch PySpark-native per-column
lightweight-compression engine with the data-processing capabilities of
exasol/hadoop-etl-udfs (reference at /root/reference, studied for WHAT it
computes, not HOW).

The reference converts rows <-> columnar files one value at a time in Java
(decode loop: hadoop-etl-common/.../HdfsSerDeImportService.java:173-200;
encode loop: parquet/.../Tuple.java:83-161) and delegates lightweight
compression to parquet-mr (ExaParquetWriterImpl.java:36-45). This engine
makes the encode stage explicit, vectorized (Arrow/numpy inside
``mapInArrow``) and auto-selected per column-chunk:

- dictionary encoding (global for url-host / lang, local per chunk)
- run-length encoding over sorted runs
- FSST string compression (Boncz, Neumann, Leis — VLDB 2020)
- frame-of-reference + bit-packing for integers / epoch timestamps
- raw passthrough

with a sampled trial-encode cost model choosing the winner per column-chunk,
explicit salting of skewed url-host partitions, and a per-chunk lineage
manifest enabling resume-from-failure.
"""

__version__ = "0.1.0"
