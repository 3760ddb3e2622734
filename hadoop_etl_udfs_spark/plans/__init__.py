"""Plans: job-level orchestration — encoded-table sink, lineage manifest,
resume-from-failure, and global dictionaries.

The reference's analog is its manifest/distribution layer: one row per HDFS
file emitted by HCatTableFiles (SURVEY.md §2.1 U2) and idempotent partition
creation (HiveMetastoreService.java:92-110). Ours is chunk-level and
content-addressed.
"""
