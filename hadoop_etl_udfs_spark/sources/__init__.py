"""Sources: the Common-Crawl-style pages table (synthesis + IO helpers).

The reference's source layer (HCatalog metadata + HDFS file enumeration +
SerDe decode, SURVEY.md §2.1 S1-S11) is subsumed by Spark's DataFrame
reader/catalog; what remains here is the deterministic synthetic input
mandated by BASELINE.json input_hint.
"""
