"""Operators: the encode/decode pipeline plus the relational, dedup,
similarity, and text-analysis operators surfaced through __spark_entry__.py
(SURVEY.md §2 inventory).
"""
