"""Regenerate tests/fixtures/golden_pages.avro (deterministic content).

The committed binary is the golden-file evidence for the S1 Avro dispatch
(reference reads Avro via SerDe dispatch, doc/import.md:15) — the test
decodes the committed bytes, so a format drift in avro_lite breaks loudly.
Run: PYTHONPATH=. python tools/make_avro_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_etl_udfs_spark.sources.avro_lite import pages_avro_schema, write_avro

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_pages.avro",
)

# epoch-µs timestamps; html bytes include non-UTF8 and empty payloads;
# text includes multi-byte UTF-8 (the reference round-trips these through
# its SerDe walk — HdfsSerDeImportServiceTest value-exact family)
ROWS = [
    {"url": "https://a.example/x", "warc_ts": 1_600_000_000_000_000,
     "html": b"<html>\x00\xff</html>", "text": "hello world", "lang": "en"},
    {"url": "https://b.example/y", "warc_ts": 1_600_000_060_000_000,
     "html": b"", "text": "bonjour tout le monde", "lang": "fr"},
    {"url": "https://c.example/z", "warc_ts": 1_600_000_120_000_000,
     "html": b"\x89PNG\r\n", "text": "grüß gott — ümläut",
     "lang": "de"},
    {"url": "https://a.example/x2", "warc_ts": 1_600_000_180_000_000,
     "html": b"<html/>", "text": "hola", "lang": "es"},
    {"url": "https://d.example/w", "warc_ts": 1_600_000_240_000_000,
     "html": bytes(range(256)), "text": "", "lang": "en"},
]


def main() -> None:
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    write_avro(FIXTURE, pages_avro_schema(), ROWS, codec="deflate",
               records_per_block=2)
    print(f"wrote {FIXTURE} ({os.path.getsize(FIXTURE)} bytes)")


if __name__ == "__main__":
    main()
