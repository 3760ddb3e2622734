"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are ``binary`` columns; decode / feature-extraction run as
Arrow-batched kernels over ``mapInPandas``. Real media libs are absent in
this container, so the decoders are STUBBED (``NotImplementedError`` behind
``use_real_decoder``) with a deterministic fake (byte histogram + entropy) —
the Spark-side plumbing (schema, batching, UDF signature, partition shape) is
real and tested.

The reference degrades binary to hex strings
(HdfsSerDeImportService.java:330-331); here binary stays binary end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "url string, n_bytes long, magic string, entropy double, "
    "mean_byte double, feature array<float>"
)


def html_metadata(pages: DataFrame) -> DataFrame:
    """Typed metadata over the opaque html column — pure built-ins
    (octet_length, magic-byte probe via substring compare)."""
    magic = F.when(
        F.substring(F.col("html").cast("string"), 1, 9) == "<!DOCTYPE", "html"
    ).otherwise("unknown")
    return pages.select(
        "url",
        F.octet_length("html").alias("n_bytes"),
        magic.alias("magic"),
    )


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for a real image decode (PIL/libjpeg not in container)."""
    raise NotImplementedError(
        "real media decode requires an image library not present in this "
        "container; use use_real_decoder=False for the deterministic fake"
    )


def extract_features(
    pages: DataFrame, use_real_decoder: bool = False, feature_dim: int = 16
) -> DataFrame:
    """Binary -> feature vector via an Arrow-batched mapInPandas kernel.

    The fake featurizer (byte histogram folded to ``feature_dim`` + entropy)
    is deterministic, so tests pin exact values; swapping in a real decoder
    changes only the inner function, not the Spark plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            payloads = pdf["html"]
            urls = pdf["url"]
            # vectorized over the batch: concatenate, histogram per row
            for url, payload in zip(urls, payloads):
                if use_real_decoder:
                    decode_image_stub(payload)
                b = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                p = hist / max(1, len(b))
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                folded = hist.reshape(feature_dim, -1).sum(axis=1)
                feat = (folded / max(1.0, folded.sum())).astype(np.float32)
                out_rows.append(
                    {
                        "url": url,
                        "n_bytes": len(b),
                        "magic": "html" if payload[:9] == b"<!DOCTYPE" else "unknown",
                        "entropy": round(entropy, 6),
                        "mean_byte": round(float(b.mean()) if len(b) else 0.0, 6),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(out_rows)

    return pages.select("url", "html").mapInPandas(kernel, FEATURE_SCHEMA)


def multimodal_features_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: deterministic pages -> binary feature extract
    (rows-only check; the media decode itself is stubbed)."""
    from ..sources.pages import synthesize_pages

    pages = synthesize_pages(spark, n_docs=500, seed=42)
    return extract_features(pages).select(
        "url", "n_bytes", "magic", F.round("entropy", 4).alias("entropy4")
    ).orderBy("url")
