"""Multimodal column plumbing (SURVEY.md §2.F).

Treats media as opaque ``binary`` columns with typed metadata — the
pattern for image/audio/video at 100 TB: bytes travel as parquet
binary, metadata extraction runs in Arrow-batched ``mapInPandas``
(one Python interpreter round-trip per batch, never per row), and
heavy decode is partition-parallel.

The container has no image/audio libraries, so the decode step is a
clearly-marked STUB: ``decode_image_real`` raises
NotImplementedError unless PIL is importable, and the pipeline uses
``fake_decode_meta`` — a deterministic function of the bytes — so
the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and oracle-checkable end-to-end.

``mm_binary_meta`` synthesizes the binary column from documents.text
(utf-8 encode, JVM-side) — standing in for a real parquet binary
column — then runs the mapInPandas extractor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, "
    "width int, height int, fmt string"
)


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for image decode: metadata derived
    purely from the bytes (portable to the SQL oracle)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "content_md5": hashlib.md5(payload).hexdigest(),
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "fmt": ("png", "jpeg", "webp")[n % 3],
    }


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """STUB: real decode path, gated on an optional dependency."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container ships without media libs"
        ) from e


def extract_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per Arrow batch, vectorized-ish metadata
    extraction from the binary column. The signature (Iterator →
    Iterator) is the streaming-safe form: constant memory per task
    regardless of partition size."""
    for pdf in batches:
        metas = pdf["payload"].map(fake_decode_meta)
        out = pd.DataFrame(list(metas))
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → typed metadata via Arrow-batched mapInPandas."""
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(extract_meta_batches, schema=META_SCHEMA)


MM_BINARY_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INTEGER) AS height,
       CASE octet_length(encode(text)) % 3
            WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "mm_binary_meta": (mm_binary_meta, MM_BINARY_META_SQL),
}
