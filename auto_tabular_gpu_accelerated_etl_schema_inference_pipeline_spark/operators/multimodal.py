"""Multimodal-column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` (north-star
surface; the fixtures have no real image/audio, so payloads are derived
from document text and REAL decode is stubbed — the Spark-side schema,
partitioning, UDF signature and batch shapes are real and tested).

Scale design (100 TB of blobs):
- Blobs stay opaque bytes in parquet; metadata (mime, size, checksum)
  are ordinary columns so filters/pruning never touch payloads.
- Feature extraction is mapInPandas: one Arrow batch of payloads in,
  one batch of features out — embarrassingly parallel, no shuffle; batch
  size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch so
  executor memory is payload-batch-bounded, not file-bounded.
- Real decoders (PIL / torchaudio / cv2) plug into ``decode_image`` /
  ``decode_audio`` below; in this container they raise
  NotImplementedError and the deterministic fake featurizer runs instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_for_oracle, load_table

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, checksum_prefix string, fake_embedding_0 double"
)


def decode_image(payload: bytes):
    """Real image decode would go here (PIL.Image.open). STUB: the
    container has no imaging libs."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError:
        raise NotImplementedError("image decode requires PIL; not in this container")
    raise NotImplementedError("wire PIL decode here when the lib is present")


def decode_audio(payload: bytes):
    """Real audio decode would go here (soundfile/torchaudio). STUB."""
    raise NotImplementedError("audio decode requires an audio lib; not in container")


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake featurizer over binary payloads: byte length,
    md5-prefix checksum, and one pseudo-embedding dim derived from the
    digest (stands in for a real model forward pass)."""
    for pdf in batches:
        payloads = pdf["payload"]
        digests = [hashlib.md5(p).hexdigest() for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "checksum_prefix": [d[:8] for d in digests],
                # first 8 hex chars -> [0, 1) float: deterministic fake
                "fake_embedding_0": [int(d[:8], 16) / 0xFFFFFFFF for d in digests],
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: payload = utf8 bytes of the text (the
    fixture stand-in for image/audio bytes) + typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime_type"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("payload_size"),
    )


def q_multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column featurization through mapInPandas (Arrow batches).
    Deterministic (md5-based), so fully oracle-checkable: DuckDB mirrors
    the arithmetic on the same utf8 bytes."""
    configure_for_oracle(spark)
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_binary_payload(docs)
    return blobs.mapInPandas(_featurize_batches, schema=FEATURE_SCHEMA)


QUERIES = {
    "multimodal_featurize": q_multimodal_featurize,
}

ORACLES = {
    "multimodal_featurize": """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  substr(md5(text), 1, 8) AS checksum_prefix,
  CAST(('0x' || substr(md5(text), 1, 8))::BIGINT AS DOUBLE) / 4294967295.0 AS fake_embedding_0
FROM documents
""",
}
