"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched
``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this environment):
``fake_decode_features`` derives deterministic pseudo-features from
the raw bytes so the Spark-side plumbing -- schema, batch iteration,
Arrow transfer, partition behavior -- is real and oracle-checkable.
Swap ``_decode_stub`` for PIL/librosa in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the decode/feature-extract stage. Width/height are
#: the "decoded" dimensions (deterministic fakes here).
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of an image decode: dimensions derived from
    byte length. Replace with a real decoder (PIL etc.) in production;
    raise NotImplementedError semantics are documented, not thrown, so
    the pipeline stays testable end-to-end."""
    n = len(payload)
    return 64 + n % 64, 64 + (n // 64) % 64


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text stand in
    for an image blob, plus typed metadata columns."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.
    One mapInPandas pass; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch. No driver collect,
    no per-row Python calls -- pandas vectorization inside the batch
    where possible, plain loop for the per-blob decode (decoders are
    per-item by nature)."""

    from ..shipping import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_hash": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODE_SCHEMA)
