"""Multimodal column handling (north-star extension): opaque binary
payloads with typed metadata, decoded/feature-extracted via Arrow-batched
mapInPandas.

The container has no image/audio libraries, so the actual decoder is a
clearly-marked stub (deterministic fake derived from the payload bytes,
or PIL behind an import-try). What is REAL and tested: the Spark-side
plumbing — binary column construction, typed metadata schema, Arrow batch
iteration, partition-parallel UDF execution, and the metadata queries.
At 100 TB the binary payloads stay in executor-local Arrow batches; only
extracted scalar metadata ever reaches a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries import query
from .util import t

try:  # real decoder if an imaging library is ever present
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct.

    In production this column comes from spark.read.format('binaryFile')
    or a bytes column in parquet; here the documents' text bytes stand in
    as the payload so the plumbing is end-to-end testable.
    """
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5("text").alias("digest"),
        ).alias("meta"),
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: binary payload -> (width, height, format).

    STUB: without an imaging library, dimensions are a deterministic fake
    derived from the payload bytes (first/second byte + length) so tests
    have stable expectations. With PIL present this would be
    Image.open(io.BytesIO(buf)).size — the Arrow batch shape, schema and
    partition parallelism are identical either way.
    """
    for pdf in batches:
        if _HAVE_PIL:
            raise NotImplementedError(
                "real image decode intentionally not wired in this container; "
                "swap the fake branch for PIL Image.open when available"
            )
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.str.len().astype("int64"),
                "width": payloads.map(lambda b: 1 + b[0] % 64).astype("int32"),
                "height": payloads.map(lambda b: 1 + b[-1] % 64).astype("int32"),
                "format": payloads.map(
                    lambda b: "fake/rgb" if len(b) % 2 == 0 else "fake/gray"
                ),
            }
        )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text)                  AS digest,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extracted from the binary payload column (byte
    length + content digest) — pure JVM expressions, no decode needed."""
    docs = t(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs)
    return bin_df.select(
        "doc_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.digest").alias("digest"),
        F.col("meta.mime").alias("mime"),
    )


@query("multimodal_decode")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake decode over the binary column (rows-only: the
    stub's outputs are deterministic but not SQL-expressible; plumbing is
    asserted in tests/test_multimodal.py)."""
    docs = t(spark, sf_dir, "documents")
    bin_df = with_binary_payload(docs).select("doc_id", "payload")
    return bin_df.mapInPandas(decode_image_batch, DECODED_SCHEMA)
