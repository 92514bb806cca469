"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio libraries, so the *decode* step is stubbed
(``decode_image`` raises NotImplementedError unless PIL is importable) — but
the Spark-side plumbing is real and oracle-checked: schema (binary + struct
metadata), batch shape, deterministic feature extraction (byte length, md5,
synthetic width/height). At 100 TB the pattern is: binary column stays
columnar in parquet, features extract in one mapInPandas pass, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_blobs(docs: DataFrame) -> DataFrame:
    """documents → multimodal rows: payload = utf-8 bytes of text (a stand-in
    for image bytes), metadata struct derived deterministically."""
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """The genuinely-multimodal step — stubbed per environment constraints."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decode requires PIL; container provides none (stub per driver brief)"
        ) from exc
    raise NotImplementedError("real decode path not exercised in this environment")


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
            })

    return blobs.mapInPandas(
        run, "doc_id bigint, byte_len bigint, payload_md5 string, width int, height int"
    )


def multimodal_features(docs: DataFrame) -> DataFrame:
    return extract_features(pack_blobs(docs))


# the features are deterministic functions of the text → SQL-checkable
MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS payload_md5,
       CAST(n_chars % 640 AS INT) AS width,
       CAST(n_chars % 480 AS INT) AS height
FROM documents
"""
