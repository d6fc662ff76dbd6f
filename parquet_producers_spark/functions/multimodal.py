"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas``. The actual media
codecs are NOT in this container, so the decode kernel is a clearly
marked deterministic stub (`_STUB_DECODERS`) — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested,
and swapping a real decoder in changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, meta_n_bytes long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, first_byte int,"
    " feature_dim int, checksum string"
)


def synthesize_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as a fake opaque binary payload (deterministic:
    utf-8 bytes). Stands in for real image/audio blobs in tests."""
    return df.select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav")).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("meta_n_bytes"),
    )


def _stub_decode_image(payload: bytes) -> dict:
    """STUB: a real deployment calls PIL/libvips here.

    Deterministic fake: 'decodes' to a feature of dim = n_bytes % 64.
    """
    return {"feature_dim": len(payload) % 64}


def _stub_decode_audio(payload: bytes) -> dict:
    """STUB: a real deployment calls soundfile/ffmpeg here."""
    return {"feature_dim": len(payload) % 128}


_STUB_DECODERS = {"image/png": _stub_decode_image, "audio/wav": _stub_decode_audio}


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads.

    Everything expressible as a JVM expression stays JVM-side (whole-
    stage codegen): byte length via ``octet_length``, first byte via
    ``hex(substring)``, checksum via ``sha2`` — no per-row Python for
    metadata. Only the decode call (where a real media codec slots in)
    crosses into an Arrow-batched pandas UDF, and the payload crosses
    INTO Python once but never back out (the UDF returns just the
    decoded feature columns alongside the pass-through metadata).
    """
    p = F.col("payload")
    enriched = media.select(
        "doc_id", "media_type", "payload",
        F.octet_length(p).alias("n_bytes"),
        F.when(F.octet_length(p) > 0,
               F.conv(F.hex(F.substring(p, 1, 1)), 16, 10).cast("int"))
        .otherwise(F.lit(-1)).alias("first_byte"),
        F.sha2(p, 256).alias("checksum"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _STUB_DECODERS[mt](p)["feature_dim"]
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pdf.drop(columns=["payload"])
            out["feature_dim"] = dims
            yield out[["doc_id", "media_type", "n_bytes", "first_byte",
                       "feature_dim", "checksum"]]

    return enriched.mapInPandas(run, schema=FEATURE_SCHEMA)
