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
    """Arrow-batched feature extraction over binary payloads.

    The pandas UDF sees whole Arrow batches; per-element work is
    vectorizable where the decoder allows (the stub uses plain column
    ops for everything except the per-payload decode call, which is
    where a real codec slots in).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            dims = [
                _STUB_DECODERS[mt](p)["feature_dim"]
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "first_byte": pdf["payload"].map(
                    lambda b: b[0] if len(b) else -1),
                "feature_dim": dims,
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
