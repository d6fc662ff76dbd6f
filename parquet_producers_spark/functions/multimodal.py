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


def _stub_resize(payload: bytes, th: int, tw: int) -> bytes:
    """STUB: a real deployment decodes, resamples (PIL/libvips) and
    re-encodes here. Deterministic fake with the real op's shape: the
    'resized' image is the payload truncated to th*tw bytes."""
    return payload[: th * tw]


def resize_images(media: DataFrame, th: int = 32, tw: int = 32) -> DataFrame:
    """Image resize plumbing: Arrow-batched pandas UDF over image rows.

    One row in → one row out with the resized payload + new dims; the
    kernel is :func:`_stub_resize` (swap in a real decoder+resampler
    without touching the Spark plumbing). Non-image rows pass through
    untouched with null dims.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image/png"
            resized = [
                _stub_resize(p, th, tw) if img else p
                for img, p in zip(is_img, pdf["payload"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "out_h": [th if i else None for i in is_img],
                "out_w": [tw if i else None for i in is_img],
                "payload": resized,
                "n_bytes": [len(p) for p in resized],
            })

    return media.mapInPandas(
        run,
        schema=("doc_id long, media_type string, out_h int, out_w int,"
                " payload binary, n_bytes long"),
    )


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every: int = 2) -> DataFrame:
    """Frame sampling plumbing: one payload row → one row per sampled
    fixed-width frame (every ``every``-th frame of ``frame_bytes``
    bytes). The Arrow-batched UDF is where a real container demuxer
    (ffmpeg) slots in; the fixed-byte framing is the deterministic
    stand-in. Emits the frame bytes plus an md5 so the DuckDB oracle
    can verify the batch shape AND content byte-for-byte."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mts, idxs, frames, lens, md5s = [], [], [], [], [], []
            for doc_id, mt, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    fr = payload[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(doc_id)
                    mts.append(mt)
                    idxs.append(i)
                    frames.append(fr)
                    lens.append(len(fr))
                    md5s.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame({
                "doc_id": ids, "media_type": mts, "frame_idx": idxs,
                "frame": frames, "frame_len": lens, "frame_md5": md5s,
            })

    return media.mapInPandas(
        run,
        schema=("doc_id long, media_type string, frame_idx int,"
                " frame binary, frame_len int, frame_md5 string"),
    )


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
