"""Versioned storage layout, per-slice lineage/metrics manifests, resume.

Reference model: ``IPersistentStreams`` names blobs
``{name}.{version}.{type}.parquet`` and a DAG update produces version
N+1 of every stage from version N (reference:
Parquet.Producers/IPersistentStreams.cs:10-17,
Parquet.Producers.TestCommand/PersistentStreams.cs:7-8, README.md:182).

Spark shape: a stage version is a directory
``{root}/{stage}/v={N}/{table}/`` holding parquet, plus
``{root}/{stage}/v={N}/_manifest/slice={K}.json`` — one JSON manifest
per completed *slice* (a driver-scheduled group of partitions). Each
manifest records lineage (input fingerprint, slice spec) and metrics
(rows, raw/encoded bytes, per-codec counts, elapsed) and is written
atomically (tmp + rename), so a killed run resumes by skipping exactly
the slices whose manifests exist — re-running a slice reproduces
identical bytes because all generation/encoding is deterministic.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_dir(root: str, stage: str, version: int, table: str = "") -> str:
    p = os.path.join(root, stage, f"v={version}")
    return os.path.join(p, table) if table else p


def atomic_write_json(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def manifest_path(root: str, stage: str, version: int, slice_id: int) -> str:
    return os.path.join(
        stage_dir(root, stage, version), "_manifest", f"slice={slice_id:05d}.json"
    )


def list_versions(root: str, stage: str) -> list[int]:
    d = os.path.join(root, stage)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=")[1]) for e in os.listdir(d) if e.startswith("v=")
    )


@dataclass
class SliceResult:
    slice_id: int
    skipped: bool
    metrics: dict


def encode_run(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    stage: str,
    version: int,
    sort_cols: list[str],
    slice_col: str | None = None,
    n_slices: int = 4,
    partitions_per_slice: int | None = None,
    cascade: bool = False,
    profile: str = "size",
    input_fingerprint: str = "",
) -> list[SliceResult]:
    """Checkpointed encode of ``df`` into the chunk-table format.

    The driver splits the keyspace into ``n_slices`` hash slices on
    ``slice_col`` (default: first sort col); each slice is one Spark
    write to ``.../chunks/slice={K}/`` followed by an atomic manifest.
    Resume = skip slices whose manifest already exists. On a real
    cluster a slice is thousands of tasks; slice granularity bounds
    re-work after a failure without driver-side bookkeeping per task.
    """
    from .encoder import encode_partitions

    slice_col = slice_col or sort_cols[0]
    out_dir = stage_dir(root, stage, version, "chunks")
    results: list[SliceResult] = []
    for k in range(n_slices):
        mpath = manifest_path(root, stage, version, k)
        if os.path.exists(mpath):
            with open(mpath) as f:
                results.append(SliceResult(k, True, json.load(f)["metrics"]))
            continue
        t0 = time.monotonic()
        part = df.filter(F.pmod(F.hash(F.col(slice_col)), F.lit(n_slices)) == k)
        chunks = encode_partitions(
            part, sort_cols=sort_cols,
            partitions=partitions_per_slice, cascade=cascade, profile=profile,
        )
        sdir = os.path.join(out_dir, f"slice={k}")
        (
            chunks.write.mode("overwrite")
            .option("compression", "none")  # our codecs own compression
            .parquet(sdir)
        )
        written = spark.read.parquet(sdir)
        tot = written.agg(
            F.sum(F.when(F.col("col_idx") == 0, F.col("n_rows")).otherwise(F.lit(0))
                  ).alias("rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        ).collect()[0]
        by_codec = {
            r.codec: int(r.enc) for r in written.groupBy("codec")
            .agg(F.sum("enc_bytes").alias("enc")).collect()
        }
        metrics = {
            "rows": int(tot.rows or 0),
            "raw_bytes": int(tot.raw_bytes or 0),
            "enc_bytes": int(tot.enc_bytes or 0),
            "by_codec": by_codec,
            "elapsed_s": round(time.monotonic() - t0, 3),
        }
        atomic_write_json(mpath, {
            "stage": stage, "version": version, "slice": k,
            "slice_of": n_slices, "slice_col": slice_col,
            "sort_cols": sort_cols, "input": input_fingerprint,
            "metrics": metrics,
        })
        results.append(SliceResult(k, False, metrics))
    return results


def read_chunks(spark: SparkSession, root: str, stage: str, version: int) -> DataFrame:
    return spark.read.parquet(stage_dir(root, stage, version, "chunks"))
