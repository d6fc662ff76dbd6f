"""Snapshot-manifest table layout — the Iceberg-shaped input layer.

The north rule's input is an Iceberg table of source-code repos. The
Iceberg *library* isn't in this container, so this module implements
the load-bearing subset of its model natively (no formats borrowed,
just the architecture): a table is a directory of immutable parquet
data files plus a chain of JSON **snapshot manifests**; every commit
writes new data files and ONE new manifest listing the table's current
files — readers list the manifest, never the directory, so

* commits are atomic (the manifest appears or it doesn't),
* time travel = read an older snapshot id,
* appends/replaces never disturb concurrent readers,
* planning input = per-file row counts/sizes from the manifest.

All metadata goes through :class:`~..filestore.FileStore`, so the same
layout works on ``file://`` and object stores; data moves via Spark's
parquet reader given explicit file lists (an Iceberg-style
manifest-driven scan, not directory listing).

Scale note: a snapshot here is ONE JSON manifest — right up to millions
of files. At the 10^12-file north-rule extreme the file list itself is
big data; real Iceberg shards it into a manifest-list → manifest tree
and this layer would grow the same two-level split (manifest shards as
parquet, the snapshot pointing at shard files). The reader/committer
contracts (atomic pointer write, file-identity diff) are unchanged by
that split, which is why the flat form is used here.
"""

from __future__ import annotations

import posixpath
import time

from pyspark.sql import DataFrame, SparkSession

from ..filestore import FileStore, LocalStore


def _manifest_dir(table_dir: str) -> str:
    return posixpath.join(table_dir, "_snapshots")


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return posixpath.join(_manifest_dir(table_dir), f"s={snapshot_id:06d}.json")


def list_snapshots(table_dir: str, store: FileStore | None = None) -> list[int]:
    store = store or LocalStore()
    return sorted(
        int(e.split("=")[1].split(".")[0])
        for e in store.listdir(_manifest_dir(table_dir))
        if e.startswith("s=") and e.endswith(".json")
    )


def commit_snapshot(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    store: FileStore | None = None,
) -> int:
    """Write ``df``'s rows as new immutable data files + one manifest.

    ``mode='append'`` — new snapshot = previous files + new files;
    ``mode='replace'`` — new snapshot = new files only (logical
    overwrite; old files stay on disk for older snapshots).
    Returns the new snapshot id. The commit point is the atomic
    manifest write: a reader either sees the complete new snapshot or
    the previous one.
    """
    store = store or LocalStore()
    snaps = list_snapshots(table_dir, store)
    prev_files: list[dict] = []
    if snaps and mode == "append":
        prev_files = store.read_json(_manifest_path(table_dir, snaps[-1]))["files"]
    new_id = (snaps[-1] + 1) if snaps else 1

    data_dir = posixpath.join(table_dir, f"data/s={new_id:06d}")
    df.write.mode("overwrite").parquet(data_dir)
    listed = [
        e for e in store.listdir(data_dir)
        if e.endswith(".parquet") and not e.startswith(("_", "."))
    ]
    new_files = []
    for name in sorted(listed):
        path = posixpath.join(data_dir, name)
        new_files.append({"path": path})
    # per-file stats (rows/bytes) for planning, one scan of footers
    stats = {
        r["__f"]: (r["n"],) for r in
        spark.read.parquet(*[f["path"] for f in new_files])
        .selectExpr("input_file_name() AS __f").groupBy("__f").count()
        .withColumnRenamed("count", "n").collect()
    } if new_files else {}
    for f in new_files:
        # input_file_name returns a URI form; match by suffix
        n = next((v[0] for k, v in stats.items() if k.endswith(
            f["path"].split("/")[-1])), None)
        f["rows"] = int(n) if n is not None else None

    store.write_json_atomic(_manifest_path(table_dir, new_id), {
        "snapshot": new_id,
        "parent": snaps[-1] if snaps else None,
        "mode": mode,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "schema_ddl": ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields),
        "files": prev_files + new_files,
    })
    return new_id


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    store: FileStore | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Manifest-driven scan: read exactly the files the snapshot lists
    (never a directory listing). ``snapshot_id=None`` → latest.

    ``merge_schema=True`` is the add-column evolution path (Iceberg's
    schema evolution, scoped to additive changes): appended commits may
    carry files with NEW columns; the scan unions the file schemas and
    fills pre-evolution files with nulls — the standard parquet
    ``mergeSchema`` semantics, driven from the manifest's file list."""
    store = store or LocalStore()
    snaps = list_snapshots(table_dir, store)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    sid = snapshot_id if snapshot_id is not None else snaps[-1]
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in {snaps}")
    manifest = store.read_json(_manifest_path(table_dir, sid))
    paths = [f["path"] for f in manifest["files"]]
    if not paths:
        return spark.createDataFrame([], schema=manifest["schema_ddl"])
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    from_id: int,
    to_id: int | None = None,
    store: FileStore | None = None,
) -> DataFrame:
    """Incremental scan between snapshots (the Iceberg 'changed data'
    read): rows of the data files present in ``to_id`` but not in
    ``from_id``. For append-mode commits this is exactly the rows added
    after ``from_id`` — the natural feed for an incremental pipeline
    wave (`Pipeline.update` root updates): each wave consumes
    ``snapshot_diff(last_seen, latest)`` instead of rescanning the
    table. File identity (immutable paths), never row comparison — the
    diff plans from two manifests and reads only the new files."""
    store = store or LocalStore()
    old = {f["path"] for f in snapshot_files(table_dir, from_id, store)}
    to_manifest = store.read_json(_manifest_path(
        table_dir,
        to_id if to_id is not None
        else list_snapshots(table_dir, store)[-1]))
    new = [f["path"] for f in to_manifest["files"] if f["path"] not in old]
    if not new:
        return spark.createDataFrame([], schema=to_manifest["schema_ddl"])
    return spark.read.parquet(*new)


def snapshot_files(table_dir: str, snapshot_id: int | None = None,
                   store: FileStore | None = None) -> list[dict]:
    """The snapshot's file list with stats — planning input (e.g. feed
    the paths straight to ``encoder.encode_files`` for the direct-scan
    encode of a sorted corpus)."""
    store = store or LocalStore()
    snaps = list_snapshots(table_dir, store)
    sid = snapshot_id if snapshot_id is not None else snaps[-1]
    return store.read_json(_manifest_path(table_dir, sid))["files"]
