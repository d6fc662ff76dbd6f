"""Storage-seam tests: the versioning/manifest/resume protocol must run
through the FileStore abstraction (reference IPersistentStreams) — here
exercised with HadoopStore on file:// URIs, the same code path an
object-store deployment uses — plus the per-column content sort order
(reference Comparers.Reverse: wordcount content stored count-DESC)."""

from __future__ import annotations

import hashlib

import pandas as pd

from parquet_producers_spark.datagen import source_code_df
from parquet_producers_spark.encoder import decode_chunks
from parquet_producers_spark.filestore import HadoopStore, LocalStore
from parquet_producers_spark.operators.produce import Stage
from parquet_producers_spark.plans.dag import Pipeline
from parquet_producers_spark.storage import (
    encode_run,
    manifest_path,
    read_chunks,
)


def _digest(df) -> str:
    rows = df.orderBy("repo", "path").collect()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.repo.encode())
        h.update(r.path.encode())
        h.update(r.content.encode())
    return h.hexdigest()


def test_hadoop_store_roundtrip(spark, tmp_path):
    store = HadoopStore(spark)
    p = f"file://{tmp_path}/sub/x.json"
    assert not store.exists(p)
    store.write_json_atomic(p, {"a": 1, "b": [2, 3]})
    assert store.exists(p)
    assert store.read_json(p) == {"a": 1, "b": [2, 3]}
    assert store.listdir(f"file://{tmp_path}/sub") == ["x.json"]
    assert store.listdir(f"file://{tmp_path}/missing") == []
    store.write_json_atomic(p, {"a": 2})  # overwrite via tmp+rename
    assert store.read_json(p) == {"a": 2}
    store.delete(p)
    assert not store.exists(p)


def test_encode_run_resume_through_hadoop_store(spark, tmp_path):
    """encode_run's slice/manifest/resume protocol on a file:// URI root
    with all metadata via the Hadoop FileSystem — the object-store path."""
    store = HadoopStore(spark)
    root = f"file://{tmp_path}"
    src = source_code_df(spark, 600, seed=11, partitions=3).cache()

    res1 = encode_run(spark, src, root, "code", version=1,
                      sort_cols=["repo", "path"], n_slices=3, store=store)
    assert [r.skipped for r in res1] == [False, False, False]
    assert sum(r.metrics["rows"] for r in res1) == 600
    d1 = _digest(decode_chunks(read_chunks(spark, root, "code", 1)))

    store.delete(manifest_path(root, "code", 1, 1))
    res2 = encode_run(spark, src, root, "code", version=1,
                      sort_cols=["repo", "path"], n_slices=3, store=store)
    assert [r.skipped for r in res2] == [True, False, True]
    d2 = _digest(decode_chunks(read_chunks(spark, root, "code", 1)))
    assert d1 == d2 == _digest(src)
    src.unpersist()


def _identity(key, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"id": [int(key[0])] * len(pdf), "text": pdf["text"]})


def _split_words(key, pdf: pd.DataFrame) -> pd.DataFrame:
    words = []
    for t in pdf["text"]:
        words.extend(t.split(" "))
    return pd.DataFrame({"word": words, "val_id": [int(key[0])] * len(words)})


def _count_words(key, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"cnt": [len(pdf)], "w": [key[0]]})


def test_pipeline_through_hadoop_store(spark, tmp_path):
    p = Pipeline(spark, f"file://{tmp_path}", store=HadoopStore(spark))
    p.add(Stage("phrases", ["src_id"], ["id"], ["text"], _identity,
                "id int, text string"))
    v1 = p.update({"phrases": spark.createDataFrame(
        [("Add", 1, "hello world")], "type string, src_id int, text string")})
    assert v1 == 1 and p.version("phrases") == 1
    v2 = p.update({"phrases": spark.createDataFrame(
        [("Update", 1, "hello again")], "type string, src_id int, text string")})
    assert v2 == 2
    assert [(r.id, r.text) for r in p.content("phrases", 2).collect()] == [
        (1, "hello again")]


def test_content_sort_descending_at_rest(spark, tmp_path):
    """Reference ParquetProductionTests.cs:317: wordCounts content is
    PERSISTED ordered by count descending (Comparers.Reverse). The
    stored parquet must come back in that order without re-sorting."""
    p = Pipeline(spark, str(tmp_path))
    p.add(Stage("phrases", ["src_id"], ["id"], ["text"], _identity,
                "id int, text string"))
    p.add(Stage("ids_by_word", ["id"], ["word"], ["val_id"], _split_words,
                "word string, val_id int"), sources=["phrases"])
    p.add(Stage("word_counts", ["word"], ["cnt"], ["w"], _count_words,
                "cnt int, w string",
                content_sort=[("cnt", "desc"), ("w", "asc")]),
          sources=["ids_by_word"])
    p.update({"phrases": spark.createDataFrame(
        [("Add", 1, "the quick brown fox"),
         ("Add", 2, "jumps over the lazy dog"),
         ("Add", 3, "sometimes a dog is brown")],
        "type string, src_id int, text string")})
    # at-rest order = range-partitioned files in name order, each file
    # internally sorted (Spark's scan reorders splits by size, so read
    # the part files individually to observe the stored order)
    import glob
    import os

    from parquet_producers_spark.storage import stage_dir

    cdir = stage_dir(str(tmp_path), "word_counts", 1, "content")
    stored = []
    for f in sorted(glob.glob(os.path.join(cdir, "part-*.parquet"))):
        stored += [(r.cnt, r.w) for r in
                   spark.read.parquet(f).select("cnt", "w").collect()]
    assert stored == sorted(stored, key=lambda t: (-t[0], t[1]))
    assert stored[0][0] == max(c for c, _ in stored)  # 'the'/'brown'/'dog' first


def test_local_store_matches_hadoop_store(spark, tmp_path):
    """Same protocol, two stores: listing/exists semantics agree."""
    local, hadoop = LocalStore(), HadoopStore(spark)
    lp = str(tmp_path / "a" / "f.json")
    local.write_json_atomic(lp, {"k": 1})
    assert hadoop.exists(f"file://{lp}")
    assert hadoop.read_json(f"file://{lp}") == {"k": 1}
    assert sorted(local.listdir(str(tmp_path / "a"))) == \
        sorted(hadoop.listdir(f"file://{tmp_path}/a"))


def test_empty_upload_deletes_blob(spark, tmp_path):
    """Reference IPersistentStreams.cs:14-17: uploading empty content
    deletes the blob — absent blob == empty stream. Both stores."""
    local = LocalStore()
    p1 = str(tmp_path / "a" / "m.json")
    local.write_bytes_atomic(p1, b"x")
    assert local.exists(p1)
    local.write_bytes_atomic(p1, b"")
    assert not local.exists(p1)
    local.write_bytes_atomic(p1, b"")  # idempotent on absent blob

    hadoop = HadoopStore(spark)
    p2 = f"file://{tmp_path}/b/m.json"
    hadoop.write_bytes_atomic(p2, b"x")
    assert hadoop.exists(p2)
    hadoop.write_bytes_atomic(p2, b"")
    assert not hadoop.exists(p2)
    hadoop.write_bytes_atomic(p2, b"")


def test_wave_emptying_stage_leaves_no_stale_rows(spark, tmp_path):
    """A wave that deletes every source key empties the stage's content;
    the new version's content dir must carry zero data rows (no stale
    part files from the produce of earlier versions)."""
    import glob

    import pyarrow.parquet as pq

    from parquet_producers_spark.operators.produce import Stage
    from parquet_producers_spark.plans.dag import Pipeline
    from parquet_producers_spark.storage import stage_dir

    def identity(key, pdf):
        import pandas as pd

        return pd.DataFrame(
            {"id": [int(key[0])] * len(pdf), "text": pdf["text"]})

    p = Pipeline(spark, str(tmp_path / "dag"))
    p.add(Stage("docs", ["src_id"], ["id"], ["text"], identity,
                "id int, text string"))
    p.update({"docs": spark.createDataFrame(
        [("Add", 1, "hello")], "type string, src_id int, text string")})
    v = p.update({"docs": spark.createDataFrame(
        [("Delete", 1, None)], "type string, src_id int, text string")})
    assert p.content("docs", v).count() == 0
    cdir = stage_dir(str(tmp_path / "dag"), "docs", v, "content")
    data_rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{cdir}/*.parquet"))
    assert data_rows == 0
    # the CDC stream announced the delete downstream
    assert [r.type for r in p.updates_out("docs", v).collect()] == ["Delete"]
