"""Scale-shape regression tests for the LLM-pipeline operators: the
banded simhash pair-finder must not plan a cartesian product, the
jaccard df-cap must bound candidate fan-out on a skewed corpus, the
multi-probe ANN must reach ≥0.9 recall vs the exact kNN, and the
preserve-id bootstrap must not route the dataset through a
single-partition exchange."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquet_producers_spark.functions.dedup import (
    jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from parquet_producers_spark.functions.similarity import (
    cosine_topk,
    lsh_ann_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_simhash_pairs_no_cartesian(spark, docs):
    sig = simhash(docs.limit(100), bits=16)
    pairs = simhash_near_pairs(sig, max_hamming=3, bits=16)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_simhash_pairs_match_bruteforce(spark, docs):
    """The pigeonhole banding is lossless: result == brute-force join."""
    sig = simhash(docs.filter(F.col("doc_id") < 120), bits=16)
    banded = {tuple(r) for r in
              simhash_near_pairs(sig, max_hamming=3, bits=16).collect()}
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        tuple(r) for r in
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                            ).alias("hamming"))
        .filter(F.col("hamming") <= 3).collect()
    }
    assert banded == brute and len(brute) > 0


def test_jaccard_df_cap_bounds_candidates(spark):
    """Skewed corpus: every doc shares one stop-shingle. Uncapped, the
    candidate set is all n² pairs; with max_df the hot shingle is pruned
    and only genuinely-similar docs pair up."""
    n = 60
    rows = [(i, f"the common words tok{i} tok{i} tok{i} tail{i % 3}")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = jaccard_pairs(df, threshold=0.01).count()
    capped = jaccard_pairs(df, threshold=0.01, max_df=10).count()
    assert uncapped == n * (n - 1) / 2      # stop-shingle joins everything
    assert capped == 0                       # nothing shares rare shingles
    # near-dup docs still pair up under the cap
    rows2 = rows + [(1000, rows[0][1])]      # exact dup of doc 0
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    dup_pairs = jaccard_pairs(df2, threshold=0.9, max_df=10).collect()
    assert [(r.doc_a, r.doc_b) for r in dup_pairs] == [(0, 1000)]


def test_ann_multiprobe_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probes, k=5)
    want = {(r.probe_id, r.nbr_id) for r in exact.collect()}
    got = {(r.probe_id, r.nbr_id)
           for r in lsh_ann_topk(emb, probes, k=5, bits=4,
                                 n_tables=4).collect()}
    recall = len(want & got) / len(want)
    single = {(r.probe_id, r.nbr_id)
              for r in lsh_ann_topk(emb, probes, k=5, bits=4,
                                    multi_probe=False).collect()}
    recall_single = len(want & single) / len(want)
    assert recall >= 0.9, (recall, recall_single)
    assert recall >= recall_single


def test_preserve_bootstrap_no_single_partition_exchange(spark):
    """Bootstrapping a preserve_col stage routes every TK through the id
    assigner; the content plan must not contain a SinglePartition
    exchange (the old dense_rank-over-global-window scale-killer)."""
    from parquet_producers_spark.operators.produce import (
        Stage,
        bootstrap_stage,
    )

    def gen(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"word": pdf["w"], "wid": [0] * len(pdf)})

    stage = Stage(
        name="p", sk_cols=["sk"], tk_cols=["word"], value_cols=["wid"],
        produce=gen, out_ddl="word string, wid int", preserve_col="wid",
    )
    upd = spark.createDataFrame(
        [("Add", i, f"w{i % 37}") for i in range(300)],
        "type string, sk int, w string")
    content, _m, _u = bootstrap_stage(spark, stage, upd)
    # single-partition exchanges are only allowed under a scalar
    # aggregate (max prev id — one row per partition, then one row);
    # the data path (window/sort over TKs) must never collapse to one
    plan_lines = _plan(content).splitlines()
    for i, line in enumerate(plan_lines):
        if "Exchange SinglePartition" in line:
            assert "HashAggregate" in plan_lines[i - 1], \
                "\n".join(plan_lines[max(0, i - 3):i + 1])
    # ids are the rank of the word in global key order, 1-based
    ids = {r.word: r.wid for r in content.select("word", "wid")
           .distinct().collect()}
    ordered = sorted(ids)
    assert [ids[w] for w in ordered] == list(range(1, len(ordered) + 1))


def test_preserve_cols_and_merge_hooks(spark):
    """General PreserveKeyValues: multi-column inheritance and the
    arbitrary pandas merge hook (reference ParquetProducerOptions.cs
    passes the whole previous value to user code)."""
    from parquet_producers_spark.operators.produce import (
        Stage,
        bootstrap_stage,
        update_stage,
    )

    def gen(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "word": pdf["w"], "label": ["fresh"] * len(pdf),
            "n_seen": [1] * len(pdf),
        })

    # inheritance: existing TKs keep their previous label verbatim
    stage = Stage(
        name="inh", sk_cols=["sk"], tk_cols=["word"],
        value_cols=["label", "n_seen"], produce=gen,
        out_ddl="word string, label string, n_seen int",
        preserve_cols=["label"],
    )
    boot = spark.createDataFrame(
        [("Add", 1, "dog"), ("Add", 2, "cat")], "type string, sk int, w string")
    c0, m0, _ = bootstrap_stage(spark, stage, boot)
    c0 = spark.createDataFrame(c0.toPandas(), schema=c0.schema)
    m0 = spark.createDataFrame(m0.toPandas(), schema=m0.schema)
    wave = spark.createDataFrame(
        [("Update", 1, "dog"), ("Update", 1, "bird")],
        "type string, sk int, w string")
    c1, _, _ = update_stage(stage, c0, m0, wave)
    got = {r.word: r.label for r in c1.collect()}
    assert got == {"dog": "fresh", "cat": "fresh", "bird": "fresh"}

    # merge hook: arbitrary logic over (produced row, previous value)
    def bump(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        prev = pdf["__prev_n_seen"]
        pdf["n_seen"] = (prev.fillna(0) + 1).astype("int32")
        pdf["label"] = pdf["__prev_label"].fillna(pdf["label"])
        return pdf

    stage2 = Stage(
        name="mrg", sk_cols=["sk"], tk_cols=["word"],
        value_cols=["label", "n_seen"], produce=gen,
        out_ddl="word string, label string, n_seen int",
        preserve_merge=bump,
    )
    c0, m0, _ = bootstrap_stage(spark, stage2, boot)
    c0 = spark.createDataFrame(c0.toPandas(), schema=c0.schema)
    m0 = spark.createDataFrame(m0.toPandas(), schema=m0.schema)
    c1, _, _ = update_stage(stage2, c0, m0, wave)
    got = {r.word: (r.label, r.n_seen) for r in c1.collect()}
    assert got == {"dog": ("fresh", 2), "cat": ("fresh", 1),
                   "bird": ("fresh", 1)}


def test_ivf_recall_and_determinism(spark, sf_dir):
    """IVF ANN: recall vs exact kNN at n_probe=2 of 8 clusters, and
    assignment determinism across two evaluations."""
    from parquet_producers_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    want = {(r.probe_id, r.nbr_id)
            for r in cosine_topk(emb, probes, k=5).collect()}
    got = {(r.probe_id, r.nbr_id)
           for r in ivf_topk(emb, probes, k=5, n_centroids=8,
                             iters=2, n_probe=2).collect()}
    recall = len(want & got) / len(want)
    # 2/8 clusters probed ≈ 25% of a near-random corpus scanned; the
    # top-1 neighbor is usually co-clustered — expect mid recall here,
    # exact shape on clustered real embeddings
    assert recall >= 0.3, recall
    _c, a1 = ivf_assign(emb, n_centroids=8, iters=2)
    _c, a2 = ivf_assign(emb, n_centroids=8, iters=2)
    m1 = {r["__id"]: r["cl"] for r in a1.collect()}
    m2 = {r["__id"]: r["cl"] for r in a2.collect()}
    assert m1 == m2 and len(set(m1.values())) > 1


def test_mega_repo_skew_splits_across_partitions(spark):
    """North-rule skew handling: range partitioning on (repo, path)
    splits a zipf mega-repo across partitions instead of funneling it
    through one task (the partitioner defuses the skew; no single
    partition holds a dominant share of the rows)."""
    from parquet_producers_spark.datagen import source_code_df

    src = source_code_df(spark, 20000, seed=21, partitions=8)
    top = (src.groupBy("repo").count().orderBy(F.desc("count"))
           .limit(1).collect()[0])
    assert top["count"] > 20000 / 8  # the corpus IS skewed
    parted = (
        src.repartitionByRange(8, "repo", "path")
        .withColumn("__pid", F.spark_partition_id())
    )
    spread = (
        parted.filter(F.col("repo") == top["repo"])
        .select("__pid").distinct().count()
    )
    assert spread >= 2, f"mega-repo {top['repo']} landed in one partition"
    sizes = [r["n"] for r in parted.groupBy("__pid")
             .agg(F.count("*").alias("n")).collect()]
    assert max(sizes) < 2.0 * (sum(sizes) / len(sizes))


def test_range_join_empty_left_skips_explode(spark):
    """Empty left side: __lmin/__lmax are null and greatest/least skip
    nulls — the guard must short-circuit the bin explode instead of
    materializing the unclamped open-ended interval (here ~1e12 bins,
    which would throw/OOM on the sequence build)."""
    from parquet_producers_spark.operators.joins import range_join_binned

    left = spark.createDataFrame([], "v double")
    right = spark.createDataFrame([(0.0, 1.0e12)], "lo double, hi double")
    out = range_join_binned(left, right, "v", "lo", "hi", bin_width=1.0)
    assert out.count() == 0


def test_embedding_pairs_bucketed_no_cartesian(spark, sf_dir):
    """The bucketed embedding pair-finder must candidate via the
    (tbl, bucket) equi-join — never a cartesian/nested-loop join."""
    from parquet_producers_spark.functions.similarity import (
        embedding_near_pairs_bucketed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_pairs_bucketed(emb, threshold=0.3, bits=4,
                                          n_tables=4)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_embedding_pairs_bucketed_matches_bruteforce_at_gate_params(
        spark, sf_dir):
    """At the driver query's params (bits=4, L=16, Hamming-1 probe) the
    bucketed result equals brute force on the gate data — this is what
    licenses the brute-force SQL oracle for
    dedup_embedding_pairs_bucketed."""
    from parquet_producers_spark.functions.similarity import (
        embedding_near_pairs,
        embedding_near_pairs_bucketed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter(F.col("vec_id") < 500)
    brute = {tuple(r) for r in
             embedding_near_pairs(emb, threshold=0.3).collect()}
    bucketed = {tuple(r) for r in
                embedding_near_pairs_bucketed(
                    emb, threshold=0.3, bits=4, n_tables=16).collect()}
    assert bucketed == brute and len(brute) > 100


def test_embedding_pairs_bucketed_planted_neardups(spark):
    """Production shape: at a real near-dup threshold (cosine ≥ 0.9),
    narrow params find every planted near-dup while examining only a
    small fraction of the cartesian (the pruning that matters at
    100 TB; the gate data has no true near-dups, so this plants some)."""
    import numpy as np

    from parquet_producers_spark.functions.similarity import (
        embedding_near_pairs_bucketed,
        hyperplanes,
    )

    rng = np.random.default_rng(42)
    n_base, dim = 200, 64
    base = rng.normal(size=(n_base, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i % 4 == 0:  # plant a near-dup: tiny perturbation
            rows.append((10_000 + i,
                         [float(x) for x in v + rng.normal(scale=0.02,
                                                           size=dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_near_pairs_bucketed(
        df, threshold=0.9, bits=10, n_tables=8).collect()
    want = {(i, 10_000 + i) for i in range(0, n_base, 4)}
    found = {(r.doc_a, r.doc_b) for r in got}
    assert want <= found  # every planted near-dup recovered
    # and the candidate set actually pruned: count candidates examined
    E = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    sigs = []
    for t in range(8):
        P = np.array(hyperplanes(dim, 10, seed=7 + 131 * t))
        sigs.append(((E @ P.T) >= 0).astype(np.uint64)
                    @ (1 << np.arange(10, dtype=np.uint64)))
    iu = np.triu_indices(len(ids), 1)
    cand = np.zeros(len(iu[0]), dtype=bool)
    for sig in sigs:
        x = sig[iu[0]] ^ sig[iu[1]]
        ham = np.zeros(len(x), dtype=int)
        v = x.copy()
        while v.any():
            ham += (v & 1).astype(int)
            v >>= 1
        cand |= ham <= 1
    assert cand.mean() < 0.15  # >6x pruning vs the cartesian


def test_connected_components_chain_and_singletons(spark):
    """Min-label propagation: a 5-vertex chain (diameter 4 — forces
    multiple rounds), a 2-clique, and isolated vertices all resolve to
    min-id components."""
    from parquet_producers_spark.functions.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-2-3-4-5
         (10, 11)],                         # clique {10,11}
        "doc_a long, doc_b long")
    verts = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 4, 5, 10, 11, 99]], "doc_id long")
    got = {(r.doc_id, r.component_id) for r in
           connected_components(pairs, vertices=verts).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
            (10, 10), (11, 10), (99, 99)}
    assert got == want


def test_decontaminate_no_cartesian(spark, docs):
    """Contamination scoring is an equi-join of corpus shingles against
    the distinct benchmark shingle set — never a doc×bench cartesian."""
    from parquet_producers_spark.functions.dedup import contamination_scores

    d = docs.select("doc_id", "text").limit(200)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    plan = _plan(contamination_scores(d, bench))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sequence_pack_window_is_sharded(spark, docs):
    """The packing window must be partitioned by (lang, shard) — a
    corpus-wide SinglePartition window is the classic packing scale
    trap."""
    from parquet_producers_spark.functions.splits import sequence_pack

    d = docs.select("doc_id", "lang", "text")
    plan = _plan(sequence_pack(d, budget=2048, n_shards=8))
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            raise AssertionError(f"corpus-wide window exchange:\n{plan}")
    assert "Window" in plan


def test_repetition_stats_no_shuffle(spark, docs):
    """Repetition metrics are pure per-row array expressions — the plan
    must contain NO Exchange at all (the explode→groupBy alternative
    shuffles one row per word occurrence)."""
    from parquet_producers_spark.functions.text import repetition_stats

    plan = _plan(repetition_stats(docs.select("doc_id", "text")))
    assert "Exchange" not in plan, plan
