"""Deduplication operators: exact, n-gram Jaccard, MinHash(+LSH), SimHash.

Shapes chosen for 100 TB scale:

* exact — one hash-groupBy; partial aggregation map-side, no row data
  shuffled beyond (hash, count);
* n-gram Jaccard — shingle explode + self-join on shingle. Hot
  shingles are the skew hazard: the candidate generator caps per-
  shingle fan-out via a distinct-pair pre-aggregation, and production
  use at scale goes through MinHash-LSH instead (this is the exact
  verifier);
* MinHash — H portable md5-derived hash functions, min per hash over
  token shingles; LSH bands group signatures into bucket keys so the
  candidate join is an equi-join on (band, bucket) — linear, no n²;
* SimHash — B-bit signature from per-token hashes; near-dup iff
  hamming distance ≤ r (bit_count(xor)).

All arithmetic is md5-based and deliberately reproducible in ANSI SQL
(functions.text.portable_hash64) so the DuckDB oracle can verify
Spark results value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import portable_hash64

MINHASH_H = 8          # hash functions in a signature
LSH_BANDS = 4          # bands (H/BANDS rows per band)
SIMHASH_BITS = 16


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, min_doc)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_dups") > 1)
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, shingle)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def jaccard_pairs(
    df: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold)."""
    sh = word_shingles(df, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 3, h: int = MINHASH_H
) -> DataFrame:
    """(doc_id, mh_0..mh_{h-1}) min-hash signature over word shingles."""
    sh = word_shingles(df, text_col, k)
    aggs = [
        F.min(portable_hash64(F.col("shingle"), seed)).alias(f"mh_{seed}")
        for seed in range(h)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, h: int = MINHASH_H, bands: int = LSH_BANDS
) -> DataFrame:
    """Candidate pairs from banded LSH: equi-join on (band, bucket)."""
    rows = h // bands
    bucket_frames = []
    for band in range(bands):
        cols = [F.col(f"mh_{band * rows + r}") for r in range(rows)]
        bucket = F.md5(F.concat_ws("_", F.lit(band), *[c.cast("string") for c in cols]))
        bucket_frames.append(
            signatures.select("doc_id", F.lit(band).alias("band"),
                              bucket.alias("bucket"))
        )
    buckets = bucket_frames[0]
    for bf in bucket_frames[1:]:
        buckets = buckets.unionByName(bf)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — B-bit signature from distinct-token hashes."""
    toks = df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).filter(F.length("tok") > 0)
    toks = toks.withColumn("th", portable_hash64(F.col("tok"), 99))
    bit_sums = toks.groupBy("doc_id").agg(*[
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1,
                   1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ])
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return bit_sums.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance (exact verifier shape;
    at scale candidates come from bucketing on signature prefixes)."""
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"), "hamming")
    )
