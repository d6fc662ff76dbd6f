"""Deduplication operators: exact, n-gram Jaccard, MinHash(+LSH), SimHash.

Shapes chosen for 100 TB scale:

* exact — one hash-groupBy; partial aggregation map-side, no row data
  shuffled beyond (hash, count);
* n-gram Jaccard — shingle explode + self-join on shingle. Hot
  shingles are the skew hazard: ``max_df`` document-frequency pruning
  drops shingles shared by more than ``max_df`` documents before the
  self-join (standard df-pruning — stop-shingles like "the quick" carry
  no near-dup signal but quadratic join cost), bounding per-shingle
  fan-out to ``max_df²``. Production use at scale goes through
  MinHash-LSH instead (this is the exact verifier);
* MinHash — H portable md5-derived hash functions, min per hash over
  token shingles; LSH bands group signatures into bucket keys so the
  candidate join is an equi-join on (band, bucket) — linear, no n²;
  the signature frame is scanned ONCE (bands exploded from an array,
  not unioned per band);
* SimHash — B-bit signature from per-token hashes; near-dup iff
  hamming distance ≤ r (bit_count(xor)). Pair finding is banded by the
  pigeonhole principle: split B bits into r+1 disjoint segments — any
  pair within hamming r agrees exactly on ≥1 segment — so candidates
  come from an equi-join on (segment_idx, segment_bits), then the
  exact hamming filter runs on candidates only. No cartesian, and no
  false negatives: the result equals the brute-force join.

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


def shingle_array(toks, k: int = 3):
    """Array of distinct non-empty k-word shingles for a token-array
    column — THE shingle definition every Spark site shares (and the
    `_SHINGLES_SQL` oracle CTE mirrors), so engines can never drift on
    degenerate docs."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.filter(
        F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))),
        lambda s: F.length(s) > 0,
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, shingle).

    Arrow-batched Python kernel rather than the former
    ``explode(shingle_array(...))``: the split → transform(slice) →
    array_distinct → filter higher-order chain runs interpreted per
    element and measured 2.1× slower than this per-batch loop on the
    same data (guide §4.2 — hand whole batches to native/py code when
    the JVM path is interpreted HOFs, not codegen). Output rows are
    identical (same distinct-per-doc set, same degenerate-doc handling:
    ``" ".join`` of a short tail == ``concat_ws`` over a short slice,
    empty shingles dropped, null text produces no rows); only row
    order within a task differs, and every consumer is
    order-insensitive (min-aggs, groupBys, joins)."""
    import pyarrow as pa

    id_type = df.schema[
        "doc_id"].dataType.simpleString()

    def gen(batches):
        for b in batches:
            ids_out: list = []
            sh_out: list = []
            for did, txt in zip(b.column("doc_id").to_pylist(),
                                b.column(text_col).to_pylist()):
                if txt is None:
                    continue
                tk = txt.split(" ")
                seen = set()
                for i in range(max(len(tk) - k, 0) + 1):
                    s = " ".join(tk[i:i + k])
                    if s and s not in seen:
                        seen.add(s)
                        ids_out.append(did)
                        sh_out.append(s)
            yield pa.record_batch(
                [pa.array(ids_out, b.column("doc_id").type),
                 pa.array(sh_out, pa.string())],
                names=["doc_id", "shingle"])

    return df.select("doc_id", text_col).mapInArrow(
        gen, f"doc_id {id_type}, shingle string")


def contamination_scores(
    docs: DataFrame, bench: DataFrame, text_col: str = "text", k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per candidate doc, the fraction of
    its distinct k-word shingles that appear ANYWHERE in the benchmark
    set — the standard n-gram-overlap test for scrubbing eval data out
    of a training corpus.

    100 TB shape: no pairwise doc×bench blowup — the benchmark shingle
    set is tiny next to the corpus (evals are thousands of docs, the
    corpus billions), so the overlap is one equi-join of the corpus
    shingle table against a distinct (broadcastable) benchmark shingle
    set, then a per-doc aggregate with map-side partials.

    Returns (doc_id, n_shingles, n_hit, contamination) for every
    candidate doc; filter/threshold downstream.
    """
    sh = word_shingles(docs, text_col, k)
    bsh = (word_shingles(bench, text_col, k)
           .select("shingle").distinct().withColumn("__hit", F.lit(1)))
    return (
        sh.join(bsh, "shingle", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"),
             F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
             .cast("bigint").alias("n_hit"))
        .withColumn("contamination",
                    F.round(F.col("n_hit") / F.col("n_shingles"), 4))
    )


def jaccard_pairs(
    df: DataFrame, text_col: str = "text", k: int = 3,
    threshold: float = 0.5, max_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).

    ``max_df`` prunes shingles appearing in more than that many
    documents BEFORE the self-join (skew cap: a shingle shared by d
    docs contributes d² candidate rows). Sizes and intersections are
    both computed over the pruned shingle set, so the reported jaccard
    is self-consistent (feature space = informative shingles only).
    The threshold compares the UNROUNDED ratio; rounding is applied
    only to the projected output column (mirrors the SQL oracle).

    ``materialize`` checkpoints the (pruned) shingle frame — it feeds
    the size aggregate AND both sides of the self-join, so recomputing
    the explode three more times costs ~50% extra wall-clock (measured
    at sf0.1). At 100 TB the shingle table is a stored intermediate.
    """
    sh = word_shingles(df, text_col, k)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.countDistinct("doc_id").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    if materialize:
        sh = sh.localCheckpoint(eager=False)
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
    raw = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("sz", "sz_b"), "doc_b")
        .filter(raw >= threshold)
        .select("doc_a", "doc_b", F.round(raw, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 3, h: int = MINHASH_H
) -> DataFrame:
    """(doc_id, mh_0..mh_{h-1}) min-hash signature over word shingles.

    Fused Arrow-batched kernel: shingling, the ``h`` portable md5
    hashes and the per-doc minimum all happen inside one ``mapInArrow``
    pass — ZERO shuffle (the former shape exploded one row per shingle
    and groupBy-min'd 2.6M rows back to 50k; a doc's signature depends
    only on its own text, so nothing ever needed to leave the scan
    stage — guide §2.4, remove shuffles outright). Hash values are
    bit-identical to :func:`text.portable_hash64`
    (``int(md5(shingle + '#seed').hexdigest()[:15], 16)``, UTF-8), and
    a per-task cache hashes each distinct shingle once (guide §4.5 —
    the bench corpus holds 2.6M shingle occurrences over only ~28k
    distinct shingles). Docs with no non-empty shingles emit no row,
    exactly like the former groupBy."""
    import pyarrow as pa

    id_type = df.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_type}, " + ", ".join(
        f"mh_{s} long" for s in range(h))
    seed_tails = [f"#{s}".encode() for s in range(h)]

    def gen(batches):
        import hashlib

        cache: dict[str, tuple] = {}
        for b in batches:
            ids_out: list = []
            mins: list[list[int]] = [[] for _ in range(h)]
            for did, txt in zip(b.column("doc_id").to_pylist(),
                                b.column(text_col).to_pylist()):
                if txt is None:
                    continue
                tk = txt.split(" ")
                ss = set()
                for i in range(max(len(tk) - k, 0) + 1):
                    s = " ".join(tk[i:i + k])
                    if s:
                        ss.add(s)
                if not ss:
                    continue
                best = [None] * h
                for s in ss:
                    hv = cache.get(s)
                    if hv is None:
                        sb = s.encode()
                        hv = tuple(
                            int(hashlib.md5(sb + st).hexdigest()[:15], 16)
                            for st in seed_tails)
                        if len(cache) > 4_000_000:  # bound task memory
                            cache.clear()
                        cache[s] = hv
                    for j in range(h):
                        if best[j] is None or hv[j] < best[j]:
                            best[j] = hv[j]
                ids_out.append(did)
                for j in range(h):
                    mins[j].append(best[j])
            yield pa.record_batch(
                [pa.array(ids_out, b.column("doc_id").type)]
                + [pa.array(m, pa.int64()) for m in mins],
                names=["doc_id"] + [f"mh_{s}" for s in range(h)])

    return df.select("doc_id", text_col).mapInArrow(gen, schema)


def lsh_buckets(
    signatures: DataFrame, h: int = MINHASH_H, bands: int = LSH_BANDS
) -> DataFrame:
    """(doc_id, band, bucket) — ONE scan of the signature frame: the
    per-band bucket keys are built as an array of structs and exploded,
    instead of unioning ``bands`` filtered scans."""
    rows = h // bands
    entries = []
    for band in range(bands):
        cols = [F.col(f"mh_{band * rows + r}") for r in range(rows)]
        bucket = F.md5(F.concat_ws(
            "_", F.lit(band), *[c.cast("string") for c in cols]))
        entries.append(F.struct(F.lit(band).alias("band"),
                                bucket.alias("bucket")))
    return (
        signatures.select("doc_id", F.explode(F.array(*entries)).alias("e"))
        .select("doc_id", "e.band", "e.bucket")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, h: int = MINHASH_H, bands: int = LSH_BANDS
) -> DataFrame:
    """Candidate pairs from banded LSH: equi-join on (band, bucket)."""
    buckets = lsh_buckets(signatures, h, bands)
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
    """(doc_id, simhash) — B-bit signature from distinct-token hashes.

    Fused Arrow-batched kernel, same shape (and same rationale) as
    :func:`minhash_signatures`: token split, the portable md5 hash and
    the per-bit ±1 sums all happen in ONE ``mapInArrow`` pass — the
    former explode + groupBy shipped one row per distinct token through
    an Exchange for a value that depends only on the doc's own text
    (guide §2.4). Hash values are bit-identical to
    :func:`text.portable_hash64` (seed 99, UTF-8); a per-task cache
    hashes each distinct token once (guide §4.5). Docs with no
    non-empty tokens emit no row, exactly like the former groupBy
    (its explode left no surviving token rows); ±1 sums are integer
    addition, so set-iteration order cannot change the signature."""
    import pyarrow as pa

    id_type = df.schema["doc_id"].dataType.simpleString()
    seed_tail = b"#99"

    def gen(batches):
        import hashlib

        cache: dict[str, int] = {}
        for b in batches:
            ids_out: list = []
            sigs_out: list = []
            for did, txt in zip(b.column("doc_id").to_pylist(),
                                b.column(text_col).to_pylist()):
                if txt is None:
                    continue
                toks = {t for t in txt.split(" ") if t}
                if not toks:
                    continue
                sums = [0] * bits
                for t in toks:
                    th = cache.get(t)
                    if th is None:
                        th = int(hashlib.md5(
                            t.encode() + seed_tail).hexdigest()[:15], 16)
                        if len(cache) > 4_000_000:  # bound task memory
                            cache.clear()
                        cache[t] = th
                    for bit in range(bits):
                        sums[bit] += 1 if (th >> bit) & 1 else -1
                sig = 0
                for bit in range(bits):
                    if sums[bit] > 0:
                        sig |= 1 << bit
                ids_out.append(did)
                sigs_out.append(sig)
            yield pa.record_batch(
                [pa.array(ids_out, b.column("doc_id").type),
                 pa.array(sigs_out, pa.int64())],
                names=["doc_id", "simhash"])

    return df.select("doc_id", text_col).mapInArrow(
        gen, f"doc_id {id_type}, simhash long")


def _simhash_segments(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) of the r+1 disjoint bit segments (pigeonhole)."""
    n_seg = max_hamming + 1
    base, extra = divmod(bits, n_seg)
    segs, lo = [], 0
    for i in range(n_seg):
        w = base + (1 if i < extra else 0)
        segs.append((lo, w))
        lo += w
    return segs


def simhash_near_pairs(
    sig: DataFrame, max_hamming: int = 3, bits: int = SIMHASH_BITS,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance — banded, no cartesian.

    Pigeonhole: with the B signature bits split into ``max_hamming+1``
    disjoint segments, any pair within hamming ``max_hamming`` agrees
    exactly on at least one segment. Candidates are therefore an
    EQUI-join on (segment_idx, segment_bits) — same bucketed shape as
    :func:`lsh_candidate_pairs` — followed by the exact
    ``bit_count(xor) <= r`` filter. Result is identical to the
    brute-force all-pairs join (which the DuckDB oracle runs), at
    ~n/2^w candidates per segment bucket instead of n² total.
    ``materialize`` checkpoints the signature frame feeding both join
    sides (at scale: a stored signature table).
    """
    if materialize:
        sig = sig.localCheckpoint(eager=False)
    segs = _simhash_segments(bits, max_hamming)
    entries = [
        F.struct(
            F.lit(i).alias("seg"),
            F.shiftright(F.col("simhash"), lo)
            .bitwiseAND(F.lit((1 << w) - 1)).alias("segbits"),
        )
        for i, (lo, w) in enumerate(segs)
    ]
    keyed = sig.select(
        "doc_id", "simhash", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "simhash", "e.seg", "e.segbits")
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.seg") == F.col("b.seg"))
               & (F.col("a.segbits") == F.col("b.segbits"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.simhash").alias("sig_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    vertices: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    near-dup pair graph → ``(vertex, component_id)`` with
    ``component_id`` = the minimum vertex id reachable. This is the
    step between pair-finding and actual dedup: one canonical document
    (the min id) per component, everything else is a removable dup.

    Min-label propagation with pointer-jumping: each round every vertex
    takes ``min(own label, neighbors' labels)`` (one equi-join + one
    groupBy), then shortcuts through its label's own label (labels are
    vertex ids, so one more self-join halves every path) — O(log
    diameter) rounds, so even chain-shaped components converge fast.
    Labels are eagerly localCheckpointed per round — iterative lineage
    would otherwise grow a join-tower Catalyst replans from scratch
    each action. No driver-side graph state: at 100 TB the labels frame
    is (vertex, label) pairs, nothing else.

    ``vertices`` widens the output to isolated vertices (no pairs) —
    they map to themselves.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        edges.unionByName(edges.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)  # reused every round
    )
    if vertices is None:
        requested = None
        verts = edges.select(F.col("a").alias("v")).distinct()
    else:
        requested = vertices.select(F.col(id_col).alias("v")).distinct()
        # propagate over the FULL endpoint set: an endpoint missing
        # from the caller's frame must still CONDUCT connectivity —
        # dropping it would silently sever components (and downstream,
        # leak severed near-dups across dataset splits). The caller's
        # vertex set only restricts the OUTPUT, below.
        verts = (requested
                 .unionByName(edges.select(F.col("a").alias("v")))
                 .distinct())
    labels = verts.select("v", F.col("v").alias("c")).localCheckpoint(
        eager=True)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("v", "b"), "b")
            .groupBy("a").agg(F.min("c").alias("nc"))
            .withColumnRenamed("a", "v")
        )
        stepped = (
            labels.join(nbr, "v", "left")
            .select("v", F.least(F.col("c"),
                                 F.coalesce(F.col("nc"), F.col("c")))
                    .alias("c"))
        )
        # pointer jumping: follow the label's own label (c is a vertex
        # id) — path-halving turns O(diameter) into O(log diameter)
        lut = stepped.select(F.col("v").alias("c"),
                             F.col("c").alias("cc"))
        new_labels = (
            stepped.join(lut, "c", "left")
            .select("v", F.least(F.col("c"),
                                 F.coalesce(F.col("cc"), F.col("c")))
                    .alias("c"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("c", "c2")
            .join(labels, "v")
            .filter(F.col("c2") != F.col("c"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds")
    if requested is not None:
        labels = labels.join(requested, "v", "left_semi")
    return labels.select(F.col("v").alias(id_col),
                         F.col("c").alias("component_id"))
