"""Text-analysis operators for training-data pipelines (task mandate):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen'd,
zero Python in the hot path — and all deliberately expressible in ANSI
SQL so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic (the driver's synthetic docs are english-ish; the
# heuristic stays deterministic and portable to SQL)
STOP_EN = ["the", "is", "a", "and", "of"]


def portable_hash64(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash identical in Spark and DuckDB:
    bigint of the first 15 hex chars of md5(s || '#' || seed)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("bigint")


def portable_hash64_sql(expr: str, seed: int) -> str:
    return f"CAST(('0x' || substr(md5({expr} || '#{seed}'), 1, 15)) AS BIGINT)"


# PII scrubbing patterns — kept to syntax Java regex and RE2 (DuckDB)
# interpret identically so the oracle can mirror the redaction exactly
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def redact_pii(text: Column) -> Column:
    """Scrub emails then IPv4 literals (order matters: an address can
    embed digits-and-dots) — two JVM ``regexp_replace`` passes, zero
    Python. At 100 TB this is a narrow projection over the text column;
    whole-stage codegen keeps it inside the scan stage."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_ips) found in ``text`` — audit metric for the
    redaction pass."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("bigint"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).cast("bigint"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics per doc (public Gopher/MassiveText
    filtering rules — repetition is the strongest cheap signal of
    low-quality machine-generated text):

    * ``top_word_frac`` — occurrences of the most frequent word / total
      words (Gopher: drop if a single word dominates);
    * ``dup_3gram_frac`` — 1 − distinct/total 3-gram occurrences
      (Gopher's duplicate n-gram fraction).

    Shape: ZERO shuffle — both metrics are per-row array expressions
    (the top-word count is the longest run in the sorted token array;
    distinct 3-grams via ``array_distinct``), so the whole op stays in
    the scan stage's codegen. The naive explode → groupBy(doc, word)
    shape would shuffle one row per word occurrence — at 100 TB that's
    the dominant cost of the filter pass; this costs none
    (plan-asserted in tests/test_scale_shapes.py).
    """
    toks = F.split(F.col(text_col), " ")
    sorted_toks = F.array_sort(toks)
    # longest run in the sorted array == max word frequency
    run_state = F.aggregate(
        sorted_toks,
        F.struct(F.lit(0).alias("best"), F.lit(0).alias("cur"),
                 F.lit(None).cast("string").alias("prev")),
        lambda acc, x: F.struct(
            F.greatest(
                acc.best,
                F.when(x.eqNullSafe(acc.prev), acc.cur + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(x.eqNullSafe(acc.prev), acc.cur + 1).otherwise(F.lit(1))
            .alias("cur"),
            x.alias("prev"),
        ),
    )
    from .dedup import shingle_array

    shingles = shingle_array(toks, k=3)
    return df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.round(run_state.best / F.size(toks), 4).alias("top_word_frac"),
        F.round(
            1 - F.size(shingles)
            / F.greatest(F.size(toks) - 2, F.lit(1)), 4,
        ).alias("dup_3gram_frac"),
    )


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


# BPE-ish pre-tokenizer pattern (simplified GPT-2 shape, kept free of
# lookaheads so Java regex (Spark) and RE2 (DuckDB) agree): letter runs,
# digit runs, or a single non-alnum non-space symbol
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (vs whitespace
    token_count): the length estimate an LLM-data pipeline budgets by.

    ``regexp_count`` rather than ``size(regexp_extract_all(...))``:
    both count the same non-overlapping left-to-right matches under the
    same Java regex engine, but the former never materializes the
    matched-substring array (per-doc garbage proportional to token
    count — guide §1.2, cheaper per-task work)."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def bpe_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{BPE_PATTERN}'))"


def quality_score(text: Column, n_chars: Column) -> Column:
    """Heuristic quality in [0,1]: length, stopword ratio, alpha ratio."""
    toks = token_count(text).cast("double")
    # regexp_count == size(split(s, p)) - 1 == number of non-overlapping
    # left-to-right matches (same Java regex engine, no metacharacters
    # in the padded-stopword patterns), without materializing the split
    # array per stopword per doc
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    stop_hits = sum(
        F.regexp_count(padded, F.lit(f" {w} ")).cast("double")
        for w in STOP_EN
    )
    alpha_ratio = (
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
        / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    )
    length_term = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stop_hits / F.greatest(toks, F.lit(1.0)) * 4, F.lit(1.0))
    # +1e-9 before rounding: the rational inputs land exactly on .xxxx5
    # halfway points, where Spark rounds half-up and DuckDB half-even;
    # the epsilon nudges both engines off the boundary identically
    return F.round(
        0.4 * length_term + 0.3 * stop_term + 0.3 * alpha_ratio + F.lit(1e-9),
        4)


def quality_score_sql(text: str, n_chars: str) -> str:
    toks = f"GREATEST(CAST(len(string_split({text}, ' ')) AS DOUBLE), 1.0)"
    stop_hits = " + ".join(
        f"CAST(len(string_split(' ' || {text} || ' ', ' {w} ')) - 1 AS DOUBLE)"
        for w in STOP_EN
    )
    alpha = (
        f"CAST(length(regexp_replace({text}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
        f" / GREATEST(CAST(length({text}) AS DOUBLE), 1.0)"
    )
    return (
        f"ROUND(0.4 * LEAST(CAST({n_chars} AS DOUBLE) / 500.0, 1.0)"
        f" + 0.3 * LEAST(({stop_hits}) / {toks} * 4, 1.0)"
        f" + 0.3 * ({alpha}) + 1e-9, 4)"
    )


def lang_id(text: Column) -> Column:
    """Stopword-marker language guess: 'en' if common English stopwords
    dominate, else 'other'. (Synthetic corpus ⇒ binary heuristic; the
    structure — per-language marker scoring — is the real-world shape.)"""
    hits = sum(
        F.when(F.concat(F.lit(" "), text, F.lit(" "))
               .contains(f" {w} "), 1).otherwise(0)
        for w in STOP_EN
    )
    return F.when(hits >= 2, F.lit("en")).otherwise(F.lit("other"))


def lang_id_sql(text: str) -> str:
    hits = " + ".join(
        f"CASE WHEN (' ' || {text} || ' ') LIKE '% {w} %' THEN 1 ELSE 0 END"
        for w in STOP_EN
    )
    return f"CASE WHEN ({hits}) >= 2 THEN 'en' ELSE 'other' END"


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: 64-bit prefix of md5 (the exact-dup
    key; see :func:`winnow_fingerprints` for the rolling-hash partial-
    overlap fingerprint)."""
    return F.substring(F.md5(text), 1, 16)


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 5, w: int = 4,
    seed: int = 31,
) -> DataFrame:
    """MOSS-style winnowing (rolling-hash document fingerprinting, task
    mandate): hash every k-token gram, then keep the MINIMUM hash of
    each w-length window of consecutive gram positions — guaranteeing
    any shared run of ≥ k+w-1 tokens between two documents shares a
    fingerprint, at ~1/w the storage of all grams. Returns distinct
    ``(doc_id, fp)`` rows. All JVM expressions + one window function;
    the window is partitioned per document, so at 100 TB it
    parallelizes by doc with no global sort."""
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    pos_grams = (
        df.select("doc_id", F.posexplode(grams).alias("pos", "gram"))
        .filter(F.length("gram") > 0)
        .withColumn("h", portable_hash64(F.col("gram"), seed))
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        pos_grams.select("doc_id", F.min("h").over(win).alias("fp"))
        .distinct()
    )


def winnow_fingerprints_sql(k: int = 5, w: int = 4, seed: int = 31,
                            src: str = "documents") -> str:
    h = portable_hash64_sql("gram", seed)
    return f"""
WITH grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+{k - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
       LATERAL (SELECT unnest(range(1, GREATEST(len(toks) - {k - 1}, 1) + 1)) AS i)
),
hashed AS (
  SELECT doc_id, pos, {h} AS h FROM grams WHERE length(gram) > 0
)
SELECT DISTINCT doc_id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
FROM hashed
"""


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(t),
        "fingerprint": fingerprint(t),
        "guessed_lang": lang_id(t),
    })
