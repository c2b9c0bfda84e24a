"""Text analysis for corpus pipelines: token counting, quality
scoring, language guessing, fingerprinting. All pure Spark SQL
expressions (codegen'd; no Python in the hot path) and deliberately
SQL-portable so every one has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.datapipe.dedup import normalize_text


def token_count(col: Column) -> Column:
    """Whitespace token count (the fast proxy; BPE-ish subword count
    adds ~0.3 tokens/word for this corpus)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    ).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Regex-segmented subword-ish count: words, digits runs,
    punctuation each count; rough GPT-style heuristic
    (len(word)/4 rounded up per word + punct)."""
    words = F.split(F.trim(col), r"\s+")
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("bigint")
    )
    return F.aggregate(per_word, F.lit(0).cast("bigint"), lambda a, v: a + v)


def quality_score(col: Column) -> dict[str, Column]:
    """Deterministic quality signals (integer/rounded — no float
    traps): char count, word count, mean word length, punctuation
    count, stopword hits."""
    trimmed = F.trim(col)
    words = F.split(trimmed, r"\s+")
    n_words = F.size(words).cast("bigint")
    n_chars = F.length(trimmed).cast("bigint")
    punct = (
        F.length(trimmed) - F.length(F.regexp_replace(trimmed, r"[.,!?;:]", ""))
    ).cast("bigint")
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin("the", "a", "of", "and", "to"))
    ).cast("bigint")
    mean_word_len = F.round(n_chars / F.greatest(n_words, F.lit(1)), 2)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct": punct,
        "stop_hits": stop_hits,
    }


def lang_guess(col: Column) -> Column:
    """Marker-token language heuristic (n-gram-lite): counts hits of
    tiny per-language marker sets; ties -> 'und'. Deterministic and
    portable — a real pipeline swaps in fastText/CLD3 behind the same
    column contract."""
    words = F.split(F.lower(F.trim(col)), r"\s+")

    def hits(markers: list[str]) -> Column:
        return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("bigint")

    en = hits(["the", "a", "of", "and", "to", "is"])
    es = hits(["el", "la", "de", "y", "que"])
    de = hits(["der", "die", "das", "und", "ist"])
    return (
        F.when((en > es) & (en > de), "en")
        .when((es > en) & (es > de), "es")
        .when((de > en) & (de > es), "de")
        .otherwise("und")
    )


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 appendix A1.1,
    also used by RefinedWeb/Dolma), word-level for a corpus without
    line structure:

    - ``top_word_frac``  — occurrences of the most frequent word /
      total words (the top-1-gram fraction rule),
    - ``dup_{n}gram_frac`` — fraction of word n-grams that are repeats
      of an earlier n-gram in the same document,
    - ``is_repetitive``  — Gopher-ish thresholds (>0.20 top-word or
      >0.30 duplicate-n-gram).

    100 TB design: ZERO shuffles — every signal is a projection over
    the row's own word array (the most-frequent-word count is the
    longest run in the sorted array, computed with one F.aggregate
    fold), so the operator composes with any scan at scan speed.

    NULL / empty / whitespace-only text yields n_words = 0 and zeroed
    signals (word_tokens semantics, consistent with token_count).
    """
    cols = repetition_cols(F.col(text_col), n)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def repetition_cols(col: Column, n: int = 2) -> dict[str, Column]:
    """The repetition signals as reusable column expressions (name ->
    Column), so composed pipelines (corpus_pipeline.curate_corpus) can
    inline them into one projection instead of joining a second scan."""
    from vector_spark.datapipe.dedup import word_ngrams, word_tokens

    words = word_tokens(col)
    sw = F.sort_array(words)
    run0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_count = F.aggregate(sw, run0, step, lambda acc: acc["best"])
    grams = word_ngrams(words, n)
    n_words = F.size(words).cast("bigint")
    n_grams = F.size(grams).cast("bigint")
    top_frac = F.round(
        top_count.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    dup_frac = F.round(
        (n_grams - F.size(F.array_distinct(grams))).cast("double")
        / F.greatest(n_grams, F.lit(1)),
        6,
    )
    return {
        "n_words": n_words,
        "top_word_count": top_count.cast("bigint"),
        "top_word_frac": top_frac,
        f"dup_{n}gram_frac": dup_frac,
        "is_repetitive": (top_frac > 0.2) | (dup_frac > 0.3),
    }


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test split assignment by portable
    consistent hash: a document's split depends only on (id, salt) —
    stable across runs, cluster sizes and engines (md5-derived, the
    same int64 arithmetic DuckDB replicates), so re-running the
    pipeline never migrates a document between splits. Fractions are
    resolved against 10_000 hash buckets in dict order.

    100 TB design: one projection — no shuffle, no sampling pass; the
    split column composes with any scan/filter at scan speed.
    """
    from vector_spark.functions.hashes import salted_bucket

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    bucket = salted_bucket(id_col, salt)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        hi = int(round(acc * 10_000))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...] = ("lang", "source"),
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strata-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling — the dataset-MIXING
    primitive: keep each stratum (e.g. language x source) at its own
    rate, so one pass re-weights a corpus ("3x wiki, 0.1x crawl")
    without a shuffle or an RNG. The keep decision is the same
    portable md5 bucket as `split_assign`, keyed on (id, salt): stable
    across runs, cluster sizes and engines, and INDEPENDENT of the
    split hash (different salt), so sampling never correlates with
    split assignment.

    `rates` maps a '|'-joined stratum key ('en|wiki') to a keep
    fraction in [0, 1]; unlisted strata fall to `default_rate`.
    Fractions resolve against 10_000 hash buckets (0.25 -> buckets
    0..2499) — exactly reproducible as ANSI SQL.

    100 TB design: zero shuffle — the rate table is config-sized and
    compiles to a literal CASE, the bucket is one md5 projection;
    composes with any scan at scan speed.
    """
    from vector_spark.functions.hashes import salted_bucket

    rates = rates if rates is not None else {}
    for key, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {key!r} must be in [0,1], got {r}")
    stratum = F.concat_ws("|", *[F.col(c) for c in strata_cols])
    bucket = salted_bucket(id_col, salt)
    thresh: Column = F.lit(int(round(default_rate * 10_000)))
    for key, r in sorted(rates.items()):
        thresh = F.when(stratum == key, F.lit(int(round(r * 10_000)))).otherwise(
            thresh
        )
    return df.withColumn("stratum", stratum).filter(bucket < thresh)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k most DISTINCTIVE terms per document by tf-idf — keyword
    extraction over the whole corpus in one declarative plan.

    score = tf * ln(n_docs / df): tf = occurrences of the term in the
    document, df = number of documents containing it, n_docs = corpus
    size. Ranking uses the score ROUNDED to 6 decimals (then the term
    ascending): mathematically-equal scores can differ in the last
    float bit between engines (2*ln(10) vs ln(100)), and an unrounded
    order-by would let that bit pick different rows engine-to-engine.

    100 TB design: tf and df are both map-side-combinable groupBys;
    n_docs is a 1-row broadcast (no driver collect); the df join is
    keyed on the term (vocabulary-sized side, AQE may broadcast); the
    final per-document window partitions on the document id — high
    cardinality, bounded rows per partition, no global sort.
    """
    from pyspark.sql import Window

    from vector_spark.datapipe.dedup import word_tokens

    words = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def top_words(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus-level top-k word frequencies — the heavy-hitter pattern:
    explode words, ONE map-side-combinable count shuffle, then
    TakeOrderedAndProject (per-partition top-k, merge of <= k rows) —
    no global sort, no single-partition window, scales to any corpus.
    Ties break to the lexicographically first word."""
    from vector_spark.datapipe.dedup import word_tokens

    words = df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("word")).limit(k)


def sample_n_per_stratum(
    df: DataFrame,
    strata_cols: tuple[str, ...] = ("lang",),
    n: int = 25,
    id_col: str = "doc_id",
    salt: str = "stratn-v1",
) -> DataFrame:
    """Exact fixed-N per-stratum sampling — the EVAL-SET construction
    primitive: "give me exactly N docs per language", deterministic
    across runs, engines and cluster sizes. Complements
    `stratified_sample` (fraction-based, zero-shuffle): when the
    quota is a COUNT, a hash threshold cannot hit it exactly, so rank
    the stratum by the portable salted hash (independent of split and
    stratified-sample decisions — different salt) and keep the first
    N; doc id breaks the (practically impossible) hash ties so the
    pick is total-ordered.

    100 TB design: ONE shuffle on the stratum key, and the
    row_number <= N predicate compiles to WindowGroupLimit
    (partial + final), so each map task forwards at most N rows per
    stratum — a billion-doc language costs the exchange N rows, not
    a billion. No global sort, no driver state.

    Returns the input columns plus `stratum` and `rn` (1-based rank
    within the stratum).
    """
    from pyspark.sql import Window

    from vector_spark.functions.hashes import salted_long

    stratum = F.concat_ws("|", *[F.col(c) for c in strata_cols])
    w = Window.partitionBy(stratum).orderBy(
        salted_long(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("stratum", stratum)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= n)
    )
