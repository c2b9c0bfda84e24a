"""Document deduplication for training-data pipelines.

Beyond the reference's per-event dedupe transform
(src/transforms/dedupe.rs — exact projection match in an LRU), a
100TB-scale corpus pipeline needs NEAR-dup detection. All operators
here are declarative DataFrame plans:

  exact        hash-groupBy on a normalized fingerprint (one shuffle,
               map-side partial agg)
  MinHash+LSH  shingle -> portable numeric shingle id -> k min-hashes
               -> band buckets -> candidate pairs by bucket join ->
               exact-jaccard verification (the standard
               shingle/minhash/band construction from Broder '97 /
               MMDS ch.3)
  n-gram Jaccard  exact pairwise via shingle inverted-index join
               (ground truth / oracle path; quadratic in bucket size)
  SimHash      64-bit bit-majority signature via one Arrow pandas UDF;
               near-dup pairs via 4x16 band-bucketed Hamming join
               (pigeonhole-complete for distance <= 3)
  decontaminate  eval-set n-gram overlap flagging (broadcast)

Portability note: the shingle id is the first 15 hex chars of
md5(shingle) -> int64 — identical in Spark (conv) and DuckDB (hex
cast), so MinHash signatures are engine-reproducible. Hash params are
fixed primes; modular arithmetic stays < 2^63 (ANSI-safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.functions.hashes import hex_prefix_to_long

# 2^31-1 (Mersenne prime) — keeps a*h+b < 2^63
MH_P = 2_147_483_647
# fixed odd multipliers / offsets for the k hash families
MH_A = [1_299_721, 15_485_863, 32_452_843, 49_979_687, 67_867_967, 86_028_121]
MH_B = [7, 101, 1_009, 10_007, 100_003, 1_000_003]


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace — canonical form for exact dedup."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the narrow heavy work downstream (shingle explode, hash)
    uses every core: a small-file scan can arrive as 1-2 partitions
    (one parquet file -> one task) which would serialize the whole
    explode stage. At 100TB the scan is naturally thousands of input
    splits and this is a no-op; we only pay the tiny repartition
    shuffle when the source has fewer files than cores. The file count
    comes from the plan's file index (inputFiles) — NOT df.rdd, which
    would materialize a full RDD conversion per call."""
    want = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files and len(files) < want:
        return df.repartition(want)
    return df


def exact_dedup_keys(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: (fingerprint, keep_id =
    min id, n_dups). Hash-groupBy: single shuffle on the fingerprint,
    partial agg map-side."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_tokens(col: Column) -> Column:
    """Whitespace word array; NULL / empty / whitespace-only text is
    an EMPTY array (split would yield [''] — one phantom word)."""
    t = F.coalesce(F.trim(col), F.lit(""))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams of a word array, space-joined — the ONE n-gram
    construction shared by shingles/shingles_hashed (dedup, LSH,
    decontaminate) and textstats.repetition_signals."""
    k = F.size(words) - (n - 1)
    # guard: Spark sequence(0, -1) would produce a DESCENDING array
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams. posexplode over a
    sequence keeps it JVM-side."""
    sh = word_ngrams(word_tokens(F.col(text_col)), n)
    return (
        _spread(df)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def shingle_id(col: Column) -> Column:
    """Portable numeric shingle id (see module docstring)."""
    return F.pmod(hex_prefix_to_long(F.md5(col)), F.lit(MH_P))


def shingles_hashed(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, h) — word n-grams as portable numeric ids, distinct per
    document by default. The string shingle is hashed BEFORE the
    distinct, so the dedup shuffle and every downstream join move
    8-byte longs instead of ~20-byte shingle strings. Dedup is by
    hash id, not by string: two distinct shingles of one document
    colliding mod 2^31-1 would merge — a ~1e-5-per-document event the
    LSH ORACLE reproduces exactly (DuckDB computes the identical
    md5-derived id before its DISTINCT), so engine parity holds by
    construction. distinct=False skips the dedup shuffle — for
    consumers that filter first and dedup the (much smaller) survivor
    set, e.g. decontaminate."""
    sh = word_ngrams(word_tokens(F.col(text_col)), n)
    raw = (
        _spread(df)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .select("id", shingle_id(F.col("shingle")).alias("h"))
    )
    return raw.distinct() if distinct else raw


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 4, n: int = 3
) -> DataFrame:
    """(id, mh0..mh{k-1}) MinHash signature over word n-gram shingles.
    One explode + one groupBy (single shuffle); k mins computed in the
    same aggregate."""
    if n_hashes > len(MH_A):
        raise ValueError(f"at most {len(MH_A)} hash families configured")
    sh = shingles(df, id_col, text_col, n=n)
    return _signatures_from_shingles(sh, n_hashes)


def _signatures_from_shingles(sh: DataFrame, n_hashes: int) -> DataFrame:
    hashed = sh.withColumn("h", shingle_id(F.col("shingle")))
    aggs = [
        F.min(F.pmod(F.col("h") * MH_A[i] + MH_B[i], F.lit(MH_P))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def cap_buckets(df: DataFrame, keys: list[str], max_bucket: int | None) -> DataFrame:
    """Drop every row of a bucket larger than `max_bucket` — the
    degenerate-bucket mitigation shared by LSH band buckets
    (minhash_dedup_pairs) and quantization cells (cosine/ANN paths in
    datapipe.similarity). The 10000 default cap is mirrored in the
    DuckDB oracles (windowed bucket-size filter). None disables.

    Plan shape: two-phase count (map-side partial agg, only
    (key, count) pairs shuffle) then a LEFT ANTI join against the
    over-cap keys — deliberately NOT a Window.partitionBy(keys) count,
    which would funnel every row of a degenerate bucket into one task:
    the exact skew this guard exists to kill. The over-cap key set is
    small by construction (<= rows/max_bucket keys), so AQE picks a
    broadcast anti-join at runtime; no hint, so an adversarially huge
    key set degrades to a shuffled anti-join (AQE skew-split) instead
    of a driver OOM.

    NULL-keyed rows never match the anti-join (SQL null semantics) so
    they are always KEPT here — harmless for every consumer, because
    each one inner-joins on the same keys next, which drops null-keyed
    rows identically in engine and oracle."""
    if max_bucket is None:
        return df
    big = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket)
        .select(*keys)
    )
    return df.join(big, keys, "left_anti")


def lsh_band_buckets(
    sig: DataFrame, n_hashes: int, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, bucket) — signature split into bands; docs sharing a
    bucket in ANY band become candidates."""
    n_bands = n_hashes // rows_per_band
    outs = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bucket = F.md5(F.concat_ws("_", *[c.cast("string") for c in cols]))
        outs.append(sig.select(F.col("id"), F.lit(b).alias("band"), bucket.alias("bucket")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _jaccard_pairs_from_shingles(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard via inverted-index self-join on shingle."""
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard duplicate pairs (ground truth / small
    scale; at 100TB use minhash_dedup_pairs which prunes candidates
    via LSH before this verification)."""
    return _jaccard_pairs_from_shingles(shingles(df, id_col, text_col, n=n), threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.2,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """The scale path: LSH candidate generation (band-bucket
    self-join — only docs colliding in a band are paired) + exact
    Jaccard verification of candidates only.

    `max_bucket` caps the degenerate-bucket blowup: a band bucket
    shared by B docs emits B^2/2 candidates, and boilerplate-heavy
    corpora (license headers, templated pages) produce buckets with
    millions of members — quadratic in exactly the place LSH was
    meant to avoid. Buckets larger than the cap are dropped from
    candidate generation (the standard MMDS-style mitigation: such
    buckets carry near-zero information per pair; members still pair
    through their OTHER bands when genuinely similar). None disables.

    Plan note: the shared shingle frame (explode+distinct shuffle)
    feeds signatures, sizes, and the verification join. It is NOT
    persisted — with AQE on (tune_session default) the distinct's
    exchange becomes one materialized ShuffleQueryStage reused by all
    downstream subtrees (verified: executedPlan shows 2 distinct
    stage ids referenced 16x), so shuffle files on local disk act as
    the cache with no block-manager residency to leak. Shingles move
    as hashed longs end-to-end (shingles_hashed): the dedup shuffle
    and verification join never carry shingle strings."""
    sh = shingles_hashed(df, id_col, text_col, n=n)
    sig = sh.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("h") * MH_A[i] + MH_B[i], F.lit(MH_P))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    buckets = cap_buckets(
        lsh_band_buckets(sig, n_hashes, rows_per_band), ["band", "bucket"], max_bucket
    )
    l = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    r = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact-Jaccard verification restricted to the candidate pairs —
    # this is the point of LSH: the O(n^2) shingle join never happens,
    # intersection counts are computed only where a band collided.
    # Joins run on the 8-byte hash id, not the shingle string.
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col("id").alias("id_a"), "h")
    b_sh = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        cand.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens, via ONE Arrow-vectorized
    pandas UDF (bit-majority vote; md5-derived 64-bit token hashes so
    the signature is platform-stable)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def sh(texts):  # pd.Series -> pd.Series (hints omitted: postponed
        # annotation strings aren't resolvable with local imports)
        out = np.zeros(len(texts), dtype=np.int64)
        tok_lists = [
            [] if txt is None else str(txt).split() for txt in texts
        ]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(out)
        flat = np.array(
            [tok for toks in tok_lists for tok in toks], dtype=object
        )
        # md5 ONLY the batch-unique tokens (natural text repeats
        # heavily), then vectorize everything after the digest:
        # bit matrix, +-1 votes, per-doc segment sums
        uniq, inv = np.unique(flat, return_inverse=True)
        h = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in uniq
            ],
            dtype=np.uint64,
        )
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes = 2 * bits - 1  # (U, 64)
        token_votes = votes[inv]  # (T, 64), in doc order
        nonempty = np.flatnonzero(lens)
        starts = np.concatenate(([0], np.cumsum(lens)))[nonempty]
        acc = np.add.reduceat(token_votes, starts, axis=0)  # (D', 64)
        sig = (acc > 0).astype(np.uint64)
        vals = (sig << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out[nonempty] = vals.astype(np.int64)  # two's-complement wrap
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("simhash"))


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span_words: int = 10
) -> DataFrame:
    """Cross-document SPAN-level exact dedup (the C4/RefinedWeb
    curation step: drop any repeated fixed-size text span corpus-wide,
    keeping only its first occurrence): text -> non-overlapping
    `span_words`-word spans -> global first-occurrence keep -> document
    reassembled from its surviving spans, in order.

    Returns (id, text_dedup, n_kept); a fully-duplicated document
    survives as an empty string so downstream length filters can drop
    it explicitly.

    100 TB design: the kept set IS the distinct-span set — each
    distinct span text survives exactly at min(struct(id, seg_idx)) —
    so there is NO join-back of the span stream against the winners
    (the naive formulation). Three key-partitioned shuffles total:
    groupBy(span) with a map-side-combinable min(struct) (a boilerplate
    span duplicated millions of times combines per partition instead of
    funneling rows into one task — same skew story as op_dedupe's
    min_by rework), groupBy(id) for reassembly, and the left join back
    to the id spine for all-spans-dropped documents. All expressions
    JVM-side; no window over the corpus, no global sort.
    """
    words = word_tokens(F.col(text_col))
    n_seg = F.ceil(F.size(words) / F.lit(float(span_words))).cast("int")
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(F.slice(words, i * span_words + 1, span_words), " ").alias(
                "seg"
            ),
        ),
    )
    segs = (
        _spread(df)
        .select(F.col(id_col).alias("id"), F.explode(spans).alias("s"))
        .select("id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    )
    kept = (
        segs.groupBy("seg")
        .agg(F.min(F.struct("id", "seg_idx")).alias("keep"))
        .select(
            F.col("keep.id").alias("id"),
            F.col("keep.seg_idx").alias("seg_idx"),
            "seg",
        )
    )
    re = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(re, "id", "left")
        .select(
            "id",
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM
    n-gram-overlap rule): flag corpus documents sharing any word
    n-gram with an evaluation set. Returns (doc_id, n_hits) where
    n_hits counts the DISTINCT contaminated n-grams of that document
    (documents with no overlap are absent — the common case at scale;
    anti-join the result to keep the clean corpus).

    100 TB design: the eval set is tiny next to the corpus, so its
    distinct hashed n-grams BROADCAST; the corpus side is one scan —
    n-gram explode, broadcast hash-join, then a groupBy that only
    moves the contaminated (doc, gram) survivors: the corpus n-grams
    are deliberately NOT pre-deduped (that would shuffle the whole
    corpus n-gram set); the per-doc distinct runs on the post-filter
    hits via count_distinct. N-grams ride as 8-byte portable hash ids
    (shingles_hashed), never as strings.
    """
    cg = shingles_hashed(corpus, id_col, text_col, n=n, distinct=False)
    bg = (
        shingles_hashed(bench, id_col, text_col, n=n, distinct=False)
        .select("h")
        .distinct()
    )
    return (
        cg.join(F.broadcast(bg), "h")
        .groupBy("id")
        .agg(F.count_distinct("h").alias("n_hits"))
        .select(F.col("id").alias("doc_id"), "n_hits")
    )


def simhash64_native(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """simhash64's JVM-native twin: identical md5-derived bit-majority
    signature (bit-for-bit equal to the Arrow-UDF form and the DuckDB
    oracle — asserted in tests), computed relationally: explode
    tokens, 64 codegen'd SUM expressions of +-1 bit votes, ONE
    map-side-combinable shuffle on id.

    Measured honestly (sf0.1, 32 cores, warm): ~5.1 s vs the UDF's
    ~4.0 s — hashlib's C md5 keeps the Arrow form competitive, so the
    UDF stays the default. This form exists for deployments that must
    keep Python workers out of the job entirely; both scale the same
    way (scan-parallel, one combineable shuffle)."""
    toks = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.col(text_col))).alias("tok"),
    ).select("id", F.md5("tok").alias("hx"))
    # the 64-bit token hash as two int64-safe 32-bit halves (the md5
    # hex prefix is big-endian: chars 1-8 are the HIGH word)
    toks = toks.select(
        "id",
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("hx", 9, 8), 16, 10).cast("long").alias("lo"),
    )

    def bit(b: int):
        if b < 32:
            return F.shiftrightunsigned(F.col("lo"), b).bitwiseAND(F.lit(1))
        return F.shiftrightunsigned(F.col("hi"), b - 32).bitwiseAND(F.lit(1))

    votes = [
        F.sum((bit(b) * 2 - 1).cast("long")).alias(f"a{b}") for b in range(64)
    ]
    acc = toks.groupBy("id").agg(*votes)
    val = None
    for b in range(64):
        bit = F.when(F.col(f"a{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        term = (
            bit * F.lit(-(2 ** 63)) if b == 63 else bit * F.lit(2 ** b)
        )  # two's-complement top bit
        val = term if val is None else val + term
    sig = acc.select("id", val.cast("long").alias("simhash"))
    # docs with NO tokens (null/empty text) never reach the explode:
    # re-attach them with the zero signature, matching the UDF form
    empty = (
        df.select(F.col(id_col).alias("id"))
        .join(sig.select("id"), "id", "left_anti")
        .withColumn("simhash", F.lit(0).cast("long"))
    )
    return sig.unionByName(empty)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """SimHash near-duplicate pairs via band-bucketed Hamming join
    (Charikar '02 signatures + the Manku/Jain/Sarma WWW'07 rotation
    trick in band form): the 64-bit signature splits into four 16-bit
    bands; by pigeonhole any pair within Hamming distance <= 3 agrees
    EXACTLY on at least one band, so candidates come from equality
    buckets — one shuffle, never an all-pairs product. Candidates
    verify with bit_count(xor) <= max_hamming (exact, JVM-side).
    max_hamming > 3 would need more/wider bands for the pigeonhole
    guarantee; a ValueError guards the contract. cap_buckets drops
    degenerate bands (e.g. the all-empty-text zero signature)."""
    if max_hamming > 3:
        raise ValueError("4x16 banding guarantees recall only for max_hamming <= 3")
    # the repartition plants ONE exchange between the (expensive)
    # signature UDF and the three consumers below (both self-join
    # sides + the cap's count); their subplans are identical up to
    # that exchange, so AQE reuses the materialization across the
    # join sides instead of re-running the Arrow UDF per branch
    # (verified in the executed final plan: 2 ArrowEvalPython — the
    # shuffle subtree + the eagerly-built broadcast cap branch —
    # down from 6 without the exchange)
    sig = simhash64(df, id_col, text_col).repartition(F.col("id"))
    bands = (
        sig.select(
            "id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftrightunsigned(F.col("simhash"), 16 * i)
                            .bitwiseAND(F.lit(0xFFFF))
                            .alias("key"),
                        )
                        for i in range(4)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    bands = cap_buckets(bands, ["band", "key"], max_bucket)
    l = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key"
    )
    r = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key"
    )
    cand = (
        l.join(r, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("bigint").alias("hamming"))
    )
