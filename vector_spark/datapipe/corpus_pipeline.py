"""Composed training-corpus cleaning pipeline: the document-side
flagship. Chains the datapipe operators the way a 100TB pretraining
ingest actually would:

  exact dedup   (normalized-fingerprint groupBy, keep min id)
    -> near-dup  (MinHash+LSH candidate pairs, exact-Jaccard verified;
                  greedy keep-smaller-id per pair — deliberately NOT
                  transitive closure, so the rule is deterministic and
                  engine-reproducible; a connected-components pass is
                  the documented scale-up for fuzzy clusters)
    -> quality   (cheap SQL-expressible signals; min word count here)
    -> stats     (token counts for the surviving set)

Every stage is a declarative DataFrame plan over the previous one —
one driver program, no materialization between stages (persist only
inside minhash_dedup_pairs where the shingle frame is reused).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.datapipe.dedup import (
    exact_dedup_keys,
    minhash_dedup_pairs,
    normalize_text,
)
from vector_spark.datapipe.textstats import quality_score, token_count


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 4,
    jaccard_threshold: float = 0.2,
    min_words: int = 5,
) -> DataFrame:
    """Returns the surviving documents as (id, n_words, tokens),
    after exact dedup, pairwise near-dup removal, and the quality
    floor."""
    # 1. exact: keep the smallest id of each normalized-text group
    keys = exact_dedup_keys(docs, id_col, text_col)
    kept = docs.join(
        keys.select(F.col("keep_id").alias(id_col)), on=id_col, how="inner"
    )

    # 2. near-dup on the exact-kept set: drop the larger id of every
    # verified pair
    pairs = minhash_dedup_pairs(
        kept,
        id_col,
        text_col,
        n=n,
        n_hashes=n_hashes,
        threshold=jaccard_threshold,
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = kept.join(drops, on=id_col, how="left_anti")

    # 3. quality floor + 4. stats
    q = quality_score(F.col(text_col))
    return (
        survivors.withColumn("n_words", q["n_words"])
        .filter(F.col("n_words") >= min_words)
        .select(
            F.col(id_col).alias("id"),
            "n_words",
            token_count(F.col(text_col)).alias("tokens"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_xent: float = 3.43,
    vocab_size: int = 256,
    add_k: float = 1.0,
) -> DataFrame:
    """The round-4 curation chain — every per-document signal this
    pipeline produces, composed the way a pretraining ingest would run
    them:

      redact (PII scrub + audit counts)
        + repetition signals        } ONE projection over the scan —
        + word-count quality floor  } all zero-shuffle expressions
        -> bigram-LM cross-entropy gate (the one doc-keyed join; the
           LM is inherently an aggregate over the corpus)
        -> exact dedup on the REDACTED fingerprint (keep min id —
           two docs differing only in their PII literals are the same
           training document after scrubbing)
        -> deterministic train/val/test split

    Output: (doc_id, split, n_words, top_word_frac, dup_2gram_frac,
    xent, n_pii, fingerprint) for surviving documents.

    100 TB design: the signal block is a single projection (no
    self-join of the scan — `repetition_cols` inlines what
    `repetition_signals` would compute in a second pass); the LM join
    and the fingerprint keep-first window are the only doc-scale
    shuffles, keyed on doc_id/fingerprint (AQE-balanced); split
    assignment is the zero-shuffle portable hash.
    """
    from vector_spark.datapipe.lm_quality import lm_score
    from vector_spark.datapipe.redact import pii_counts, redact_text
    from vector_spark.datapipe.textstats import repetition_cols, split_assign

    rep = repetition_cols(F.col(text_col))
    pii = pii_counts(F.col(text_col))
    redacted = redact_text(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in rep.items()],
        sum(pii.values(), F.lit(0).cast("bigint")).alias("n_pii"),
        F.md5(normalize_text(redacted)).alias("fingerprint"),
    )
    lm = lm_score(
        docs, text_col=text_col, id_col=id_col, vocab_size=vocab_size, add_k=add_k
    ).select("doc_id", "xent")

    gated = (
        base.join(lm, "doc_id")
        .filter(
            (F.col("n_words") >= min_words)
            & ~F.col("is_repetitive")
            & F.col("xent").isNotNull()
            & (F.col("xent") <= max_xent)
        )
    )
    # keep-first per fingerprint as a window, NOT a groupBy+self-join:
    # a self-join would recompute the whole signal+LM lineage for both
    # sides (measured 2x the chain at sf0.1); the window is one shuffle
    # on the high-cardinality fingerprint (bounded rows per group).
    w_fp = Window.partitionBy("fingerprint").orderBy("doc_id")
    survivors = (
        gated.withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return split_assign(survivors, "doc_id").select(
        "doc_id",
        "split",
        "n_words",
        "top_word_frac",
        "dup_2gram_frac",
        "xent",
        "n_pii",
        "fingerprint",
    )
