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

from pyspark.sql import DataFrame
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
