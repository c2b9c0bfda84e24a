from vector_spark.datapipe.dedup import (  # noqa: F401
    exact_dedup_keys,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)
from vector_spark.datapipe.similarity import (  # noqa: F401
    ann_bucketed_topk,
    cosine_near_dup_pairs,
    cosine_topk,
    quantize_bucket,
)
from vector_spark.datapipe.textstats import (  # noqa: F401
    fingerprint,
    lang_guess,
    quality_score,
    token_count,
)
from vector_spark.datapipe.corpus_pipeline import clean_corpus  # noqa: F401
from vector_spark.datapipe.dedup import normalize_text  # noqa: F401
from vector_spark.datapipe.textstats import bpe_ish_token_count  # noqa: F401
