"""Composed curation chain (corpus_pipeline.curate_corpus): gate
semantics, dedup-on-redacted-fingerprint, one-projection signal block.
"""

from pyspark.sql import functions as F

from vector_spark.datapipe.corpus_pipeline import curate_corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gates_and_redacted_dedup(spark):
    # all-distinct words: top_word_frac stays under the 0.2 gate
    good = "quick brown foxes jump over lazy dogs near old river banks at dawn"
    rows = [
        (0, good),
        (1, "spam spam spam spam spam spam"),  # repetitive -> dropped
        (2, "tiny doc"),  # n_words < 5 -> dropped
        (3, None),  # no tokens -> dropped
        # 4 and 5 differ ONLY in their PII literal: same redacted
        # fingerprint -> exact dedup keeps min id (4)
        (4, good + " mail alice@example.com thanks"),
        (5, good + " mail bob@other.org thanks"),
    ]
    out = {
        r["doc_id"]: r
        for r in curate_corpus(_docs(spark, rows), min_words=5, max_xent=100.0).collect()
    }
    assert 0 in out and out[0]["n_pii"] == 0
    assert 1 not in out and 2 not in out and 3 not in out
    assert 4 in out and 5 not in out  # dedup across PII variants
    assert out[4]["n_pii"] == 1
    assert out[4]["fingerprint"] is not None
    assert out[4]["split"] in ("train", "val", "test")


def test_xent_gate_drops_high_entropy(spark):
    # 20 near-identical docs (low xent under the self-trained LM) plus
    # one all-unique-tokens doc (every bigram unseen relative to its
    # context -> higher xent). With max_xent set between the two
    # populations, only the odd doc drops.
    rows = [(i, f"alpha beta gamma delta epsilon zeta c{i % 2}") for i in range(20)]
    rows.append((99, "q0 q1 q2 q3 q4 q5 q6"))
    loose = curate_corpus(_docs(spark, rows), min_words=5, max_xent=100.0)
    xents = {r["doc_id"]: r["xent"] for r in loose.select("doc_id", "xent").collect()}
    assert xents[99] > max(v for k, v in xents.items() if k != 99)
    cut = (xents[99] + max(v for k, v in xents.items() if k != 99)) / 2
    strict = curate_corpus(_docs(spark, rows), min_words=5, max_xent=cut)
    kept = {r["doc_id"] for r in strict.select("doc_id").collect()}
    assert 99 not in kept and 0 in kept


def test_signal_block_is_one_projection(spark):
    # repetition + pii + fingerprint must NOT self-join the scan: the
    # only corpus-scale joins in the plan are the LM join and the
    # dedup-keep join.
    df = curate_corpus(_docs(spark, [(i, "a b c d e f") for i in range(8)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Python" not in plan
