"""Context-window packing (datapipe/packing.py): offset math,
straddling docs, partition invariance of the two-phase prefix sum,
manifest reconstruction properties, plan shape.
"""

import pytest
from pyspark.sql import functions as F

from vector_spark.datapipe.packing import chunk_manifest, pack_chunks


def _docs(spark, texts, parts=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df.repartition(parts) if parts else df


def test_offsets_and_straddle(spark):
    # 3+4+5 tokens, ctx_len=4: doc0 [0,3) chunk 0; doc1 [3,7) chunks 0-1;
    # doc2 [7,12) chunks 1-2.
    out = {
        r["doc_id"]: r
        for r in pack_chunks(
            _docs(spark, ["a b c", "a b c d", "a b c d e"]), ctx_len=4
        ).collect()
    }
    assert (out[0]["start_off"], out[0]["chunk_start"], out[0]["chunk_end"]) == (0, 0, 0)
    assert (out[1]["start_off"], out[1]["chunk_start"], out[1]["chunk_end"]) == (3, 0, 1)
    assert (out[2]["start_off"], out[2]["chunk_start"], out[2]["chunk_end"]) == (7, 1, 2)
    assert out[2]["n_chunks"] == 2


def test_empty_docs_contribute_nothing(spark):
    out = {
        r["doc_id"]: r
        for r in pack_chunks(_docs(spark, ["a b", "", None, "c d"]), ctx_len=8).collect()
    }
    assert out[1]["n_tok"] == 0 and out[1]["chunk_start"] is None
    assert out[2]["n_tok"] == 0 and out[2]["n_chunks"] == 0
    assert out[3]["start_off"] == 2  # empties don't shift the stream


def test_partition_invariance(spark):
    texts = [("w " * ((i * 7) % 13 + 1)).strip() for i in range(200)]
    a = {r["doc_id"]: tuple(r) for r in pack_chunks(_docs(spark, texts, 1), 32).collect()}
    b = {r["doc_id"]: tuple(r) for r in pack_chunks(_docs(spark, texts, 16), 32).collect()}
    assert a == b


def test_manifest_reconstruction_properties(spark):
    texts = [("t " * ((i * 5) % 17 + 1)).strip() for i in range(100)]
    ctx = 24
    df = _docs(spark, texts)
    packed = {r["doc_id"]: r for r in pack_chunks(df, ctx).collect()}
    man = chunk_manifest(df, ctx).collect()

    # per doc: slices cover exactly n_tok tokens
    per_doc = {}
    for r in man:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tok_in_chunk"]
        assert 0 < r["n_tok_in_chunk"] <= ctx
        assert 0 <= r["tok_from"] < r["tok_to"] <= ctx
    for doc_id, n in per_doc.items():
        assert n == packed[doc_id]["n_tok"]

    # per chunk: every chunk except the last is exactly full, and
    # slices tile [0, fill) without gaps or overlaps
    by_chunk = {}
    for r in man:
        by_chunk.setdefault(r["chunk_id"], []).append((r["tok_from"], r["tok_to"]))
    last = max(by_chunk)
    for cid, spans in by_chunk.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0, f"gap/overlap in chunk {cid}"
        fill = spans[-1][1]
        assert fill == ctx or cid == last


def test_shuffled_order_is_a_permutation_of_the_stream(spark):
    from vector_spark.datapipe.packing import shuffle_order

    texts = [("x " * ((i * 3) % 9 + 1)).strip() for i in range(60)]
    plain = {r["doc_id"]: r for r in pack_chunks(_docs(spark, texts), 16).collect()}
    shuf = {
        r["doc_id"]: r
        for r in pack_chunks(_docs(spark, texts), 16, order_by=shuffle_order()).collect()
    }
    # same documents, same token counts, same TOTAL stream length ->
    # same final chunk id; only the order (start_off) changes
    assert {k: v["n_tok"] for k, v in plain.items()} == {
        k: v["n_tok"] for k, v in shuf.items()
    }
    assert max(v["chunk_end"] for v in plain.values()) == max(
        v["chunk_end"] for v in shuf.values()
    )
    assert any(plain[k]["start_off"] != shuf[k]["start_off"] for k in plain)
    # rerun-stable: the shuffle key is deterministic
    shuf2 = {
        r["doc_id"]: r["start_off"]
        for r in pack_chunks(_docs(spark, texts), 16, order_by=shuffle_order()).collect()
    }
    assert shuf2 == {k: v["start_off"] for k, v in shuf.items()}


def test_plan_has_no_single_partition_corpus_exchange(spark):
    # The only SinglePartition exchange allowed is on the
    # O(#partitions)-row offsets table, never on the doc stream.
    df = pack_chunks(_docs(spark, ["a b c"] * 64, 8), 16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Python" not in plan
    stream_side = plan.split("BroadcastExchange")[0]
    assert "Exchange SinglePartition" not in stream_side
