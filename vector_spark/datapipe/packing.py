"""Context-window packing — the concat-and-chunk sequence packer LLM
pretraining uses (GPT-2/3 style: concatenate documents in a stable
order, slice the token stream into fixed ``ctx_len`` windows; docs may
straddle window boundaries).

Beyond-the-reference training-data operator (SURVEY.md §2 "beyond"
list). The hard part at scale is the GLOBAL token offset of every
document — a weighted prefix sum over a corpus-wide ordering. A naive
``Window.orderBy(doc_id)`` serializes the corpus through one task;
this module reuses the two-phase global-numbering pattern proven in
``operators/sample.py`` (counter mode), generalized from row ranks to
weighted (token-count) sums:

1. project EARLY to ``(doc_id, n_tok)`` — raw text is dropped at the
   scan, so everything that shuffles is two ints per document;
2. ``repartitionByRange(order)`` + ``sortWithinPartitions`` gives a
   globally range-ordered layout;
3. within each physical partition, a running token cumsum (window
   keyed on the partition id — each partition maps to one reducer, so
   the exchange moves the already-compact rows once);
4. per-partition token TOTALS form an O(#partitions)-row table whose
   prefix sum (single-partition window over the tiny table — the
   documented counter-sample pattern) yields each partition's global
   starting offset, broadcast back.

``start = partition_offset + local_cumsum_before`` is exact integer
arithmetic end-to-end — the DuckDB oracle (one SQL window cumsum) is
bit-exact with no float caveats.

Output is doc-level: ``(doc_id, n_tok, start_off, chunk_start,
chunk_end, n_chunks)`` — which context windows a document lands in.
``chunk_manifest`` explodes it into the per-(chunk, doc) slice table a
dataloader consumes (token spans per chunk, in corpus order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.datapipe.textstats import token_count

_MID = "_pk_mid"
_PID = "_pk_pid"
_LOC = "_pk_loc"
_CNT = "_pk_cnt"
_OFF = "_pk_off"
_ORD = "_pk_ord"


def shuffle_order(id_col: str = "doc_id", salt: str = "pack-shuffle-v1"):
    """Deterministic corpus-shuffle key — the 'shuffle before packing'
    step every pretraining ingest runs, as the shared portable
    md5-derived bigint of (id, salt) (`hashes.salted_long`):
    reproducible across runs, cluster sizes and engines (DuckDB
    mirrors it), independent of the split/sample hashes (own salt).
    Pass as ``order_by=`` to :func:`pack_chunks`."""
    from vector_spark.functions.hashes import salted_long

    return salted_long(id_col, salt)


def pack_chunks(
    df: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_by=None,
) -> DataFrame:
    """Assign every document its global token offset and the context
    windows it occupies under concat-and-chunk packing. Documents are
    concatenated in ``order_by`` order (a Column expression; ties break
    on ``id_col``) — default is plain ``id_col`` order; pass
    :func:`shuffle_order` for the deterministic pre-packing corpus
    shuffle. Zero-token documents carry NULL chunk bounds (they
    contribute nothing to the stream)."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")

    compact = df.select(
        F.col(id_col).alias("doc_id"),
        # coalesce: token_count propagates NULL text as NULL; a NULL
        # doc contributes zero tokens to the stream like an empty one
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).alias("n_tok"),
        (order_by if order_by is not None else F.col(id_col)).alias(_ORD),
    )
    part = (
        compact.repartitionByRange(_ORD, "doc_id")
        .sortWithinPartitions(_ORD, "doc_id")
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(_MID), 33))
        .drop(_MID)
    )
    # Pin ONE physical range layout before fanning out: the local
    # cumsum and the per-partition totals below both read `part`, and
    # without materialization their correctness would ride on Spark's
    # exchange reuse collapsing the two branches into a single range
    # exchange (repartitionByRange SAMPLES boundaries per execution —
    # two independent exchanges could assign different _PIDs and
    # silently corrupt start_off under exchange.reuse=false). The
    # checkpointed table is two ints + the order key per document;
    # lineage truncation also keeps the downstream plan flat. The RDD
    # blocks are released by the ContextCleaner when the plan is GC'd.
    part = part.localCheckpoint(eager=True)
    # local running sum of tokens BEFORE this doc, within the physical
    # partition: the window's hash(_PID) exchange maps each range
    # partition to one reducer and moves only (doc_id, n_tok) pairs.
    w_loc = Window.partitionBy(_PID).orderBy(_ORD, "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = part.withColumn(_LOC, F.coalesce(F.sum("n_tok").over(w_loc), F.lit(0)))

    counts = part.groupBy(_PID).agg(F.sum("n_tok").alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )

    start = (F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LOC)).cast("bigint")
    based = local.join(F.broadcast(offsets), _PID, "left").select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        start.alias("start_off"),
    )
    # integer `div`, NOT floor(double /): a double round-trips token
    # offsets exactly only below 2^53 — float division would silently
    # mis-bin past ~9e15 tokens while the oracle's integer `//` would
    # not. All operands are non-negative, so div == floor division.
    has_tok = F.col("n_tok") > 0
    chunk_start = F.when(has_tok, F.expr(f"start_off div {int(ctx_len)}"))
    chunk_end = F.when(
        has_tok, F.expr(f"(start_off + n_tok - 1) div {int(ctx_len)}")
    )
    return based.select(
        "doc_id",
        "n_tok",
        "start_off",
        chunk_start.cast("bigint").alias("chunk_start"),
        chunk_end.cast("bigint").alias("chunk_end"),
        F.when(has_tok, chunk_end - chunk_start + 1)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_chunks"),
    )


def chunk_manifest(
    df: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_by=None,
) -> DataFrame:
    """Per-(chunk, doc) slice table: which token span of each context
    window each document fills — ``(chunk_id, doc_id, tok_from,
    tok_to, n_tok_in_chunk)`` with ``tok_from``/``tok_to`` positions
    WITHIN the chunk (0-based, ``tok_to`` exclusive). A dataloader
    reconstructs window ``c`` by concatenating its rows in ``tok_from``
    order (the slices tile the chunk disjointly, so ``tok_from`` IS the
    packing order — valid for any ``order_by``). The explode is
    bounded: a document emits ``ceil(n_tok / ctx_len) + 1`` rows at
    most."""
    packed = pack_chunks(
        df, ctx_len, text_col=text_col, id_col=id_col, order_by=order_by
    )
    exploded = packed.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "n_tok",
        "start_off",
        F.explode(F.sequence("chunk_start", "chunk_end")).alias("chunk_id"),
    )
    c0 = F.col("chunk_id") * ctx_len  # global offset where this chunk starts
    doc_end = F.col("start_off") + F.col("n_tok")
    g_from = F.greatest(F.col("start_off"), c0)
    g_to = F.least(doc_end, c0 + ctx_len)
    return exploded.select(
        "chunk_id",
        "doc_id",
        (g_from - c0).cast("bigint").alias("tok_from"),
        (g_to - c0).cast("bigint").alias("tok_to"),
        (g_to - g_from).cast("bigint").alias("n_tok_in_chunk"),
    )
