"""Corpus-curation operators for LLM training-data pipelines.

The operators a 100 TB pre-training pipeline runs between "raw crawl"
and "training shards", beyond the dedup/similarity family
(:mod:`stream_sentinel_spark.operators.dedup`, ``similarity``):

- **decontamination** — n-gram containment of evaluation/test documents
  against the training corpus (the standard train/test-overlap check);
- **repetition scoring** — within-document duplicate n-gram fractions
  (the Gopher-style repetition quality filters);
- **keyword extraction** — per-document top-k salient terms by a
  TF-IDF-style score;
- **weighted sampling** — deterministic weighted sampling without
  replacement (Efraimidis–Spirakis A-ES with a hash-derived uniform);
- **chunking** — overlapping fixed-size token windows (context-window
  packing prep).

Reference parity note: the reference engine has no text-curation surface
(SURVEY.md §2.6 — its only text handling is field stringification,
``Event.java:122-125``); these extend the engine's training-data family
(BASELINE.json north star).

Scale notes are per-operator. Everything is pure column expressions or
standard shuffles on high-cardinality keys; the only driver-side value
anywhere is a lazily-computed broadcast scalar (corpus size) — never a
``collect`` of data rows.

Cross-engine determinism: no transcendental appears in any COMPARED
value (scores are rational: counts, one division). ``weighted_sample``
needs ``ln`` for correct A-ES semantics, so its contract is that the
*selected row set* (not the priority) is the output — see the docstring.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_tokens(col: Column | str) -> Column:
    """Single-space tokenization (matches the oracle's string_split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_ngrams(col: Column | str, n: int) -> Column:
    """array<string> of space-joined word n-grams; fewer than ``n``
    tokens yields an empty array. Pure codegen'd expression — building
    grams costs one map-side pass at any scale."""
    toks = word_tokens(col)
    cnt = F.size(toks) - (n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per test-document n-gram containment against the training corpus:
    ``(doc_id, n_grams, hits, containment)`` where ``hits`` counts the
    test doc's distinct n-grams that appear anywhere in ``train`` and
    ``containment = hits / n_grams``. Docs shorter than ``n`` tokens
    produce no row (no grams to check — callers treat them as clean).

    The standard eval-set decontamination shape (see e.g. GPT-3 appendix
    C / the Pile): flag test docs whose containment exceeds a threshold
    before reporting benchmark numbers, or invert train/test to scrub
    the training set.

    Scale: both sides explode to (gram) / (doc, gram) rows and meet in
    an equi-join on the gram string — a plain hash join keyed on a
    high-cardinality key, so it partitions cleanly at any corpus size.
    The train side is deduplicated before the join (shrinks the build
    side by the corpus duplication factor); the test side deduplicates
    per-doc so containment counts each gram once. No broadcast is
    forced: at real scale BOTH sides are large, and AQE picks broadcast
    on its own when the test set is small.
    """
    from stream_sentinel_spark.operators.partitioning import spread_small

    # spread both sides before the gram explosion: dimension-sized
    # inputs scan as ONE partition and would serialize the tokenize +
    # n-gram fan-out onto a single core (at-scale inputs pass through)
    t_grams = (
        spread_small(test.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    corpus = (
        spread_small(train.select(F.col(text_col)))
        .select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        t_grams.join(corpus, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("hits"),
        )
        .withColumn(
            "containment", F.col("hits").cast("double") / F.col("n_grams")
        )
    )


def repetition_features(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style within-document repetition signals, one row per doc:
    ``dup_2gram_frac`` / ``dup_3gram_frac`` (fraction of n-gram
    instances that are repeats of an earlier instance, i.e.
    ``1 - distinct/total``) and ``top_token_frac`` (share of the most
    frequent token). High values mark boilerplate/spam for the quality
    gate (cf. Rae et al. 2021, Gopher §A.1.1 repetition filters).

    Map-only, LINEAR per document, Arrow-batched: all four signals come
    from ONE vectorized kernel pass over the text column (hash-set
    distinct counts + a token-count dictionary per doc). The pure
    column-expression formulations measured badly here BECAUSE they
    stay out of codegen anyway: higher-order functions (``transform`` /
    ``aggregate`` / ``filter``) are interpreted per element, and every
    re-reference of the gram array duplicates its construction in the
    collapsed projection — the filter-per-distinct-token variant was
    O(distinct·n) per doc (a straggler on any long repetitive doc) and
    even the sorted-run-length fold paid ~11 s at sf0.1 for interpreted
    lambda evaluation. The kernel is the same shape as the MinHash
    signature kernel (dedup.py): row-independent map work where
    vectorized Python beats interpreted expression trees by an order of
    magnitude, while the operator still fuses into the scan — no
    shuffle, no explode.

    Arithmetic parity (the DuckDB oracle hash-matches): counts are
    ints; each fraction is ONE int/int IEEE division, identical on
    every engine.
    """

    @F.pandas_udf(
        "struct<n_tokens:int, dup_2gram_frac:double, dup_3gram_frac:double, "
        "top_token_frac:double>"
    )
    def feats(texts: pd.Series) -> pd.DataFrame:
        out = {
            "n_tokens": [],
            "dup_2gram_frac": [],
            "dup_3gram_frac": [],
            "top_token_frac": [],
        }
        for t in texts:
            if t is None:
                # NULL-text contract matches the column-expression
                # formulation and the oracle: counts NULL, dup fractions
                # 0.0 (the `WHEN total > 0 ... ELSE 0.0` branch), ratio
                # NULL
                out["n_tokens"].append(None)
                out["dup_2gram_frac"].append(0.0)
                out["dup_3gram_frac"].append(0.0)
                out["top_token_frac"].append(None)
                continue
            toks = t.split(" ")  # single-space split, same as word_tokens
            n = len(toks)
            counts: dict[str, int] = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            g2 = list(zip(toks, toks[1:]))
            g3 = list(zip(toks, toks[1:], toks[2:]))
            out["n_tokens"].append(n)
            out["dup_2gram_frac"].append(
                (len(g2) - len(set(g2))) / len(g2) if g2 else 0.0
            )
            out["dup_3gram_frac"].append(
                (len(g3) - len(set(g3))) / len(g3) if g3 else 0.0
            )
            out["top_token_frac"].append(max(counts.values()) / n)
        return pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias("doc_id"), feats(F.col(text_col)).alias("_f")
    ).select(
        "doc_id",
        F.col("_f.n_tokens").alias("n_tokens"),
        F.col("_f.dup_2gram_frac").alias("dup_2gram_frac"),
        F.col("_f.dup_3gram_frac").alias("dup_3gram_frac"),
        F.col("_f.top_token_frac").alias("top_token_frac"),
    )


def top_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` salient terms per document by a TF-IDF-style score:
    ``score = tf * (N / df)`` — term frequency times the *inverse
    document-frequency ratio*. Deliberately **no logarithm**: per-doc
    ranking is what matters and ``N/df`` is monotone in ``1/df`` exactly
    like ``ln(N/df)``, while staying a rational number both engines
    compute bit-identically (an ``ln`` in the score would make the hash
    comparison depend on libm rounding). Ties broken by term asc;
    output ``(doc_id, rank, term, score)``.

    Scale: one explode + two hash aggregations (doc-term counts, then
    document frequencies keyed by term) + one ``row_number`` window
    partitioned by doc — all shuffles on high-cardinality keys. The
    corpus size ``N`` is a lazily-computed one-row aggregate joined via
    broadcast, not a driver-side ``count()``.
    """
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score")
    )


def corpus_vocabulary(
    df: DataFrame, id_col: str, text_col: str, k: int = 1000
) -> DataFrame:
    """Corpus-wide top-``k`` terms by total occurrence count — the
    vocabulary-building pass of a tokenizer/frequency-filter pipeline.
    Output ``(rank, term, tf, df)``: total term frequency and document
    frequency, ranked by tf desc with term asc tie-break.

    Scale: one explode + two hash aggregations (term totals; distinct
    (doc, term) → document frequencies) — shuffles keyed on the
    high-cardinality term — then a global top-k, which Spark executes as
    per-partition top-k + a k-row merge (TakeOrderedAndProject), never a
    full sort. The rank column is a window over the k surviving rows
    only (driver-bounded by construction).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(text_col)).alias("term"),
    )
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tok.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    top = tf.join(dfreq, "term").orderBy(F.desc("tf"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "tf", "df"
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis A-ES scheme with a hash-derived uniform. Each
    row gets priority ``ln(u) / w`` where ``u ∈ (0,1)`` comes from
    ``md5(salt ‖ id)`` (60 bits) and ``w`` is its weight; the ``k``
    largest priorities win — exactly the distribution of weighted
    sampling without replacement, yet reproducible across runs, engines,
    and partitionings (same id + salt → same decision; cf.
    :func:`stream_sentinel_spark.operators.sampling.hash_sample`).

    Contract: the output is the SELECTED ROWS (plus ``__priority`` for
    the total order), not the priority values — ``ln`` may differ by an
    ulp across libms, which can never flip a comparison between two
    hash-random priorities but would fail a bit-exact hash on the
    priority column itself.

    Rows with non-positive weights are EXCLUDED (filtered, not an
    error): the A-ES priority ``ln(u)/w`` is undefined at w = 0 (NULL in
    Spark, which silently sorts last) and sign-flipped for w < 0 (those
    rows would silently win first) — both silent inversions of the
    sampling semantics, so the operator pins the standard A-ES
    precondition w > 0 explicitly.

    Scale: priorities are map-side expressions; selection is a global
    top-k (``orderBy + limit``), which Spark executes as per-partition
    top-k + a k-row driver merge — no full sort, no shuffle of the
    losers. For k large enough that a driver merge hurts, take the
    approximate quantile of the priority instead; not needed here.
    """
    df = df.filter(F.col(weight_col).cast("double") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    pri = F.ln(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__priority", pri)
        .orderBy(F.col("__priority").desc(), F.col(id_col).asc())
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token windows — the packing
    prep that turns variable-length documents into model-context-sized
    pieces. Chunk ``i`` covers tokens ``[i*stride, i*stride +
    chunk_tokens)``; chunks start while any token remains, so every
    token lands in at least one chunk and the final chunk may be short.
    Output ``(doc_id, chunk_idx, chunk_text, chunk_len)``.

    Map-only (sequence + slice + posexplode): a pure per-row expansion
    with no shuffle — the natural shape for a 100 TB corpus rewrite,
    where chunking fuses with the scan and the sink controls
    partitioning.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError(
            "stride must be <= chunk_tokens: a larger stride silently "
            "drops the tokens between consecutive windows, violating the "
            "every-token-lands-in-a-chunk guarantee"
        )
    toks = word_tokens(text_col)
    n_chunks_minus_1 = F.floor((F.size(toks) - 1) / F.lit(float(stride)))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_minus_1.cast("int")),
        lambda s: F.array_join(
            F.slice(toks, s * stride + 1, chunk_tokens), " "
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).withColumn("chunk_len", F.size(word_tokens("chunk_text")))


def passage_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passage_words: int = 6,
) -> DataFrame:
    """Passage-level exact deduplication — the bounded-memory stand-in
    for suffix-array exact-substring dedup (Lee et al. 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): each document is cut into consecutive non-overlapping
    ``passage_words``-word passages; every passage instance whose text
    already occurred earlier in the corpus (global first occurrence =
    lexicographic min of (doc_id, passage index)) is dropped; each
    document is reconstructed from its surviving passages in order.

    Output: one row per input document —
    ``(doc_id, n_passages, n_kept, kept_text)`` (``kept_text`` NULL when
    every passage was a duplicate).

    Scale shape: passage explosion is map-only; the only shuffle is the
    groupBy on the passage text (hash-partitioned, partial-agg min), and
    reconstruction re-aggregates by doc_id. No driver pulls, no
    quadratic stage — corpus-size-linear like x01's exact dedup, with
    the passage granularity the only new cost (a ``passage_words``-fold
    smaller row count than word-level).
    """
    toks = word_tokens(text_col)
    n = passage_words
    n_p_minus_1 = F.floor((F.size(toks) - 1) / F.lit(float(n))).cast("int")
    passages = F.transform(
        F.sequence(F.lit(0), n_p_minus_1),
        lambda s: F.array_join(F.slice(toks, s * n + 1, n), " "),
    )
    p = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(passages).alias("idx", "ptext"),
    )
    firsts = p.groupBy("ptext").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    kept = (
        p.join(firsts, "ptext")
        .filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("idx") == F.col("first.idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "ptext"))),
                    lambda s: s["ptext"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        (F.floor((F.size(toks) - 1) / F.lit(float(n))) + 1)
        .cast("bigint")
        .alias("n_passages"),
    )
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "kept_text",
        )
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    context_len: int,
    n_shards: int = 64,
    salt: str = "pk",
) -> DataFrame:
    """Pre-training sequence packing: concatenate documents into a token
    stream and cut it into fixed ``context_len`` windows (the GPT-style
    pack-and-split regime — every window is exactly full; documents
    straddle window boundaries rather than leaving padding).

    Documents are first routed to ``n_shards`` independent streams by an
    md5-derived shard key, then laid end-to-end within their shard in
    (shard, doc_id) order. Output is one row per training window:
    ``(shard, pack_id, n_tokens, n_docs, first_doc, last_doc)`` where
    ``n_tokens = context_len`` for every window except possibly the last
    one of each shard, and ``n_docs`` counts the documents contributing
    at least one token.

    Scale shape: the running-offset window partitions BY SHARD — there
    is never a global single-partition cumsum (the classic packing
    bottleneck); shards are independent streams exactly like training
    data shards, and ``n_shards`` scales with the cluster. The
    span-explode emits ``ceil(len/context)+1`` rows per document (≈1 for
    real corpora), map-only. Everything is integer arithmetic on an
    md5-derived shard — reproducible by a SQL oracle.
    """
    tok = F.col(token_count_col).cast("long")
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        % n_shards
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = (
        df.select(F.col(id_col).alias("doc_id"), tok.alias("n_tok"), shard)
        .withColumn("offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .filter(F.col("n_tok") > 0)
    )
    c = F.lit(context_len)
    first_pack = (F.col("offset") / c).cast("long")
    last_pack = ((F.col("offset") + F.col("n_tok") - 1) / c).cast("long")
    spans = laid.select(
        "shard", "doc_id", "offset", "n_tok",
        F.explode(F.sequence(first_pack, last_pack)).alias("pack_id"),
    )
    # tokens this doc contributes to this pack: overlap of
    # [offset, offset+n_tok) with [pack*C, (pack+1)*C)
    contrib = F.least(
        F.col("offset") + F.col("n_tok"), (F.col("pack_id") + 1) * c
    ) - F.greatest(F.col("offset"), F.col("pack_id") * c)
    return (
        spans.withColumn("contrib", contrib)
        .groupBy("shard", "pack_id")
        .agg(
            F.sum("contrib").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    context_len: int,
    n_shards: int = 64,
    salt: str = "pk",
) -> DataFrame:
    """Greedy bin-fill sequence packing WITHOUT document straddling —
    the OTHER packing regime next to :func:`pack_token_stream`'s
    concat-and-split: each document lands whole in exactly one fixed
    ``context_len`` window (attention never crosses a document
    boundary), windows are filled first-fit in ``doc_id`` order
    (next-fit bin packing — the deterministic policy real pre-training
    pipelines run between chunking (x29) and shard export (x45)), and a
    document longer than the window is TRUNCATED to ``context_len`` and
    flagged. Unfilled window tails are padding — report them via
    :func:`pack_fill_stats`.

    Output: one row per packed document —
    ``(shard, doc_id, window_id, win_offset, n_tok_packed, truncated)``
    where ``window_id`` numbers windows within the shard from 0,
    ``win_offset`` is the document's token start inside its window, and
    ``n_tok_packed = least(n_tok, context_len)``. Zero-token documents
    are dropped (same rule as :func:`pack_token_stream`).

    The sequential fill decision (a window closes exactly when the next
    document would overflow it) is a RESET-carrying scan — not a plain
    prefix sum — so it cannot fuse into a window expression; it runs as
    one Arrow-batched ``applyInPandas`` pass per shard after ONE key
    shuffle on the md5-derived shard (the same routing expression as
    :func:`pack_token_stream`, so the two regimes shard identically).
    Each task holds only ``(doc_id, n_tok)`` pairs — 16 bytes a
    document — and ``n_shards`` scales with the cluster exactly like
    training-data shards; there is never a global single-partition
    scan. The SQL oracle reproduces the fill with a per-shard recursive
    CTE stepping the same integer recurrence (corpus x106).
    """
    import pandas as pd
    from pyspark.sql import types as T

    if context_len <= 0:
        raise ValueError("context_len must be positive")
    tok = F.col(token_count_col).cast("long")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16,
            10,
        )
        .cast("long")
        % n_shards
    ).alias("shard")
    docs = df.select(
        shard, F.col(id_col).alias("doc_id"), tok.alias("n_tok")
    ).filter(F.col("n_tok") > 0)

    id_type = docs.schema["doc_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("doc_id", id_type),
            T.StructField("window_id", T.LongType()),
            T.StructField("win_offset", T.LongType()),
            T.StructField("n_tok_packed", T.LongType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )
    cap = int(context_len)

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        win, used = 0, 0
        rows = []
        for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tok"]):
            packed = min(int(n_tok), cap)
            if used + packed > cap:
                win += 1
                used = 0
            rows.append(
                (
                    int(pdf["shard"].iloc[0]),
                    doc_id,
                    win,
                    used,
                    packed,
                    int(n_tok) > cap,
                )
            )
            used += packed
        return pd.DataFrame(
            rows,
            columns=[
                "shard", "doc_id", "window_id", "win_offset",
                "n_tok_packed", "truncated",
            ],
        )

    return docs.groupBy("shard").applyInPandas(fill, out_schema)


def pack_sequences_bucketed(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    context_len: int,
    n_shards: int = 64,
    salt: str = "pk",
) -> DataFrame:
    """LENGTH-BUCKETED sequence packing — the high-fill-rate sibling of
    :func:`pack_sequences`: documents of the same (capped) token length
    ``L`` pack ``k = floor(context_len / L)`` to a window, so every
    window holds equal-length documents (the batching regime efficient
    attention kernels prefer — no ragged windows, padding only in the
    per-(shard, length) remainder window). Deterministic: within each
    (shard, length) group documents fill windows in ``doc_id`` order.

    Output matches :func:`pack_sequences`'s schema —
    ``(shard, doc_id, window_id, win_offset, n_tok_packed, truncated)``
    — with ``window_id = capped_length · 2^32 + index`` (lengths and
    indexes are both far below 2^32, so the composite is collision-free
    and sorts by (length, index); :func:`pack_fill_stats` applies
    unchanged on the (shard, window_id) grain). Documents longer than
    the window truncate to ``context_len`` and flag, zero-token
    documents drop — identical contract to the next-fit packer.

    Unlike next-fit, this regime needs NO reset-carrying scan: the
    window assignment is pure integer arithmetic on a per-(shard,
    length) ``row_number`` — one keyed sort (the same cost class as the
    rank quotas), then map-only expressions end to end, no Python
    anywhere. The trade is fill rate vs stream order: bucketing ignores
    doc order across lengths but fills ``k·L/C ≥ 1 − L/C`` of every
    non-remainder window (measured 0.73 mean fill for next-fit vs
    ~0.9+ bucketed on uniform-length corpora).
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    tok = F.col(token_count_col).cast("long")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16,
            10,
        )
        .cast("long")
        % n_shards
    ).alias("shard")
    cap = F.lit(int(context_len))
    docs = (
        df.select(shard, F.col(id_col).alias("doc_id"), tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .select(
            "shard", "doc_id",
            F.least(F.col("n_tok"), cap).alias("packed"),
            (F.col("n_tok") > cap).alias("truncated"),
        )
    )
    w = Window.partitionBy("shard", "packed").orderBy("doc_id")
    k = F.floor(cap / F.col("packed"))  # docs per window for this length
    rn = F.row_number().over(w) - 1
    return docs.select(
        "shard",
        "doc_id",
        (F.col("packed") * F.lit(2**32) + F.floor(rn / k)).alias("window_id"),
        ((rn % k) * F.col("packed")).alias("win_offset"),
        F.col("packed").alias("n_tok_packed"),
        "truncated",
    )


def pack_fill_stats(packed: DataFrame, context_len: int) -> DataFrame:
    """Per-window fill report over :func:`pack_sequences` output:
    ``(shard, window_id, n_docs, n_tokens, fill_rate, n_truncated)``
    with ``fill_rate = n_tokens / context_len`` (one IEEE division of
    exact integers — oracle-reproducible). One keyed aggregation;
    partial aggregation applies."""
    return packed.groupBy("shard", "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok_packed").alias("n_tokens"),
        (
            F.sum("n_tok_packed").cast("double") / F.lit(float(context_len))
        ).alias("fill_rate"),
        F.sum(F.col("truncated").cast("long")).alias("n_truncated"),
    )


def boilerplate_removal(
    df: DataFrame,
    id_col: str,
    lines: Column,
    max_doc_freq: int = 2,
    joiner: str = " ",
) -> DataFrame:
    """Corpus-level boilerplate line removal (the CCNet / RefinedWeb
    line-dedup filter): drop EVERY instance of any line that occurs in
    more than ``max_doc_freq`` distinct documents (navigation chrome,
    cookie banners, license headers), then reconstruct each document
    from its surviving lines in order.

    Unlike :func:`passage_dedup` (which keeps the globally-first
    instance of each duplicated passage), boilerplate removal is a
    document-frequency filter: a line above the threshold is removed
    from ALL documents, including its first occurrence.

    ``lines`` is the per-document ``array<string>`` of lines (pass
    ``F.split(col, "\\n")`` for real text; the corpus entry segments the
    newline-free synthetic documents into fixed-width pseudo-lines).

    Output: one row per input document —
    ``(doc_id, n_lines, n_kept, cleaned_text)`` (``cleaned_text`` NULL
    when every line was boilerplate).

    Scale shape: line explosion is map-only; document frequency is one
    hash shuffle on the line text with partial aggregation
    (``approx``-free exact count-distinct on doc_id is safe because the
    grouping key IS the line — each group holds only that line's
    instances); the filter join is an equi-join on the same key, so AQE
    reuses the shuffle, and reconstruction re-aggregates by doc_id.
    Corpus-size-linear, no driver pulls.
    """
    from stream_sentinel_spark.operators.partitioning import spread_small

    # evaluate the (caller-supplied, possibly expensive) lines expression
    # ONCE, and spread the dimension-sized scan before the line fan-out —
    # every x41 stage ran single-task otherwise (see spread_small)
    src = spread_small(
        df.select(F.col(id_col).alias("doc_id"), lines.alias("_lines"))
    )
    p = src.select("doc_id", F.posexplode("_lines").alias("idx", "line"))
    common = (
        p.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("docfreq"))
        .filter(F.col("docfreq") > max_doc_freq)
        .select("line")
    )
    kept = (
        p.join(common, "line", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "line"))),
                    lambda s: s["line"],
                ),
                joiner,
            ).alias("cleaned_text"),
        )
    )
    totals = src.select(
        "doc_id", F.size("_lines").cast("bigint").alias("n_lines")
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        "cleaned_text",
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style LM filter,
    with the corpus's own unigram distribution standing in for the
    external KenLM): per-document mean negative log-likelihood
    ``nll = mean_t( -ln( count(t) / N ) ) = ln N - mean_t( ln count(t) )``
    over the document's tokens, where ``count(t)`` is the token's corpus
    frequency and ``N`` the corpus token total. Low nll = made of
    common words (boilerplate-ish); high nll = rare-word-heavy
    (noise-ish); the middle is what LM filters keep.

    Output: ``(doc_id, n_tokens, nll)`` with ``nll`` rounded to
    ``round_to`` decimals — ``ln`` is transcendental, so cross-engine
    comparison needs the round (sum order + libm differences live at
    1e-13; the round gives 7 orders of margin).

    Scale shape: two passes over the exploded tokens — one hash-agg for
    the frequency table (partial agg on the token key), one equi-join of
    tokens against it (both sides shuffle on the token; AQE broadcasts
    the frequency table when the vocabulary is small). ``N`` is a
    one-row broadcast scalar, never a driver ``count()``.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(word_tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    n_total = freq.agg(F.sum("cnt").cast("double").alias("n_total"))
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log("cnt")).alias("_mean_ln_cnt"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.log("n_total") - F.col("_mean_ln_cnt"), round_to).alias("nll"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Bigram language-model quality score — the order-2 companion to
    :func:`unigram_logprob`: per-document mean negative conditional
    log-likelihood ``nll = mean_i( -ln p(w_{i+1}|w_i) )`` with
    ``p(w2|w1) = count(w1,w2) / count(w1,·)`` estimated from the corpus
    itself. Unigram nll only sees word RARITY; the bigram score sees
    word ORDER — shuffled or templated text that reuses common words in
    improbable sequences scores high here while passing the unigram
    filter, which is why LM-based curation (CCNet-style) conditions on
    context.

    Output: ``(doc_id, n_bigrams, nll)`` — docs with fewer than two
    tokens have no bigram and are absent, mirroring the SQL oracle.
    ``nll`` is rounded like x43's: ``ln`` is the only transcendental
    and the round gives ~7 orders of margin over sum-order wobble.

    Scale shape: adjacent-pair explode is codegen (transform over a
    sequence — no UDF, no self-join on position), then one hash-agg for
    the pair table, one re-agg of IT for the prefix totals (touches the
    pair-vocab-sized frame, not the corpus), and one pair equi-join
    back (AQE broadcasts when the pair vocab is small; both sides key
    on (w1,w2) otherwise). No driver-side state. The tokenized frame is
    pinned: three consumers — the pair side, the pair counts, and
    through them the prefix counts — would each re-run the tokenize
    otherwise (measured 1.4 s → 0.9 s at sf0.1; an explicit
    spread_small was tried and NET-NEGATIVE here, because a whitespace
    split is too light to amortize the repartition shuffle the way the
    x24/x25 Arrow kernels do).
    """
    l = F.col("_l")
    pair = F.transform(
        F.sequence(F.lit(1), F.size(l) - 1),
        lambda i: F.struct(
            F.element_at(l, i).alias("w1"), F.element_at(l, i + 1).alias("w2")
        ),
    )
    toks = (
        df.select(F.col(id_col).alias("doc_id"), word_tokens(text_col).alias("_l"))
        .filter(F.size("_l") >= 2)
        .localCheckpoint()
    )
    pairs = toks.select("doc_id", F.explode(pair).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    fc = pc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        pairs.join(pc, ["w1", "w2"])
        .join(fc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(F.log("c1") - F.log("c2")).alias("_m"),
        )
        .select("doc_id", "n_bigrams", F.round("_m", round_to).alias("nll"))
    )


def bpe_merge_step(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 20,
    merge_symbol: str = "\x01",
    display: str = "<M>",
) -> DataFrame:
    """One iteration of byte-pair-encoding tokenizer induction
    (Sennrich et al. 2016): count every adjacent character pair in the
    corpus, fuse the most frequent pair into a single symbol everywhere
    (literal left-to-right non-overlapping replace — the BPE merge
    rule, and exactly what both engines' ``replace`` implements), and
    report the post-merge pair distribution's top-``top_k``. Ties are
    broken (count DESC, pair ASC, binary collation) so the winning
    merge and the reported tail are deterministic cross-engine.

    This is the inner step of tokenizer TRAINING — distinct from x71's
    word-bigram scoring (quality filtering) and x31's word vocabulary
    (term stats): the output of repeating this step is the merge table
    a BPE tokenizer ships. At scale the full training loop repeats
    this operator, accumulating the (driver-side, model-parameter-
    sized) merge list; each step is two corpus-wide hash-aggs on a
    ≤alphabet² pair key plus a map-only rewrite — no shuffle grows
    with iterations, and the one-row top-pair scalar rides a broadcast.

    Returns (pair, cnt) with the fused symbol rendered as ``display``.
    """

    def pair_counts(frame: DataFrame, col: str) -> DataFrame:
        # length gate: Spark's sequence(1, 0) DESCENDS (the
        # gram_arrays lesson), so sub-2-char rows must be filtered,
        # matching SQL range()'s empty result.
        c = F.col(col)
        pairs = F.transform(
            F.sequence(F.lit(1), F.length(c) - 1),
            lambda i: c.substr(i, F.lit(2)),
        )
        return (
            frame.filter(F.length(c) >= 2)
            .select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    from stream_sentinel_spark.operators.partitioning import spread_small

    # The per-char substr transform is heavy per row, so the
    # single-partition dimension scan serializes it (the x24 layout
    # pattern — measured 4.1 s → 1.8 s at sf0.1 with the spread; cf.
    # bigram_logprob, where the lighter tokenize did NOT pay for one).
    # Pinned: the top-pair agg and the merge rewrite each consume the
    # frame, and an unpinned base re-runs the scan + spread per branch.
    base = spread_small(df.select(F.col(text_col).alias("_t"))).localCheckpoint()
    top = (
        pair_counts(base, "_t")
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("_top"))
    )
    merged = base.crossJoin(F.broadcast(top)).select(
        F.replace(F.col("_t"), F.col("_top"), F.lit(merge_symbol)).alias("_m")
    )
    return (
        pair_counts(merged, "_m")
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top_k)
        # F.replace, not regexp_replace: merge_symbol/display are
        # parameters and must substitute LITERALLY (a '.' symbol would
        # otherwise match every character as a regex).
        .select(
            F.replace(F.col("pair"), F.lit(merge_symbol), F.lit(display)).alias(
                "pair"
            ),
            "cnt",
        )
    )


# A small BPE merge table over the fixture vocabulary (what iterating
# :func:`bpe_merge_step` learns): ordered, earlier merges feed later ones
# ("v"+"al" and "val"+"ue" only fire after "a"+"l" / "u"+"e").
DEFAULT_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("a", "l"),
    ("u", "e"),
    ("v", "al"),
    ("val", "ue"),
    ("s", "c"),
    ("sc", "a"),
)


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: tuple[tuple[str, str], ...] = DEFAULT_BPE_MERGES,
    top_k: int = 30,
    boundary: str = "\x01",
) -> DataFrame:
    """Apply a learned BPE merge table (the ENCODE side of x74's
    tokenizer-induction step) and report the resulting subword token
    distribution's top-``top_k`` by (count DESC, token ASC).

    Encoding is vocabulary-first — the scale-critical choice: word
    frequencies are counted ONCE (one corpus-wide hash-agg on the word
    key), the merge chain runs only over the DISTINCT vocabulary (Heaps'
    law: ≪ corpus size, and independent of corpus growth for a fixed
    domain), and subword counts recombine as ``Σ word_freq`` — a 100 TB
    corpus pays the per-word merge scan on millions of distinct words,
    not trillions of running words.

    Each character is wrapped in its own ``boundary`` delimiters
    (``the`` → ``␁t␁␁h␁␁e␁``) so a merge is the literal replace
    ``␁a␁␁b␁ → ␁ab␁``: the match consumes both symbols' full wrappers
    and adjacent merge sites never share a separator, unlike a
    single-space encoding where ``a b a b`` loses its second site to
    the shared middle space. Merges apply IN TABLE ORDER, one full
    left-to-right non-overlapping pass per merge — both engines'
    ``replace`` semantics, so the encoding is deterministic
    cross-engine. ``boundary`` must not occur in the text (the default
    ``\\x01`` cannot appear in the fixture's ``[a-z ]`` corpus).

    Greedy caveat (documented, identical in both engines): one pass per
    merge in table order is the standard fast BPE application, not the
    reference "lowest-merge-rank-first until fixpoint" loop; for merge
    tables whose right sides feed earlier rules' left sides the
    encodings can differ. The default table is ordered so every
    feeding merge precedes its consumer.
    """
    words = (
        df.select(F.explode(word_tokens(text_col)).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_wn"))
    )
    seq = F.regexp_replace(F.col("_w"), "(.)", f"{boundary}$1{boundary}")
    for a, b in merges:
        seq = F.replace(
            seq,
            F.lit(f"{boundary}{a}{boundary}{boundary}{b}{boundary}"),
            F.lit(f"{boundary}{a}{b}{boundary}"),
        )
    enc = words.select(seq.alias("_s"), "_wn")
    toks = enc.select(
        # trim the outer delimiters, then split on the doubled inner
        # ones (F.split is regex — \x01 has no metacharacter meaning,
        # but escape-by-brackets keeps that true for any boundary).
        F.explode(
            F.split(F.expr(f"trim(BOTH '{boundary}' FROM _s)"), f"[{boundary}]{{2}}")
        ).alias("token"),
        "_wn",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("_wn").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_k)
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 1024,
    round_to: int = 6,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): per-document importance log-weights from hashed
    unigram features — the standard "make the crawl look like the
    curated target domain" selection step. ``target`` is a boolean
    Column marking target-domain rows (e.g. ``F.col("source")
    .isin("wiki")``); the raw distribution is the whole input.

    Per token, the feature is an md5-derived bucket in ``[0, buckets)``
    (engine-portable: ``('0x' || substr(md5(w),1,8))::BIGINT %
    buckets`` — the same construction as sampling's ``_md5_bucket``).
    Bucket unigram models with add-1 smoothing give each doc

        score = Σ_b n_b · [ln p_target(b) − ln p_raw(b)] / Σ_b n_b

    (the length-normalized mean importance log-ratio; DSIR then keeps a
    Gumbel-top-k sample by this weight — composable with
    ``sampling.weighted_sample``). Output: (doc_id, n_tokens,
    dsir_score rounded to ``round_to``); docs with no tokens are
    absent (no feature evidence either way).

    Scale shape: the token explode feeds a (doc, bucket) hash-agg with
    map-side partial aggregation (≤``buckets`` rows per doc survive the
    map side); the bucket count tables are ≤``buckets`` rows — model
    parameters, broadcast to the per-doc join; the final per-doc agg is
    the only corpus-sized shuffle. Nothing iterates, nothing collects.
    Determinism: the log-ratio is composed from identical double ops on
    identical integer counts in both engines; only the per-doc sum
    order differs, absorbed by the rounding (≤ hundreds of same-scale
    terms per doc at round 6).
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            target.alias("_tgt"),
            F.explode(word_tokens(text_col)).alias("_w"),
        ).filter(F.col("_w") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_w")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    toks = toks.select("doc_id", "_tgt", bucket.alias("_b"))
    raw = toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    tgt = toks.filter("_tgt").groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    n_raw = raw.agg(F.sum("_cr").alias("_nr"))
    n_tgt = tgt.agg(F.sum("_ct").alias("_nt"))
    log_ratio = (
        # composed EXACTLY as the oracle writes it — same expression
        # tree, same IEEE ops, bit-identical per bucket.
        (F.log(F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(1)) - F.log(F.col("_nt") + F.lit(buckets)))
        - (F.log(F.col("_cr") + F.lit(1)) - F.log(F.col("_nr") + F.lit(buckets)))
    )
    lr_tab = (
        raw.join(tgt, "_b", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select("_b", log_ratio.alias("_lr"))
    )
    return (
        toks.groupBy("doc_id", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(lr_tab), "_b")
        .groupBy("doc_id")
        .agg(
            F.sum("_n").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("_n") * F.col("_lr")) / F.sum("_n"), round_to).alias(
                "dsir_score"
            ),
        )
    )


def nb_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ttr_num: int = 21,
    ttr_den: int = 50,
    round_to: int = 6,
    min_df: int = 1,
) -> DataFrame:
    """Bootstrapped model-based quality filter — the DCLM/RefinedWeb
    two-stage pattern (Li et al. 2024, arXiv:2406.11794; fastText
    classifier seeded from heuristic labels), with a Naive-Bayes bag-of-
    words standing in for fastText (no external model libs; NB is the
    closed-form member of the same linear-scorer family):

    1. **Heuristic seed labels**: a document is labeled high-quality iff
       its type-token ratio clears ``ttr_num/ttr_den`` (default 21/50 =
       0.42 — repetitive docs score low). The comparison is pure integer
       arithmetic (``den·distinct >= num·total``), so the label is
       engine-exact with no float boundary.
    2. **Token log-odds** with add-1 smoothing over the shared
       vocabulary ``V``:
       ``w(t) = [ln(c_hi(t)+1) − ln(H+V)] − [ln(c_lo(t)+1) − ln(L+V)]``
       where ``c_*`` are per-class token-instance counts and ``H/L`` the
       class token totals.
    3. **Model score** per document: the mean of ``w(t)`` over its token
       instances (length-normalized, like :func:`dsir_weights`), rounded
       to ``round_to``; ``pred_hi = score > 0``.

    Distinct from :func:`dsir_weights`: DSIR reweights toward a GIVEN
    target domain; this op LEARNS its target from the data's own
    heuristic and returns label + prediction side by side, so the
    actionable output is the disagreement set — docs the model rescues
    (label lo, pred hi) or demotes (label hi, pred lo), exactly what a
    curation pipeline escalates to stronger scoring.

    Output: ``(doc_id, n_tokens, label_hi, score, pred_hi)``.

    Scale shape: the seed label is a MAP-SIDE expression (distinct count
    over the doc's own token array rides the explode — no per-doc
    aggregation, no label join-back), so the whole op is one labeled
    token explode feeding (a) a per-token hash-agg for the two class
    counts (model parameters — vocabulary-sized, joined back: AQE picks
    broadcast when the vocabulary fits and degrades to a shuffle join
    when a web-scale typo/noise tail blows it past the broadcast limit,
    instead of failing outright on a forced broadcast) and
    (b) the final per-doc agg — exactly two corpus-sized shuffles.
    Nothing iterates or collects; the "training" is a single
    aggregation pass, which is what makes the bootstrap viable at
    100 TB. Determinism: counts are integers, the log-odds expression
    tree matches the oracle's op-for-op, and only per-doc sum order
    differs — absorbed by the round (dsir precedent).

    ``min_df`` bounds the WEIGHT TABLE itself (ADVICE r08 follow-up to
    dropping the forced broadcast): tokens with fewer than ``min_df``
    corpus-wide instances are cut from the vocabulary before the
    smoothing totals, so ``V``/``H``/``L`` are computed over the
    SURVIVING vocabulary — a well-defined NB over the truncated
    alphabet, reproduced identically by the oracle with one HAVING
    clause. On a web-scale corpus the typo/noise tail is the unbounded
    part of the vocabulary and contributes ~zero log-odds signal
    (a count-1 token's weight is dominated by the smoothing constant),
    so ``min_df=2`` typically shrinks the weight table by the Heaps'
    singleton share (~half) and restores broadcast-ability at no
    classification cost. Cut tokens contribute neither weight nor
    length: ``n_tokens`` counts SCORED instances, and a doc whose every
    token is cut is absent from the output (it has no score). The df
    here is instance count, not distinct-document count — for the tail
    the two coincide, and instances avoid a second count-distinct pass.
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    # the seed label is computable MAP-SIDE from the token array
    # (distinct count over a ~doc-length array is a per-row expression),
    # so it rides the explode instead of costing a per-doc aggregation
    # plus a corpus-sized join-back — two shuffles the first version of
    # this operator paid for nothing
    toks_arr = F.filter(word_tokens(text_col), lambda w: w != "")
    lab_toks = df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.lit(ttr_den) * F.size(F.array_distinct(toks_arr))
            >= F.lit(ttr_num) * F.size(toks_arr)
        ).alias("label_hi"),
        F.explode(toks_arr).alias("_w"),
    )
    counts = lab_toks.groupBy("_w").agg(
        F.sum(F.when(F.col("label_hi"), 1).otherwise(0)).alias("_chi"),
        F.sum(F.when(F.col("label_hi"), 0).otherwise(1)).alias("_clo"),
    )
    if min_df > 1:
        # cut the tail BEFORE the smoothing totals: V/H/L describe the
        # surviving vocabulary (see docstring)
        counts = counts.filter(F.col("_chi") + F.col("_clo") >= min_df)
    totals = counts.agg(
        F.sum("_chi").alias("_h"),
        F.sum("_clo").alias("_l"),
        F.count(F.lit(1)).alias("_v"),
    )
    # composed EXACTLY as the oracle writes it — same expression tree,
    # same IEEE ops, bit-identical per token.
    log_odds = (
        F.log(F.col("_chi") + F.lit(1)) - F.log(F.col("_h") + F.col("_v"))
    ) - (F.log(F.col("_clo") + F.lit(1)) - F.log(F.col("_l") + F.col("_v")))
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "_w", log_odds.alias("_lw")
    )
    # no forced broadcast on the weights side: the vocabulary is
    # unbounded on web-scale corpora (typo/noise tail), so a forced
    # broadcast could exceed the driver/executor limit and fail
    # outright — AQE broadcasts when the runtime size estimate fits
    # and falls back to a shuffle join when it doesn't
    return (
        lab_toks.join(weights, "_w")
        .groupBy("doc_id", "label_hi")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 collapses IEEE negative zero (a doc whose rounded
            # score is -0.0 here and +0.0 in the oracle is a value-hash
            # mismatch on a semantically identical result)
            (F.round(F.avg("_lw"), round_to) + F.lit(0.0)).alias("score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "label_hi",
            "score",
            (F.col("score") > 0).alias("pred_hi"),
        )
    )


def quality_tiles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    tiles: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-group quality-quantile selection report — the "keep the top
    deciles per language" curation step (the RefinedWeb/FineWeb shape:
    quality thresholds are set per language, not globally, because
    heuristic scores aren't comparable across languages). Scores every
    doc with :func:`text.quality_features`'s composite, NTILEs within
    each group ordered (score DESC, id) — the id tie-break makes tile
    assignment deterministic for the heavily-tied heuristic scores —
    and reports each (group, tile)'s size and score stats; a caller
    keeps tiles 1..k by filtering the scored frame the same way.

    Plan: map-only scoring, one keyed sort for the per-group window
    (NTILE needs a total order within group only — scales as a keyed
    sort, the same cost class as x16/x17's rank quotas), then a
    hash-agg on the (group, tile) key. mean_score is rounded: the
    thirds in the composite make per-doc scores exact IEEE, but the
    group SUM's order differs across engines at 1e-16.

    Returns (group_col, tile, n_docs, mean_score, min_score).
    """
    from stream_sentinel_spark.operators import text as _text

    # quality_features normalizes its id column's NAME to "doc_id";
    # rename it back so arbitrary id_col values keep working.
    scored = (
        _text.quality_features(df, id_col, text_col)
        .select(F.col("doc_id").alias(id_col), "quality_score")
        .join(df.select(id_col, group_col), id_col)
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("tile", F.ntile(tiles).over(w))
        .groupBy(group_col, "tile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), round_to).alias("mean_score"),
            F.round(F.min("quality_score"), round_to).alias("min_score"),
        )
    )


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment: ``shard = md5-bucket(id)
    mod n_shards`` (the engine-portable 32-bit bucket shared with the
    sampling operators). Hash assignment, not global-rank assignment,
    is the 100 TB shape: a rank-based split needs a total order (one
    all-data sort or a single-partition window); the hash is map-only,
    stable under repartitioning, and balanced to ±O(sqrt(rows/shard)).
    Re-running on a grown corpus moves no existing row between shards.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return _assign_with_bucket(df, id_col, n_shards, salt).drop("__bucket")


def _assign_with_bucket(
    df: DataFrame, id_col: str, n_shards: int, salt: str
) -> DataFrame:
    """shard_assignment keeping the raw 32-bit bucket column
    (``__bucket``) alongside — the manifest checksum sums it, so
    carrying it avoids a second md5 evaluation per row."""
    from stream_sentinel_spark.operators.sampling import _md5_bucket

    b = _md5_bucket(id_col, salt)
    return df.withColumn("__bucket", b).withColumn(
        "shard", (F.col("__bucket") % n_shards).cast("int")
    )


def _manifest_of(sharded: DataFrame, id_col: str) -> DataFrame:
    """The ONE definition of the manifest aggregation, over a frame
    carrying (shard, __bucket): a second copy of the checksum
    construction anywhere would let write_shards manifests silently
    desynchronize from shard_manifest re-derivations — defeating the
    compare-the-checksum contract."""
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__bucket").alias("checksum"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Shard manifest for a training-data export: one row per shard with
    ``(shard, n_rows, checksum, min_id, max_id)``. ``checksum`` is the
    SUM of the rows' 32-bit md5 buckets — order-independent (valid
    under any partitioning / merge order) and engine-portable, so a
    consumer can re-derive and compare it without replaying the export
    order. One hash-agg shuffle on the shard id; partial aggregation
    does the heavy lifting map-side; md5 evaluates once per row (the
    bucket column feeds both the shard id and the checksum).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return _manifest_of(
        _assign_with_bucket(df, id_col, n_shards, salt), id_col
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Write the corpus as ``n_shards`` deterministic parquet shards
    (``path/shard=K/``) and return the manifest. The repartition ON the
    shard column co-locates each shard's rows so every Hive partition
    directory is written by exactly one task (no small-file explosion:
    files-per-shard = 1, not = upstream partitions). The manifest is
    aggregated from the SAME frame the writer consumed (md5 evaluated
    once per row, bucket carried), so it provably describes the rows
    written even if ``df``'s lineage were nondeterministic.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = _assign_with_bucket(df, id_col, n_shards, salt).localCheckpoint(
        eager=False
    )
    (
        out.drop("__bucket")
        .repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return _manifest_of(out, id_col)


def temperature_rebalance(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    anchor_target: int = 1000,
    salt: str = "rebal",
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual-corpus
    sampling rule — e.g. the :math:`p_l \\propto |D_l|^{\\alpha}`
    schedule of mBERT/XLM-R): per-group keep targets
    ``floor(anchor_target * (n_g / n_max)^alpha + 0.5)``, realized as a
    deterministic md5 hash sample at rate ``min(1, target/n_g)``.

    Anchoring at the LARGEST group (rather than normalizing by the sum
    of powered weights) keeps the arithmetic engine-exact: the weight
    is a single ``pow`` of a ratio of two exact integers — no
    cross-group float summation whose order could differ between
    engines. ``alpha < 1`` flattens the distribution (upweights tail
    groups); ``alpha = 1`` is proportional; ``alpha = 0`` is uniform.

    Two passes over the corpus by construction — a distribution pass
    (tiny group-key aggregation) and a decision pass (map-only filter
    against the broadcast per-group cutoffs); that is the minimum for
    any globally-informed sampler. The sample itself inherits
    :func:`~stream_sentinel_spark.operators.sampling.hash_sample`'s
    properties: reproducible across runs/engines/partitionings and
    mergeable across incremental ingests.

    Returns one row per group: (group, n_docs, weight double ∈ (0,1],
    target bigint, n_sampled bigint).
    """
    from stream_sentinel_spark.operators.sampling import _md5_bucket

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    sizes = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    everything = Window.partitionBy()
    plan = sizes.select(
        "group", "n_docs",
        F.pow(
            F.col("n_docs") / F.max("n_docs").over(everything), F.lit(alpha)
        ).alias("weight"),
    ).select(
        "group", "n_docs", "weight",
        F.floor(F.col("weight") * F.lit(anchor_target) + F.lit(0.5))
        .cast("long")
        .alias("target"),
    ).select(
        "group", "n_docs", "weight", "target",
        (
            F.least(F.lit(1.0), F.col("target") / F.col("n_docs"))
            * F.lit(float(1 << 32))
        ).cast("long").alias("_cutoff"),
    ).localCheckpoint(eager=False)
    # ^ the group-cardinality plan frame is consumed twice (broadcast
    # into the decision pass, then the final join); the barrier pins it
    # so the distribution pass scans the corpus once, not per consumer.
    sampled = (
        docs.select(
            F.col(group_col).alias("group"),
            _md5_bucket(id_col, salt).alias("_bucket"),
        )
        .join(F.broadcast(plan.select("group", "_cutoff")), "group")
        .filter(F.col("_bucket") < F.col("_cutoff"))
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        plan.join(sampled, "group", "left")
        .select(
            "group", "n_docs",
            F.round("weight", 6).alias("weight"),
            "target",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
    )


def shard_column_stats(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    stat_cols: list[str],
    salt: str = "shard",
) -> DataFrame:
    """Per-shard, per-column min/max/null-count — the file-skipping
    index an export writes next to its shards (the parquet
    footer-stats / Iceberg manifest role): a reader with a predicate on
    any stat column prunes whole shards whose [min, max] cannot match.

    Long-form output keeps the schema fixed however many columns are
    profiled: (shard, column, min_value string, max_value string,
    n_nulls, n_rows). min/max are computed on the TYPED column (so
    numeric columns order numerically) and rendered to strings only at
    the end. One aggregation on the shard key, then a map-only unpivot
    of the 3·|cols|-wide row — the stats frame never exceeds
    n_shards × |cols| rows.
    """
    sharded = shard_assignment(df, id_col, n_shards, salt)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
    wide = sharded.groupBy("shard").agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__min_{c}").cast("string").alias("min_value"),
            F.col(f"__max_{c}").cast("string").alias("max_value"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
        )
        for c in stat_cols
    ]
    return wide.select(
        "shard", F.col("__n").alias("n_rows"), F.explode(F.array(*rows)).alias("s")
    ).select(
        "shard", "s.column", "s.min_value", "s.max_value", "s.n_nulls", "n_rows"
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment by NEAR-DUP CLUSTER, not by document —
    the leakage guard a training-data pipeline needs: splitting i.i.d.
    by doc id puts near-duplicates of training documents into the eval
    split, silently inflating every benchmark (the canonical
    contamination mode alongside x25's n-gram decontamination).

    ``clusters`` is an (id, component) frame — e.g. the output of
    :func:`~stream_sentinel_spark.operators.dedup.dedup_clusters`, where
    ``component`` is the cluster's minimum member id — so every member
    of a cluster shares one split decision: the md5 bucket of the
    COMPONENT id (sampling's ``_md5_bucket`` construction, engine-
    portable and deterministic). Docs absent from ``clusters`` are
    singletons: their component is their own id.

    Output: (id, component, split ∈ {'train','val','test'}). Scale: one
    left join on the doc id + a map-only hash decision; rates are exact
    in expectation over clusters (weighted by cluster count, not doc
    count — by design: the unit of independence is the cluster).
    """
    from stream_sentinel_spark.operators.sampling import _md5_bucket

    if val_rate < 0 or test_rate < 0 or val_rate + test_rate > 1.0:
        raise ValueError(
            f"rates must be non-negative with val+test <= 1, "
            f"got val={val_rate} test={test_rate}"
        )
    test_cut = int(test_rate * (1 << 32))
    val_cut = test_cut + int(val_rate * (1 << 32))
    joined = docs.select(F.col(id_col).alias("id")).join(
        clusters.select("id", "component"), "id", "left"
    ).withColumn("component", F.coalesce(F.col("component"), F.col("id")))
    b = _md5_bucket("component", salt)
    return joined.select(
        "id",
        "component",
        F.when(b < F.lit(test_cut), F.lit("test"))
        .when(b < F.lit(val_cut), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    source_col: str,
) -> DataFrame:
    """Which sources duplicate EACH OTHER — the corpus-mixing
    diagnostic: a roll-up of verified near-dup pairs by unordered
    source pair. High cross-source mass means two feeds are largely the
    same crawl (deduplicate before mixing, or down-weight one); high
    diagonal mass means a feed self-duplicates.

    ``pairs`` is any verified near-dup frame with (a_id, b_id, shared,
    a_sz, b_sz, jaccard) — x02's n-gram operator at oracle scale, the
    MinHash-LSH path at 100 TB. Aggregates are deliberately
    ORDER-INDEPENDENT so the result is bit-identical cross-engine:
    n_pairs (count), max_jaccard (max of exact int/int divisions), and
    micro_jaccard = Σ shared / Σ union — two integer sums and ONE float
    division, no float accumulation.

    Scale: the roll-up output is at most S² rows for S sources; the two
    id joins broadcast the (id, source) projection when sources ride a
    dimension-sized frame, else hash-join on the pair ids."""
    sa = docs.select(
        F.col(id_col).alias("a_id"), F.col(source_col).alias("a_src")
    )
    sb = docs.select(
        F.col(id_col).alias("b_id"), F.col(source_col).alias("b_src")
    )
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            F.least("a_src", "b_src").alias("source_a"),
            F.greatest("a_src", "b_src").alias("source_b"),
            "shared",
            (F.col("a_sz") + F.col("b_sz") - F.col("shared")).alias("_union"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
            (
                F.sum("shared").cast("double") / F.sum("_union")
            ).alias("micro_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def novelty_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    key_mode: str = "hash",
) -> DataFrame:
    """Per-document NOVELTY under ingestion order (ascending id): the
    fraction of the doc's distinct character n-grams whose FIRST
    corpus occurrence (minimum doc id) is this doc. Exact duplicates of
    earlier docs score 0, fresh content scores near 1 — the marginal-
    contribution signal that ranks which documents actually add text to
    a training mix (the per-doc complement of the pairwise dedup
    operators: no pair enumeration, so it scales as two hash
    aggregations + one gram join at any corpus size).

    Output (doc_id, n_grams, n_novel, novelty) — novelty is one
    int/int division, bit-identical cross-engine. Docs shorter than
    ``n`` are absent (no grams — same universe as the Jaccard family,
    :func:`~stream_sentinel_spark.operators.dedup.gram_arrays`).

    ``key_mode`` picks the gram join/agg key: ``"hash"`` (default — the
    engine path) keys the first-occurrence aggregation and the gram
    join on ``xxhash64(gram)``, so the two shuffles move fixed 8-byte
    longs instead of n-char strings. The byte savings scale with key
    WIDTH: for this operator's short character grams they are nil
    (measured: shuffle-bytes ratio 0.98 at n=3, STRESS_r06_hashkey.json
    — a 3-char gram is already smaller than an 8-byte long; the wall
    win there, 8.6→5.4 s, comes from cheaper fixed-width key compare/
    hash, not bytes), while :func:`duplicated_window_rate`'s k-token
    windows get the real byte reduction (2.99× at k=8, same artifact).
    Grams never appear in the output, so the result is identical up to
    an xxhash64 collision — P ≈ G²·2⁻⁶⁴ over G distinct grams, zero at
    any tested scale and oracle-checked collision-free at sf0.01/0.1.
    ``"string"`` keys on the raw gram — the construction the DuckDB
    oracle mirrors literally (no xxhash64 there)."""
    from stream_sentinel_spark.operators.dedup import gram_arrays

    if key_mode not in ("hash", "string"):
        raise ValueError(f"unknown key_mode: {key_mode!r}")
    sh = gram_arrays(docs, id_col, text_col, n).select(
        "id", F.explode("grams").alias("gram")
    )
    if key_mode == "hash":
        sh = sh.select("id", F.xxhash64("gram").alias("gram"))
    firsts = sh.groupBy("gram").agg(F.min("id").alias("first_id"))
    return (
        sh.join(firsts, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def duplicated_window_rate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    key_mode: str = "hash",
) -> DataFrame:
    """Span-level duplication rate per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of a doc's k-token sliding windows that occur ≥2 times in
    the corpus (any doc, including the same one). Document-level dedup
    misses partially-copied text — boilerplate wrappers around fresh
    content, quotes, templated spans — which is exactly what repeated
    windows measure; docs with a high rate are the memorization risk.

    Output (doc_id, n_windows, n_dup, dup_rate); dup_rate is one
    int/int division. Docs with fewer than ``k`` whitespace tokens are
    absent. Scale: explode → one window-key hash agg → one key join →
    one doc agg; Catalyst dedups the explode across the agg and join
    consumers.

    ``key_mode`` picks the window join/agg key: ``"hash"`` (default —
    the engine path) keys on ``xxhash64`` of the joined k-token string,
    so the occurrence-count shuffle and the key join move 8-byte longs
    instead of ~k-token strings (~10× fewer shuffle bytes at k=10 —
    the dominant cost at 100 TB, where the exploded windows are ~k× the
    corpus text; the window string never reaches the output, so the
    result is identical up to an xxhash64 collision — P ≈ W²·2⁻⁶⁴,
    zero at any tested scale and oracle-checked collision-free at
    sf0.01/0.1). ``"string"`` keys on the raw window string — the
    construction the DuckDB oracle mirrors literally."""
    if key_mode not in ("hash", "string"):
        raise ValueError(f"unknown key_mode: {key_mode!r}")
    toks = F.split(F.col("_t"), " ")
    win_str = lambda i: F.array_join(F.slice("_t_arr", i, k), " ")  # noqa: E731
    wins = F.transform(
        F.sequence(F.lit(1), F.size("_t_arr") - (k - 1)),
        (lambda i: F.xxhash64(win_str(i))) if key_mode == "hash" else win_str,
    )
    base = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .select("id", toks.alias("_t_arr"))
        .filter(F.size("_t_arr") >= k)
        .select("id", F.explode(wins).alias("win"))
    )
    cnt = base.groupBy("win").agg(F.count(F.lit(1)).alias("_n"))
    return (
        base.join(cnt, "win")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_n") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_windows",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_windows")).alias("dup_rate"),
        )
        .orderBy("doc_id")
    )


def excise_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact-substring deduplication as a REWRITE (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better", at word granularity): every token covered by a k-token
    window whose exact content occurs more than once in the corpus —
    across documents or within one — is removed, EXCEPT the globally
    first occurrence (ordered by (doc_id, position)), which survives.
    This is the destructive counterpart to the scoring ops: x83
    (:func:`duplicated_window_rate`) measures span-level duplication,
    x39 (:func:`passage_dedup`) drops whole duplicated passages; this
    rewrites the document itself, the form training-data pipelines
    actually ship.

    Semantics, deterministically: window at position ``i`` (1-based)
    covers tokens ``i..i+k-1``; its identity is the md5 of the
    chr(31)-joined token slice. Occurrences of each window are ranked by
    (doc_id, pos); occurrences with rank > 1 mark all their positions
    covered; a document's clean_text is its uncovered tokens rejoined in
    order (may be empty — a verbatim duplicate document excises to '').
    First-occurrence-wins makes the output stable under corpus
    reordering of the input files (the rank key is data, not partition
    order).

    Output: ``(doc_id, n_kept, n_removed, clean_text)`` — one row per
    input document, including untouched and fully-excised ones.

    Scale shape: the window inventory is a map-side pass (one md5 per
    token position — O(total tokens) rows, never materializing the
    token slices beyond the hash input). First occurrences come from a
    HASH-AGG, not a window function: count + min(struct(doc_id, pos))
    both partial-aggregate map-side, so the shuffle carries one row per
    distinct window per map partition rather than every occurrence, and
    the unique tail (the overwhelming bulk of a real corpus) is dropped
    by the cnt>1 filter before anything joins — no sort-per-hash of the
    full inventory ever happens. The duplicated-occurrence join is
    skew-tolerant (a pathologically hot window is one hash key; AQE
    skew-split applies); covered-position expansion is a bounded
    explode (×k) of only the DUPLICATED occurrences; the rebuild is one
    per-doc hash-agg. No self-join of windows against windows — the
    min-over-hash formulation replaces the quadratic pair enumeration
    the naive formulation would do. At 100 TB the heavy object is the
    (hash, doc, pos) inventory, linear in corpus tokens, exactly what
    the suffix-array pipelines in the paper stream to disk.
    """
    sep = "\x1f"
    d = df.select(F.col(id_col).alias("doc_id"), word_tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    tok = d.select(
        "doc_id",
        F.posexplode("_toks").alias("_p0", "tok"),
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "tok")
    win = d.select(
        "doc_id",
        F.explode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.concat_ws(sep, F.slice("_toks", i, k))
                        ).alias("wh"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,wh:string>>"))
        ).alias("_w"),
    ).select("doc_id", F.col("_w.pos").alias("pos"), F.col("_w.wh").alias("wh"))
    # "rank > 1" ⇔ "not the min-(doc_id, pos) occurrence". Computing the
    # min via hash-agg instead of row_number() matters at scale: both
    # count and min(struct) PARTIAL-aggregate map-side (the shuffle
    # carries one row per distinct window per map partition, not every
    # occurrence), the filter drops the unique tail — the overwhelming
    # bulk of any real corpus — before the join, and no sort-per-hash
    # of the full window inventory ever happens (a window function
    # would sort ALL occurrences inside every hash partition).
    firsts = (
        win.groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct("doc_id", "pos")).alias("_first"),
        )
        .filter(F.col("_cnt") > 1)
        .select("wh", "_first")
    )
    covered = (
        win.join(firsts, "wh")
        .filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("pos") != F.col("_first.pos"))
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        d.select("doc_id", n.alias("_n"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("_n") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def factorize(
    df: DataFrame, cols: Sequence[str], id_name: str = "dim_id"
) -> tuple[DataFrame, DataFrame]:
    """Dimension extraction — dictionary-encode low-cardinality
    column(s) into a dense surrogate-keyed dim table and swap the fact
    side to the integer key: ``(dims, fact)`` where ``dims`` is one row
    per distinct tuple with ``id_name`` densely numbered 1..K in the
    tuple's own sort order (DETERMINISTIC — the same data always yields
    the same ids, so two runs, or an engine and its oracle, agree
    without coordination), and ``fact`` is ``df`` with the tuple
    replaced by the key. The normalization every warehouse does to
    string-typed metadata (source, lang, license, …) before a 100 TB
    fact table carries it a billion times.

    Scale shape: the distinct is a map-side-partial hash aggregation
    producing a vocabulary-sized frame; the dense numbering runs a
    window WITHOUT partitioning over that frame ONLY (single-task by
    construction, bounded by the dimension's cardinality — the same
    contract as IVF centroids / vocabulary frames elsewhere); the fact
    swap is one broadcast join. NULL tuple components are legitimate
    dimension members (dense_rank sorts them first, per Spark's
    NULLS FIRST default — matching the oracle's explicit
    ``NULLS FIRST``)."""
    cs = list(cols)
    if not cs:
        raise ValueError("factorize needs at least one column")
    order = Window.orderBy(*[F.col(c) for c in cs])
    dims = (
        df.select(*cs)
        .distinct()
        .withColumn(id_name, F.dense_rank().over(order).cast("long"))
        .localCheckpoint(eager=False)
    )
    # null-safe equality: a NULL tuple component is a real dimension
    # member, and a plain equi-join would silently leave its fact rows
    # keyless (NULL = NULL is NULL)
    renamed = dims.select(
        *[F.col(c).alias(f"__dim_{c}") for c in cs], id_name
    )
    cond = F.lit(True)
    for c in cs:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__dim_{c}"))
    fact = (
        df.join(F.broadcast(renamed), cond, "left")
        .drop(*cs, *[f"__dim_{c}" for c in cs])
    )
    return dims, fact


def select_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    tokens_col: str,
    id_col: str,
    partitions: int = 32,
) -> DataFrame:
    """Greedy token-budget dataset selection: take documents in
    descending ``score_col`` order (ties broken by ``id_col`` — a
    total order) until the cumulative ``tokens_col`` would exceed
    ``budget``; whole documents only, no truncation. The step between
    scoring (quality classifiers, DSIR) and training-set assembly:
    "fill 10 B tokens with the best documents we have".

    The running sum is GLOBAL but never single-task: documents
    range-partition by (score desc, id) — so partition i holds
    strictly better documents than partition i+1 — then one
    O(partitions) driver pull of per-partition token totals turns into
    exclusive offsets, and each partition computes its own prefix sum
    under a per-partition window. Two narrow passes over a pinned
    layout instead of Spark's one-partition global window (the classic
    cumulative-sum scale trap). The pinned layout (localCheckpoint) is
    also what makes ``spark_partition_id`` a stable join key between
    the two passes.

    Returns ``df``'s columns plus ``running_total`` (cumulative tokens
    INCLUSIVE of the row), filtered to ``running_total <= budget``.
    Rows with NULL score or tokens are rejected loudly — a NULL in the
    sort key would land in an engine-defined position, and a NULL token
    count makes every downstream total NULL."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    bad = df.filter(
        F.col(score_col).isNull() | F.col(tokens_col).isNull()
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"select_token_budget: NULL {score_col!r} or {tokens_col!r} "
            "rows present — filter or impute them first"
        )
    laid = (
        df.repartitionByRange(
            partitions, F.col(score_col).desc(), F.col(id_col)
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    partials = {
        r["_pid"]: r["t"]
        for r in laid.groupBy("_pid")
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
        .collect()
    }
    running, offsets = 0, []
    for pid in sorted(partials):
        offsets.append((pid, running))
        running += partials[pid]
    odf = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        laid.join(F.broadcast(odf), "_pid")
        .withColumn(
            "running_total",
            F.col("_offset") + F.sum(F.col(tokens_col).cast("long")).over(w),
        )
        .filter(F.col("running_total") <= budget)
        .drop("_pid", "_offset")
    )
    return out
