"""Corpus indexing: inverted-index (postings) construction and PMI
collocation mining.

Training-data pipelines build token indexes for two reasons: fast
contamination / membership probes (an inverted index over n-grams) and
tokenizer or phrase-vocabulary induction (collocations by pointwise
mutual information — Church & Hanks 1990). Both are pure relational
plans over an exploded token stream:

- postings: explode → hash-aggregate on the token key. The posting
  list per token is bounded by an explicit cap before it is
  materialized (``slice`` of the sorted set) — an uncapped
  ``collect_list`` on a 100 TB corpus is a single-reducer OOM for
  stop-word tokens, so the cap is part of the operator contract, with
  the full document frequency kept alongside as the exact count.
- PMI: two hash-aggregations (unigrams, adjacent bigrams) joined on
  the bigram's parts. The unigram frame is vocabulary-sized, so AQE
  broadcast-joins it; corpus totals ride along as one-row broadcast
  scalars (no second scan, no driver round-trip).

Cross-engine determinism: counts are exact integers; PMI is a single
``ln`` of a ratio of exact-integer products rounded to 6 decimals
(same transcendental-margin rule as the unigram-LM scorer in
``curation.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.curation import word_tokens


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    postings_cap: int = 20,
    min_df: int = 1,
) -> DataFrame:
    """Token → (document frequency, term frequency, capped postings).

    ``postings`` holds the first ``postings_cap`` doc ids in ascending
    id order, serialized as a comma-joined string (keeps the compared
    value scalar); ``df``/``tf`` are exact corpus-wide counts. One
    explode + one token-key hash aggregation; ``collect_set`` is
    bounded per token by the corpus's doc count but the MATERIALIZED
    output is bounded by the cap — the full postings of a stop-word
    never leave the aggregation buffer on the way to the result.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(text_col)).alias("token"),
    )
    # ONE collect_set serves df (its size) and the capped postings —
    # a count_distinct alongside it would add an Expand that doubles
    # the exploded token stream through the shuffle
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_set("doc_id")).alias("_docs"),
    ).select(
        "token",
        F.size("_docs").cast("long").alias("df"),
        "tf",
        F.array_join(F.slice("_docs", 1, postings_cap), ",").alias("postings"),
    )
    if min_df > 1:
        agg = agg.filter(F.col("df") >= min_df)
    return agg


def pmi_collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 10,
    top_k: int = 50,
) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual
    information: ``pmi = ln( (c12/B) / ((c1/N) * (c2/N)) )`` with N the
    corpus unigram total and B the bigram total.

    Bigrams come from zipping each token array against itself shifted
    by one (``slice`` twice + ``arrays_zip`` — map-side, no
    positional join); unigram and bigram counts are two hash
    aggregations; the unigram frame joins back onto the bigram frame
    twice on vocabulary-sized keys (AQE broadcasts), and N/B attach as
    a one-row broadcast scalar. Top-k orders by (pmi desc, w1, w2) —
    a total order, so the cut is deterministic — and Spark plans it as
    TakeOrderedAndProject (no global sort).

    Returns (w1, w2, n12 bigint, n1 bigint, n2 bigint, pmi double).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), word_tokens(text_col).alias("toks")
    )
    # Exactly TWO passes over the corpus (the unigram agg and the
    # bigram agg); everything downstream — totals, the two count
    # joins, the top-k — runs on the materialized vocabulary-sized
    # frames. Without the localCheckpoint barriers Catalyst re-derives
    # each consumer's lineage from the scan (no ReuseExchange across
    # DataFrame reuse), which at corpus scale means five full scans
    # for a dictionary's worth of output.
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    k = F.size("toks")
    bi_all = (
        toks.filter(k >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, k - 1).alias("w1"),
                    F.slice("toks", 2, k - 1).alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n12"))
        .localCheckpoint(eager=False)
    )
    bi = bi_all.filter(F.col("n12") >= min_count)
    totals = F.broadcast(
        uni.agg(F.sum("n").alias("n_total")).crossJoin(
            # every adjacency is a bigram, so the bigram total is the
            # sum of ALL bigram counts (pre-support-filter) — no third
            # corpus pass
            bi_all.agg(F.sum("n12").alias("b_total"))
        )
    )
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n2")), "w2")
        .crossJoin(totals)
        .select(
            "w1", "w2", "n12", "n1", "n2",
            F.round(
                F.log(
                    # double arithmetic up front: the integer product
                    # n12·N² overflows int64 on a web-scale corpus
                    (F.col("n12").cast("double") * F.col("n_total") * F.col("n_total"))
                    / (
                        F.col("b_total").cast("double")
                        * F.col("n1")
                        * F.col("n2")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(top_k)


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str,
    text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k keyword retrieval by Okapi BM25 (Robertson & Walker 1994,
    the Lucene idf variant): for each document,

        score = Σ_t  ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
                     · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·dl_d/avgdl))

    with N the corpus document count, df/tf exact corpus counts, dl the
    document's token length and avgdl the corpus mean length (both over
    ALL documents — a zero-match document still shapes the length
    normalization). The ``+ 1`` inside the ln keeps idf positive for
    stop-word-frequent terms (Lucene's fix), so every matched term adds
    signal and the top-k cut is stable.

    Scale shape: the query's terms filter the exploded token stream
    BEFORE the (doc, term) aggregation, so the shuffled volume is the
    query's postings only — never the corpus vocabulary; df attaches by
    a ≤|terms|-row broadcast; (N, avgdl) attach as a one-row broadcast
    scalar computed in the same pass as the per-doc lengths. The final
    cut orders by (rounded score desc, doc_id) — a total order, planned
    as TakeOrderedAndProject (no global sort). Rounding to 6 decimals
    happens BEFORE the ordering so the engine and the oracle cut the
    same boundary (sum-order double noise is ~1e-15 relative; the
    transcendental-margin rule as pmi_collocations).

    Reference anchor: the reference's query surface has no ranked
    retrieval (core-engine RuleEvaluator is boolean predicates); this
    is the training-data extension's search primitive over
    ``documents``. Returns (doc_id, n_terms, score double) — n_terms =
    how many distinct query terms matched.
    """
    qterms = sorted({t for t in terms})
    if not qterms:
        raise ValueError("bm25_topk needs at least one query term")
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(word_tokens(text_col)).cast("double").alias("dl"),
    ).localCheckpoint(eager=False)
    stats = F.broadcast(
        lens.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_tokens(text_col)).alias("term"),
        )
        .filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(dfreq, "term")
        .join(lens, "doc_id")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(F.sum(contrib), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(k)


def postings_index(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """The RETRIEVAL index behind :func:`bm25_topk` — built once,
    queried many times: ``(postings, doclens)`` where ``postings`` is
    the full (term, doc_id, tf) table (exact term frequencies, nothing
    capped — unlike :func:`inverted_index`'s display-capped postings
    strings, this is the thing a scorer consumes) and ``doclens`` is
    (doc_id, dl). Persist both as parquet next to the corpus — at
    search time only the query's terms' postings are read, never the
    text.

    Scale shape: one explode + one (term, doc) hash aggregation (the
    same shuffle the from-scratch scorer pays ONCE PER QUERY, paid here
    once per corpus); doclens is a map-side projection. Persisting
    ``postings`` partitioned or bucketed by term turns a query into a
    partition-pruned read of its own terms."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(text_col)).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doclens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(word_tokens(text_col)).cast("long").alias("dl"),
    )
    return postings, doclens


def append_postings(
    postings: DataFrame,
    doclens: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Incrementally extend a postings index with NEW documents: the
    appended docs' (term, doc, tf) rows and lengths union in at the
    cost of the new documents only — no merge step, because a (term,
    doc) key can only exist on one side when doc ids are new. That
    contract is CHECKED (one bounded semi-join count against the
    O(docs) doclens side, not the postings): re-appending an existing
    document would silently double its term frequencies — the one
    corruption a union-based append could cause — so it raises
    instead. Documents are immutable here, as everywhere in this
    engine's ingest story; an update is a delete + re-add under a new
    id (or a full rebuild, as with the skipping indexes after
    compaction)."""
    dup = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(doclens.select("doc_id"), "doc_id", "semi")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "append_postings: some appended doc ids already exist in the "
            "index — postings append is union-based and would double "
            "their term frequencies; rebuild or use fresh ids"
        )
    new_p, new_l = postings_index(docs, id_col, text_col)
    return (
        postings.unionByName(new_p),
        doclens.unionByName(new_l),
    )


def bm25_topk_from_index(
    postings: DataFrame,
    doclens: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """:func:`bm25_topk` served from a prebuilt :func:`postings_index`
    instead of the corpus: identical scores by construction (same
    exact-count inputs, same Lucene-idf formula, same 6-decimal
    rounding before the (score desc, doc_id) cut — the corpus entry
    pins both paths against ONE oracle). The shape a real search
    deployment has: the per-query cost is a filter of the postings to
    the query's terms plus an O(docs) stats aggregate — the corpus
    text is never touched, and a term-partitioned postings table
    prunes the read to the query's own files."""
    qterms = sorted({t for t in terms})
    if not qterms:
        raise ValueError("bm25_topk_from_index needs at least one query term")
    lens = doclens.select(
        "doc_id", F.col("dl").cast("double").alias("dl")
    ).localCheckpoint(eager=False)
    stats = F.broadcast(
        lens.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    tf = postings.filter(F.col("term").isin(qterms)).select(
        "doc_id", "term", F.col("tf").cast("double").alias("tf")
    )
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(dfreq, "term")
        .join(lens, "doc_id")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(F.sum(contrib), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
