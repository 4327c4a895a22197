"""Semantics tests for operators/indexing.py (inverted index, PMI
collocations), dedup.bag_of_words_dedup_groups, and
curation.temperature_rebalance."""

from __future__ import annotations

import math

import pytest

from stream_sentinel_spark.operators.curation import temperature_rebalance
from stream_sentinel_spark.operators.dedup import bag_of_words_dedup_groups
from stream_sentinel_spark.operators.indexing import inverted_index, pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_counts_and_postings(spark):
    df = _docs(spark, ["a b a", "b c", "a"])
    out = {r["token"]: r for r in inverted_index(df, "doc_id", "text").collect()}
    assert out["a"]["df"] == 2 and out["a"]["tf"] == 3
    assert out["a"]["postings"] == "0,2"
    assert out["b"]["df"] == 2 and out["b"]["tf"] == 2
    assert out["b"]["postings"] == "0,1"
    assert out["c"]["df"] == 1 and out["c"]["postings"] == "1"


def test_inverted_index_cap_and_min_df(spark):
    df = _docs(spark, ["x"] * 10)
    row = inverted_index(df, "doc_id", "text", postings_cap=3).collect()[0]
    # cap bounds the materialized postings, not the exact counts
    assert row["df"] == 10 and row["postings"] == "0,1,2"
    df2 = _docs(spark, ["x y", "x"])
    toks = {
        r["token"]
        for r in inverted_index(df2, "doc_id", "text", min_df=2).collect()
    }
    assert toks == {"x"}


# ---------------------------------------------------------------------------
# PMI
# ---------------------------------------------------------------------------


def test_pmi_hand_computed(spark):
    # 4 docs of "a b", 4 of "c d": perfect collocations, N=16, B=8
    df = _docs(spark, ["a b"] * 4 + ["c d"] * 4)
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, "doc_id", "text", min_count=2).collect()
    }
    assert set(out) == {("a", "b"), ("c", "d")}
    r = out[("a", "b")]
    assert (r["n12"], r["n1"], r["n2"]) == (4, 4, 4)
    # pmi = ln((4/8) / ((4/16)(4/16))) = ln 8
    assert math.isclose(r["pmi"], round(math.log(8.0), 6))


def test_pmi_min_count_filters(spark):
    df = _docs(spark, ["a b"] * 4 + ["a c"])
    pairs = {
        (r["w1"], r["w2"])
        for r in pmi_collocations(df, "doc_id", "text", min_count=2).collect()
    }
    assert ("a", "c") not in pairs and ("a", "b") in pairs


def test_pmi_topk_is_deterministic_total_order(spark):
    df = _docs(spark, ["a b", "b a", "c d", "d c"] * 3)
    top = pmi_collocations(df, "doc_id", "text", min_count=2, top_k=2).collect()
    # all four pairs tie on pmi; (w1, w2) breaks the tie
    assert [(r["w1"], r["w2"]) for r in top] == [("a", "b"), ("b", "a")]


# ---------------------------------------------------------------------------
# bag-of-words dedup
# ---------------------------------------------------------------------------


def test_bag_of_words_collapses_reordered_copies(spark):
    df = _docs(spark, ["the cat sat", "sat the cat", "the cat cat"])
    rows = bag_of_words_dedup_groups(df, "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r for r in rows}
    assert by_keep[0]["copies"] == 2  # doc 1 is a word-permutation of doc 0
    assert by_keep[2]["copies"] == 1  # different multiset (cat twice)
    assert by_keep[0]["n_tokens"] == 3


def test_bag_of_words_is_multiset_not_set(spark):
    df = _docs(spark, ["a a b", "a b"])
    assert bag_of_words_dedup_groups(df, "doc_id", "text").count() == 2


# ---------------------------------------------------------------------------
# temperature rebalance
# ---------------------------------------------------------------------------


def _grouped_docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_rebalance_targets(spark):
    df = _grouped_docs(spark, {"en": 400, "de": 100})
    out = {
        r["group"]: r
        for r in temperature_rebalance(
            df, "doc_id", "lang", alpha=0.5, anchor_target=100
        ).collect()
    }
    assert out["en"]["target"] == 100  # anchor group
    # (100/400)^0.5 = 0.5 -> target 50 from 100 docs
    assert out["de"]["target"] == 50
    assert out["de"]["weight"] == 0.5
    # sampling respects the rate cap and determinism
    assert 0 < out["en"]["n_sampled"] <= 400
    again = {
        r["group"]: r["n_sampled"]
        for r in temperature_rebalance(
            df, "doc_id", "lang", alpha=0.5, anchor_target=100
        ).collect()
    }
    assert again == {g: r["n_sampled"] for g, r in out.items()}


def test_temperature_rebalance_alpha_extremes(spark):
    df = _grouped_docs(spark, {"en": 400, "de": 100})
    prop = {
        r["group"]: r["target"]
        for r in temperature_rebalance(
            df, "doc_id", "lang", alpha=1.0, anchor_target=100
        ).collect()
    }
    assert prop == {"en": 100, "de": 25}  # alpha=1: proportional
    flat = {
        r["group"]: r["target"]
        for r in temperature_rebalance(
            df, "doc_id", "lang", alpha=0.0, anchor_target=100
        ).collect()
    }
    assert flat == {"en": 100, "de": 100}  # alpha=0: uniform


def test_temperature_rebalance_small_group_keeps_all(spark):
    df = _grouped_docs(spark, {"en": 1000, "zz": 3})
    out = {
        r["group"]: r
        for r in temperature_rebalance(
            df, "doc_id", "lang", alpha=0.5, anchor_target=500
        ).collect()
    }
    # target (1000*sqrt(3/1000) ~ 27) exceeds n_docs=3: rate caps at 1
    assert out["zz"]["n_sampled"] == 3


def test_temperature_rebalance_rejects_bad_alpha(spark):
    df = _grouped_docs(spark, {"en": 1})
    with pytest.raises(ValueError):
        temperature_rebalance(df, "doc_id", "lang", alpha=2.0)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 (Lucene idf) over single-space tokens."""
    toks = [t.split(" ") for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    dfreq = {q: sum(1 for t in toks if q in t) for q in set(terms)}
    out = {}
    for i, t in enumerate(toks):
        s, matched = 0.0, 0
        for q in set(terms):
            tf = t.count(q)
            if not tf:
                continue
            matched += 1
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if matched:
            out[i] = (matched, round(s, 6))
    return out


def test_bm25_hand_checked_scores(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "cat cat cat",
        "nothing relevant here",
        "a very long document that mentions cat once among many many other words",
    ]
    df = _docs(spark, texts)
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in bm25_topk(df, ["cat", "sat"], "doc_id", "text", k=10).collect()
    }
    assert got == _bm25_reference(texts, ["cat", "sat"])


def test_bm25_topk_cut_and_tiebreak(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    # four identical docs tie exactly; doc_id breaks the tie, k cuts at 2
    df = _docs(spark, ["x y", "x y", "x y", "x y"])
    rows = bm25_topk(df, ["x"], "doc_id", "text", k=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert rows[0]["score"] == rows[1]["score"]


def test_bm25_rare_term_outranks_common(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    # "rare" appears in 1 of 6 docs, "common" in 5 of 6 — the rare-term
    # doc must outrank any single common-term doc at equal tf and length
    texts = ["common rare", "common x", "common y", "common z", "common w", "u v"]
    rows = bm25_topk(_docs(spark, texts), ["rare", "common"], "doc_id", "text").collect()
    assert rows[0]["doc_id"] == 0 and rows[0]["n_terms"] == 2


def test_bm25_unmatched_docs_absent_and_unknown_term_ignored(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    df = _docs(spark, ["a b", "c d"])
    rows = bm25_topk(df, ["a", "zzz"], "doc_id", "text").collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["n_terms"] == 1


def test_bm25_duplicate_terms_count_once(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    df = _docs(spark, ["a b", "b c"])
    once = bm25_topk(df, ["a"], "doc_id", "text").collect()
    twice = bm25_topk(df, ["a", "a"], "doc_id", "text").collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]


def test_bm25_empty_terms_rejected(spark):
    from stream_sentinel_spark.operators.indexing import bm25_topk

    with pytest.raises(ValueError, match="at least one query term"):
        bm25_topk(_docs(spark, ["a"]), [], "doc_id", "text")


# ---------------------------------------------------------------------------
# postings index + indexed/incremental BM25
# ---------------------------------------------------------------------------


def test_postings_index_exact_tfs(spark):
    from stream_sentinel_spark.operators.indexing import postings_index

    df = _docs(spark, ["a b a", "b c", "a"])
    postings, doclens = postings_index(df, "doc_id", "text")
    p = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert p == {
        ("a", 0): 2, ("b", 0): 1, ("b", 1): 1, ("c", 1): 1, ("a", 2): 1,
    }
    assert {r["doc_id"]: r["dl"] for r in doclens.collect()} == {0: 3, 1: 2, 2: 1}


def test_bm25_from_index_equals_from_scratch(spark):
    from stream_sentinel_spark.operators.indexing import (
        bm25_topk,
        bm25_topk_from_index,
        postings_index,
    )

    texts = [
        "the cat sat on the mat", "the dog sat", "cat cat cat",
        "nothing here", "a long document mentioning cat once in many words",
    ]
    df = _docs(spark, texts)
    postings, doclens = postings_index(df, "doc_id", "text")
    direct = bm25_topk(df, ["cat", "sat"], "doc_id", "text", k=10).collect()
    indexed = bm25_topk_from_index(postings, doclens, ["cat", "sat"], k=10).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_append_postings_incremental_equals_rebuild(spark):
    from stream_sentinel_spark.operators.indexing import (
        append_postings,
        bm25_topk_from_index,
        postings_index,
    )

    texts = ["a b c", "b c d", "c d e", "d e f", "e f a", "f a b"]
    df = _docs(spark, texts)
    base = df.filter("doc_id < 4")
    delta = df.filter("doc_id >= 4")
    p0, l0 = postings_index(base, "doc_id", "text")
    p1, l1 = append_postings(p0, l0, delta, "doc_id", "text")
    pf, lf = postings_index(df, "doc_id", "text")
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, pf.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, lf.collect()))
    a = bm25_topk_from_index(p1, l1, ["a", "d"], k=6).collect()
    b = bm25_topk_from_index(pf, lf, ["a", "d"], k=6).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_append_postings_rejects_existing_doc(spark):
    from stream_sentinel_spark.operators.indexing import (
        append_postings,
        postings_index,
    )

    df = _docs(spark, ["a b", "c d"])
    p, l = postings_index(df, "doc_id", "text")
    with pytest.raises(ValueError, match="already exist"):
        append_postings(p, l, df.filter("doc_id = 1"), "doc_id", "text")
