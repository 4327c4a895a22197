"""Semantic unit tests for operators/curation.py (the corpus entries
x25-x29 lock cross-engine parity; these lock the operator contracts on
crafted inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_doc_empty(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b c d e")])
    out = df.select(
        "doc_id", curation.word_ngrams("text", 5).alias("g")
    ).collect()
    by_id = {r.doc_id: r.g for r in out}
    assert by_id[1] == []
    assert by_id[2] == ["a b c d e"]


def test_decontaminate_planted_copy(spark):
    train = _docs(
        spark,
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "one two three four five six seven")],
    )
    test = _docs(
        spark,
        [
            # verbatim span of train doc 100 → fully contained
            (1, "alpha beta gamma delta epsilon"),
            # clean doc: no 5-gram overlap
            (2, "red green blue cyan magenta yellow"),
            # half contaminated: grams crossing the seam don't match
            (3, "one two three four five fresh words here now"),
        ],
    )
    got = {
        r.doc_id: r
        for r in curation.decontaminate(train, test, "doc_id", "text").collect()
    }
    assert got[1].n_grams == 1 and got[1].hits == 1
    assert got[1].containment == 1.0
    assert got[2].hits == 0 and got[2].containment == 0.0
    # doc 3: 5 grams, exactly "one two three four five" matches
    assert got[3].n_grams == 5 and got[3].hits == 1
    assert got[3].containment == pytest.approx(0.2)


def test_decontaminate_counts_doc_grams_once(spark):
    train = _docs(spark, [(100, "p q r s t")])
    test = _docs(spark, [(1, "p q r s t p q r s t")])  # gram repeats in doc
    row = curation.decontaminate(train, test, "doc_id", "text").collect()[0]
    # 6 gram positions, but position 6 repeats position 1 → 5 distinct
    # grams; only "p q r s t" matches train, counted once
    assert row.n_grams == 5
    assert row.hits == 1


def test_repetition_features_crafted(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "w x y z")])
    got = {
        r.doc_id: r
        for r in curation.repetition_features(df, "doc_id", "text").collect()
    }
    # doc 1: 2-grams = [a a, a a, a b] → 3 total, 2 distinct → 1/3 dup
    assert got[1].n_tokens == 4
    assert got[1].dup_2gram_frac == pytest.approx(1 / 3)
    # 3-grams = [a a a, a a b] → all distinct
    assert got[1].dup_3gram_frac == 0.0
    assert got[1].top_token_frac == pytest.approx(3 / 4)
    assert got[2].dup_2gram_frac == 0.0
    assert got[2].top_token_frac == pytest.approx(1 / 4)


def test_top_keywords_rare_term_wins(spark):
    # "zebra" appears twice in doc 1 and nowhere else; "the" is in every
    # doc. tf*N/df must put zebra first for doc 1.
    df = _docs(
        spark,
        [(1, "the zebra zebra runs"),
         (2, "the cat sits"),
         (3, "the dog barks")],
    )
    top = {
        (r.doc_id, r.rank): r.term
        for r in curation.top_keywords(df, "doc_id", "text", k=2).collect()
    }
    assert top[(1, 1)] == "zebra"
    # every doc got exactly k=2 rows
    assert len(top) == 6


def test_weighted_sample_deterministic_and_sized(spark):
    df = _docs(
        spark, [(i, f"doc {i}") for i in range(200)]
    ).withColumn("w", (F.col("doc_id") % 7 + 1).cast("double"))
    a = sorted(
        r.doc_id
        for r in curation.weighted_sample(df, "doc_id", "w", k=20).collect()
    )
    b = sorted(
        r.doc_id
        for r in curation.weighted_sample(
            df.repartition(13), "doc_id", "w", k=20
        ).collect()
    )
    assert len(a) == 20
    assert a == b  # partitioning-independent
    c = sorted(
        r.doc_id
        for r in curation.weighted_sample(
            df, "doc_id", "w", k=20, salt="other"
        ).collect()
    )
    assert a != c  # salts give independent samples


def test_weighted_sample_prefers_heavy_rows(spark):
    # weight 1000:1 — the heavy half must dominate the sample
    df = _docs(spark, [(i, "x") for i in range(400)]).withColumn(
        "w", F.when(F.col("doc_id") < 200, 1000.0).otherwise(1.0)
    )
    picked = [
        r.doc_id
        for r in curation.weighted_sample(df, "doc_id", "w", k=50).collect()
    ]
    heavy = sum(1 for i in picked if i < 200)
    assert heavy >= 45


def test_chunk_documents_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(75))
    df = _docs(spark, [(1, text)])
    rows = sorted(
        curation.chunk_documents(
            df, "doc_id", "text", chunk_tokens=32, stride=24
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at 0,24,48,72 → 4 chunks; last has 3 tokens
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert [r.chunk_len for r in rows] == [32, 32, 27, 3]
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert toks == [f"t{i}" for i in range(r.chunk_idx * 24,
                                               min(r.chunk_idx * 24 + 32, 75))]
        covered.update(toks)
    assert len(covered) == 75


def test_chunk_documents_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    rows = curation.chunk_documents(
        df, "doc_id", "text", chunk_tokens=32, stride=24
    ).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c" and rows[0].chunk_len == 3


def test_chunk_documents_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        curation.chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        curation.chunk_documents(df, "doc_id", "text", stride=0)


def test_stratified_sample_rates_and_determinism(spark):
    from stream_sentinel_spark.operators.sampling import stratified_sample

    df = spark.range(4000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 'keep_all' "
        "WHEN id % 4 = 1 THEN 'half' ELSE 'other' END AS source",
    )
    out = stratified_sample(
        df, "doc_id", "source", {"keep_all": 1.0, "half": 0.5},
        default_rate=0.0, salt="t",
    )
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert by["keep_all"] == 1000          # rate 1.0 keeps every row
    assert 380 <= by.get("half", 0) <= 620  # ~50% of 1000
    assert "other" not in by               # default 0 drops the rest
    # deterministic: same inputs -> identical kept set
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in out.collect()}
    assert ids1 == ids2
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, "doc_id", "source", {"half": 1.5})


def test_corpus_vocabulary_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "c")], ["doc_id", "text"]
    )
    rows = curation.corpus_vocabulary(df, "doc_id", "text", k=2).collect()
    assert [(r["rank"], r["term"], r["tf"], r["df"]) for r in rows] == [
        (1, "a", 3, 2),   # 3 occurrences over docs 1 and 2
        (2, "b", 3, 2),   # tie on tf=3 broken by term asc
    ]


class TestPassageDedup:
    def _docs(self, spark):
        rows = [
            (1, "a b c d e f g h i j k l"),      # passages: [a..f], [g..l]
            (2, "a b c d e f x y z p q r"),      # first passage dups doc 1
            (3, "g h i j k l"),                  # dups doc 1's second passage
            (4, "unique words only here now yes"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_occurrence_kept_and_reconstruction(self, spark):
        from stream_sentinel_spark.operators.curation import passage_dedup

        out = {
            r["doc_id"]: r
            for r in passage_dedup(self._docs(spark), "doc_id", "text").collect()
        }
        assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 2
        assert out[1]["kept_text"] == "a b c d e f g h i j k l"
        # doc 2 loses its first passage to doc 1
        assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == "x y z p q r"
        # doc 3 is entirely duplicate -> zero kept, NULL text
        assert out[3]["n_kept"] == 0 and out[3]["kept_text"] is None
        assert out[4]["n_kept"] == 1

    def test_short_tail_passage(self, spark):
        from stream_sentinel_spark.operators.curation import passage_dedup

        df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
        row = passage_dedup(df, "doc_id", "text").collect()[0]
        assert row["n_passages"] == 2  # 6 words + short tail of 2
        assert row["kept_text"] == "a b c d e f g h"


class TestSequencePacking:
    def test_windows_full_and_tokens_conserved(self, spark):
        from stream_sentinel_spark.operators.curation import pack_token_stream
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        docs = spark.range(1, 200).select(
            F.col("id").alias("doc_id"), ((F.col("id") * 7) % 90 + 1).alias("n_tok")
        )
        out = pack_token_stream(docs, "doc_id", "n_tok", context_len=64, n_shards=4).cache()
        # token conservation: packed tokens == input tokens
        total_in = docs.agg(F.sum("n_tok")).collect()[0][0]
        total_out = out.agg(F.sum("n_tokens")).collect()[0][0]
        assert total_in == total_out
        # every window is exactly full except possibly the last per shard
        w = Window.partitionBy("shard")
        bad = (
            out.withColumn("maxp", F.max("pack_id").over(w))
            .filter((F.col("pack_id") != F.col("maxp")) & (F.col("n_tokens") != 64))
            .count()
        )
        assert bad == 0
        # pack ids are contiguous from 0 per shard
        per_shard = out.groupBy("shard").agg(
            F.min("pack_id").alias("mn"), F.max("pack_id").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        for r in per_shard:
            assert r["mn"] == 0 and r["n"] == r["mx"] + 1

    def test_doc_straddles_boundary(self, spark):
        from stream_sentinel_spark.operators.curation import pack_token_stream
        import pyspark.sql.functions as F

        docs = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 10)], "doc_id long, n_tok long"
        )
        out = {
            r["pack_id"]: r
            for r in pack_token_stream(
                docs, "doc_id", "n_tok", context_len=16, n_shards=1
            ).collect()
        }
        # 30 tokens -> pack0 full (docs 1+2), pack1 has the tail
        assert out[0]["n_tokens"] == 16 and out[0]["n_docs"] == 2
        assert out[1]["n_tokens"] == 14 and out[1]["n_docs"] == 2
        assert out[1]["first_doc"] == 2 and out[1]["last_doc"] == 3

    def test_zero_token_docs_skipped(self, spark):
        from stream_sentinel_spark.operators.curation import pack_token_stream
        docs = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tok long")
        rows = pack_token_stream(docs, "doc_id", "n_tok", 8, n_shards=1).collect()
        assert len(rows) == 1 and rows[0]["n_docs"] == 1


class TestBoilerplateRemoval:
    def test_common_lines_dropped_everywhere(self, spark):
        # "cookie notice" appears in 3 docs (> max_doc_freq=2): removed
        # from ALL of them, including the first; "rare line" (2 docs)
        # survives. Real-newline text exercises the generic API.
        df = _docs(
            spark,
            [
                (1, "cookie notice\nunique alpha\nrare line"),
                (2, "cookie notice\nunique beta"),
                (3, "cookie notice\nrare line\nunique gamma"),
            ],
        )
        out = curation.boilerplate_removal(
            df, "doc_id", F.split(F.col("text"), "\n"), max_doc_freq=2, joiner="\n"
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[1].n_lines == 3 and by_id[1].n_kept == 2
        assert by_id[1].cleaned_text == "unique alpha\nrare line"
        assert by_id[2].cleaned_text == "unique beta"
        assert by_id[3].cleaned_text == "rare line\nunique gamma"

    def test_all_boilerplate_doc_nulls_out(self, spark):
        df = _docs(
            spark,
            [(1, "same"), (2, "same"), (3, "same"), (4, "other")],
        )
        out = curation.boilerplate_removal(
            df, "doc_id", F.split(F.col("text"), "\n"), max_doc_freq=2
        ).collect()
        by_id = {r.doc_id: r for r in out}
        for i in (1, 2, 3):
            assert by_id[i].n_kept == 0 and by_id[i].cleaned_text is None
        assert by_id[4].cleaned_text == "other"

    def test_within_doc_repeats_count_distinct_docs(self, spark):
        # a line repeated 5x inside ONE doc has doc-frequency 1 — kept
        # (doc frequency, not instance frequency, is the signal)
        df = _docs(spark, [(1, "x\nx\nx\nx\nx"), (2, "y")])
        out = curation.boilerplate_removal(
            df, "doc_id", F.split(F.col("text"), "\n"), max_doc_freq=2
        ).collect()
        assert {r.doc_id: r.n_kept for r in out} == {1: 5, 2: 1}


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        import math

        # corpus: "a a b" + "a c" → counts a=3, b=1, c=1, N=5
        df = _docs(spark, [(1, "a a b"), (2, "a c")])
        out = {r.doc_id: r for r in curation.unigram_logprob(df, "doc_id", "text").collect()}
        n = 5.0
        nll1 = math.log(n) - (math.log(3) + math.log(3) + math.log(1)) / 3
        nll2 = math.log(n) - (math.log(3) + math.log(1)) / 2
        assert out[1].n_tokens == 3 and abs(out[1].nll - nll1) < 1e-6
        assert out[2].n_tokens == 2 and abs(out[2].nll - nll2) < 1e-6

    def test_common_word_doc_scores_lower(self, spark):
        rows = [(i, "the the the the") for i in range(10)] + [(99, "zyzzyva qat")]
        df = _docs(spark, rows)
        out = {r.doc_id: r.nll for r in curation.unigram_logprob(df, "doc_id", "text").collect()}
        assert out[0] < out[99]


class TestSharding:
    def test_assignment_deterministic_and_complete(self, spark):
        df = _docs(spark, [(i, f"doc {i}") for i in range(200)])
        a = curation.shard_assignment(df, "doc_id", 8)
        b = curation.shard_assignment(df, "doc_id", 8)
        assert a.collect() == b.collect()
        shards = {r.shard for r in a.select("shard").distinct().collect()}
        assert shards <= set(range(8)) and len(shards) == 8

    def test_manifest_counts_and_checksum_order_independent(self, spark):
        df = _docs(spark, [(i, f"doc {i}") for i in range(100)])
        m1 = {r.shard: r for r in curation.shard_manifest(df, "doc_id", 4).collect()}
        # same rows, different partitioning → identical manifest
        m2 = {
            r.shard: r
            for r in curation.shard_manifest(df.repartition(13), "doc_id", 4).collect()
        }
        assert sum(r.n_rows for r in m1.values()) == 100
        for s in m1:
            assert (m1[s].n_rows, m1[s].checksum, m1[s].min_id, m1[s].max_id) == (
                m2[s].n_rows, m2[s].checksum, m2[s].min_id, m2[s].max_id)

    def test_write_shards_round_trip(self, spark, tmp_path):
        df = _docs(spark, [(i, f"doc {i}") for i in range(50)])
        path = str(tmp_path / "shards")
        manifest = {r.shard: r for r in curation.write_shards(df, path, "doc_id", 4).collect()}
        back = spark.read.parquet(path)
        assert back.count() == 50
        got = {
            r.shard: r.n
            for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == {s: m.n_rows for s, m in manifest.items()}
        # one file per shard directory (no small-file explosion)
        import os
        for s in manifest:
            files = [f for f in os.listdir(f"{path}/shard={s}") if f.endswith(".parquet")]
            assert len(files) == 1, files

    def test_grown_corpus_is_a_superset(self, spark):
        small = _docs(spark, [(i, f"doc {i}") for i in range(30)])
        big = _docs(spark, [(i, f"doc {i}") for i in range(60)])
        a = {r.doc_id: r.shard for r in curation.shard_assignment(small, "doc_id", 8).collect()}
        b = {r.doc_id: r.shard for r in curation.shard_assignment(big, "doc_id", 8).collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_rejects_bad_n_shards(self, spark):
        df = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError):
            curation.shard_assignment(df, "doc_id", 0)


def test_shard_column_stats_long_form(spark):
    from stream_sentinel_spark.operators.curation import shard_column_stats

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, None, "b"), (3, 9.0, None), (4, 1.0, "c")],
        "id long, price double, tag string",
    )
    rows = shard_column_stats(df, "id", 2, ["price", "tag"]).collect()
    by = {(r["shard"], r["column"]): r for r in rows}
    assert len(rows) == len({r["shard"] for r in rows}) * 2
    total = sum({r["shard"]: r["n_rows"] for r in rows}.values())
    assert total == 4
    # global invariants across shards
    prices = [by[k] for k in by if k[1] == "price"]
    assert min(float(r["min_value"]) for r in prices if r["min_value"]) == 1.0
    assert max(float(r["max_value"]) for r in prices if r["max_value"]) == 9.0
    assert sum(r["n_nulls"] for r in prices) == 1
    tags = [by[k] for k in by if k[1] == "tag"]
    assert sum(r["n_nulls"] for r in tags) == 1


# ---------------------------------------------------------------------------
# bigram_logprob
# ---------------------------------------------------------------------------

def test_bigram_logprob_hand_counts(spark):
    import math

    # Corpus bigrams: (a,b)x2 from docs 1-2, (a,c)x1 from doc 3.
    # c1(a)=3, so nll(doc1)=ln(3)-ln(2), nll(doc3)=ln(3)-ln(1)=ln 3.
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {r.doc_id: r for r in curation.bigram_logprob(df, "doc_id", "text").collect()}
    assert out[1].n_bigrams == 1
    assert out[1].nll == round(math.log(3) - math.log(2), 6)
    assert out[2].nll == out[1].nll
    assert out[3].nll == round(math.log(3), 6)


def test_bigram_logprob_short_docs_absent(spark):
    # Zero- and one-token docs have no bigram and emit no row.
    df = _docs(spark, [(1, "solo"), (2, ""), (3, "x y")])
    got = {r.doc_id for r in curation.bigram_logprob(df, "doc_id", "text").collect()}
    assert got == {3}


def test_bigram_logprob_order_sensitivity(spark):
    # Same multiset, different order → different bigrams → different
    # scores (the signal unigram_logprob cannot see).
    df = _docs(spark, [(1, "a b a b"), (2, "a a b b"), (3, "a b a b")])
    out = {r.doc_id: r.nll for r in curation.bigram_logprob(df, "doc_id", "text").collect()}
    assert out[1] == out[3]
    assert out[1] != out[2]


# ---------------------------------------------------------------------------
# quality_tiles
# ---------------------------------------------------------------------------

def test_quality_tiles_partitions_per_group(spark):
    rows = [(i, "the quick brown fox jumps " * (1 + i % 3), ) for i in range(20)]
    df = spark.createDataFrame(
        [(i, t, "en" if i < 12 else "de") for i, (_, t) in zip(range(20), rows)],
        "doc_id long, text string, lang string",
    )
    out = curation.quality_tiles(df, "doc_id", "text", "lang", tiles=4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # every group's tile sizes sum to the group's doc count
    assert sum(r.n_docs for r in by_lang["en"]) == 12
    assert sum(r.n_docs for r in by_lang["de"]) == 8
    # tiles are 1..4 and sized within 1 of each other (NTILE contract)
    for g in by_lang.values():
        tiles = sorted(r.tile for r in g)
        assert tiles == [1, 2, 3, 4]
        sizes = [r.n_docs for r in g]
        assert max(sizes) - min(sizes) <= 1
        # mean scores are non-increasing tile by tile (DESC ordering)
        means = [r.mean_score for r in sorted(g, key=lambda r: r.tile)]
        assert all(a >= b for a, b in zip(means, means[1:]))


# ---------------------------------------------------------------------------
# bpe_merge_step
# ---------------------------------------------------------------------------

def test_bpe_merge_step_hand_example(spark):
    # Corpus "aaab","aab": pairs aa(3), ab(2) -> top merge = "aa".
    # Left-to-right non-overlapping replace: "aaab"->"<M>ab",
    # "aab"->"<M>b". Post-merge pairs: <M>a(1), ab(1), <M>b(1).
    df = _docs(spark, [(1, "aaab"), (2, "aab")])
    out = {r.pair: r.cnt for r in curation.bpe_merge_step(df, "doc_id", "text").collect()}
    assert out == {"<M>a": 1, "ab": 1, "<M>b": 1}


def test_bpe_merge_step_tie_break_and_short_docs(spark):
    # "ba" and "ab" both occur twice -> lexicographic tie-break picks
    # "ab" as the merge; sub-2-char docs contribute no pairs.
    df = _docs(spark, [(1, "abab"), (2, "ba"), (3, "x"), (4, "")])
    out = {r.pair: r.cnt for r in curation.bpe_merge_step(df, "doc_id", "text").collect()}
    # "abab" -> "<M><M>", "ba" unchanged (no "ab" inside)
    assert out == {"<M><M>": 1, "ba": 1}


# ---------------------------------------------------------------------------
# bpe_apply (x75)
# ---------------------------------------------------------------------------


def _bpe_encode_ref(word: str, merges) -> list[str]:
    """Sequential reference: one left-to-right non-overlapping fusing
    pass per merge, in table order — the exact contract of the
    wrapped-delimiter replace chain."""
    seq = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def test_bpe_apply_matches_sequential_reference(spark):
    texts = [
        "the value scan",
        "value the value",
        "scatter scan the theme",
        "a ab abab ba",
    ]
    df = _docs(spark, list(enumerate(texts)))
    got = {
        r.token: r.cnt
        for r in curation.bpe_apply(df, "doc_id", "text", top_k=1000).collect()
    }
    from collections import Counter

    want = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                want.update(_bpe_encode_ref(w, curation.DEFAULT_BPE_MERGES))
    assert got == dict(want)


def test_bpe_apply_adjacent_sites_both_merge(spark):
    # "abab" with merge (a,b) must encode to [ab, ab]: the per-symbol
    # boundary wrapping means adjacent merge sites never share a
    # separator (a space-separated encoding would lose the second site).
    df = _docs(spark, [(1, "abab")])
    got = {
        r.token: r.cnt
        for r in curation.bpe_apply(
            df, "doc_id", "text", merges=(("a", "b"),), top_k=10
        ).collect()
    }
    assert got == {"ab": 2}


def test_bpe_apply_merge_order_feeds_later_rules(spark):
    # (a,l) then (v,al): "val" only fuses fully because the feeding
    # merge precedes its consumer.
    df = _docs(spark, [(1, "val val"), (2, "lav")])
    got = {
        r.token: r.cnt
        for r in curation.bpe_apply(
            df, "doc_id", "text", merges=(("a", "l"), ("v", "al")), top_k=10
        ).collect()
    }
    assert got == {"val": 2, "l": 1, "a": 1, "v": 1}


def test_bpe_apply_top_k_tie_break(spark):
    # equal counts → token ASC decides inclusion at the cut.
    df = _docs(spark, [(1, "b a c")])
    rows = curation.bpe_apply(df, "doc_id", "text", merges=(), top_k=2).collect()
    assert [(r.token, r.cnt) for r in rows] == [("a", 1), ("b", 1)]


# ---------------------------------------------------------------------------
# dsir_weights (x76)
# ---------------------------------------------------------------------------


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dsir_target_like_docs_score_higher(spark):
    # target domain speaks "wiki cite ref"; raw background speaks
    # "spam click buy". A held-out target-like doc must outrank a
    # background-like one.
    rows = [(i, "tgt", "wiki cite ref wiki cite") for i in range(10)]
    rows += [(100 + i, "web", "spam click buy spam click") for i in range(10)]
    rows += [(900, "web", "wiki cite ref"), (901, "web", "spam click buy")]
    out = {
        r.doc_id: r
        for r in curation.dsir_weights(
            _src_docs(spark, rows), "doc_id", "text",
            target=F.col("source") == "tgt",
        ).collect()
    }
    assert out[900].dsir_score > out[901].dsir_score
    # the gap is the RANKING signal DSIR resamples by; absolute signs
    # are regime-dependent (add-1 smoothing over `buckets` cells shifts
    # both scores on small corpora), so only the order is contractual.
    assert out[900].dsir_score - out[901].dsir_score > 0.1
    assert out[900].n_tokens == 3


def test_dsir_empty_and_lengths(spark):
    rows = [(1, "tgt", "a b a"), (2, "web", "c d"), (3, "web", "")]
    out = {
        r.doc_id: r
        for r in curation.dsir_weights(
            _src_docs(spark, rows), "doc_id", "text",
            target=F.col("source") == "tgt",
        ).collect()
    }
    assert set(out) == {1, 2}  # no-token doc absent: no feature evidence
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2


def test_leakage_safe_split_invariants(spark):
    """Every member of a cluster gets the SAME split (the leakage
    guard), singletons absent from the clusters frame self-represent,
    splits partition the corpus at roughly the requested rates over
    cluster representatives, and bad rates fail fast."""
    import pytest
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.curation import leakage_safe_split

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    # clusters: ids 0-99 pair up (0,1)(2,3)... with component = even id;
    # ids >= 100 are deliberately ABSENT from the frame (singletons)
    clusters = spark.range(100).select(
        F.col("id").alias("id"), (F.col("id") - F.col("id") % 2).alias("component")
    )
    out = leakage_safe_split(docs, clusters, "doc_id", 0.1, 0.1).cache()
    assert out.count() == 1000
    # cluster members agree on the split
    disagree = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert disagree == 0
    # singleton fallback: component == own id for ids >= 100
    assert out.filter((F.col("id") >= 100) & (F.col("id") != F.col("component"))).count() == 0
    # all three splits materialize at these rates on 950 components
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same inputs, same assignment
    again = leakage_safe_split(docs, clusters, "doc_id", 0.1, 0.1)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError, match="val\\+test"):
        leakage_safe_split(docs, clusters, "doc_id", 0.6, 0.6)


def test_novelty_exact_copy_of_earlier_doc_scores_zero(spark):
    """The defining property: a doc that is an exact copy of an EARLIER
    doc contributes nothing new — novelty 0 — while the first doc of
    fresh text scores 1. Also: n_novel sums to the distinct-gram count
    of the corpus (every gram is novel exactly once)."""
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.curation import novelty_scores

    rows = [
        (1, "abcdefgh"),        # fresh: novelty 1
        (2, "abcdefgh"),        # exact copy of 1: novelty 0
        (3, "xyzw"),            # fresh: novelty 1
        (4, "abcdxyzw"),        # mixes grams of 1 and 3 + bridges: partial
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in novelty_scores(df, "doc_id", "text").collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0 and out[2].n_novel == 0
    assert out[3].novelty == 1.0
    assert 0 < out[4].novelty < 1
    n_distinct = (
        df.select(F.explode(F.expr(
            "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
        )).alias("g")).distinct().count()
    )
    assert sum(r.n_novel for r in out.values()) == n_distinct


def test_duplicated_window_rate_properties(spark):
    """Exact-duplicate docs are fully duplicated (rate 1 for both —
    occurrences in ANY doc count, including the copy), a unique doc
    scores 0, an intra-doc repeated span counts without a second doc,
    and sub-k-token docs are absent."""
    from stream_sentinel_spark.operators.curation import duplicated_window_rate

    a = "w1 w2 w3 w4 w5"                      # 5 tokens, k=3 -> 3 windows
    rows = [
        (1, a),
        (2, a),                               # exact copy
        (3, "u1 u2 u3 u4 u5"),                # unique
        (4, "r1 r2 r3 r1 r2 r3 r1 r2 r3"),    # intra-doc repetition
        (5, "short doc"),                     # < k tokens: absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicated_window_rate(df, "doc_id", "text", k=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].dup_rate == 1.0 and out[2].dup_rate == 1.0
    assert out[3].dup_rate == 0.0
    assert out[4].n_dup > 0  # "r1 r2 r3" windows repeat within the doc
    assert out[1].n_windows == 3


def test_hash_key_mode_equals_string_key_mode(spark):
    """x82/x83 scale path: keying the gram/window shuffles on xxhash64
    (8-byte longs) instead of the raw strings must not change a single
    output row — the keys never reach the output, so equality holds up
    to an xxhash64 collision (P ≈ G²·2⁻⁶⁴; this pins it bit-equal on
    the real sf0.001 documents table, and the driver's oracle compare —
    hash-mode engine vs string-key DuckDB SQL — re-proves it at sf0.01
    every round)."""
    from stream_sentinel_spark.operators.curation import (
        duplicated_window_rate,
        novelty_scores,
    )
    from stream_sentinel_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for fn, kw in (
        (novelty_scores, {"n": 3}),
        (duplicated_window_rate, {"k": 10}),
    ):
        h = fn(docs, "doc_id", "text", key_mode="hash", **kw).collect()
        s = fn(docs, "doc_id", "text", key_mode="string", **kw).collect()
        assert h == s and len(h) > 0

    import pytest

    with pytest.raises(ValueError, match="key_mode"):
        novelty_scores(docs, "doc_id", "text", key_mode="md5")


# ---------------------------------------------------------------------------
# nb_quality_classifier (x94)
# ---------------------------------------------------------------------------


def test_nb_classifier_separates_planted_classes(spark):
    # hi-class docs: all-distinct tokens from vocab A; lo-class docs:
    # heavy repetition of vocab B. The learned token log-odds must give
    # A-words positive weight and B-words negative weight, so a fresh
    # mixed doc scores by its composition.
    rows = [
        (1, "alpha beta gamma delta epsilon"),          # TTR 1.0  -> hi
        (2, "zeta eta theta iota kappa"),               # TTR 1.0  -> hi
        (3, "spam spam spam spam spam ham ham ham"),    # TTR 0.25 -> lo
        (4, "noise noise noise noise junk junk junk"),  # TTR ~0.29-> lo
    ]
    out = {
        r.doc_id: r
        for r in curation.nb_quality_classifier(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert out[1].label_hi and out[2].label_hi
    assert not out[3].label_hi and not out[4].label_hi
    # model agrees with the seed labels on the training docs themselves
    assert out[1].pred_hi and out[2].pred_hi
    assert not out[3].pred_hi and not out[4].pred_hi
    assert out[1].score > 0 > out[3].score


def test_nb_classifier_label_threshold_integer_exact(spark):
    # 21/50 boundary: 21 distinct out of 50 tokens is EXACTLY the
    # threshold and must label hi (>=), 20 distinct must label lo.
    hi_doc = " ".join([f"w{i}" for i in range(21)] + ["w0"] * 29)
    lo_doc = " ".join([f"v{i}" for i in range(20)] + ["v0"] * 30)
    out = {
        r.doc_id: r.label_hi
        for r in curation.nb_quality_classifier(
            _docs(spark, [(1, hi_doc), (2, lo_doc)]), "doc_id", "text"
        ).collect()
    }
    assert out[1] is True
    assert out[2] is False


def test_nb_classifier_row_per_doc_and_counts(spark):
    rows = [(1, "a b c d"), (2, "a a a a a")]
    out = curation.nb_quality_classifier(
        _docs(spark, rows), "doc_id", "text"
    ).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]
    assert {r.doc_id: r.n_tokens for r in out} == {1: 4, 2: 5}


# ---------------------------------------------------------------------------
# excise_duplicated_spans (x95)
# ---------------------------------------------------------------------------


def test_excise_verbatim_duplicate_doc_empties(spark):
    text = "one two three four five six seven"
    out = {
        r.doc_id: r
        for r in curation.excise_duplicated_spans(
            _docs(spark, [(1, text), (2, text), (3, "clean words only here now")]),
            "doc_id", "text", k=5,
        ).collect()
    }
    # first occurrence (doc 1) survives untouched; doc 2 excises fully
    assert out[1].clean_text == text and out[1].n_removed == 0
    assert out[2].clean_text == "" and out[2].n_kept == 0
    assert out[2].n_removed == 7
    # doc with no duplicated window is untouched (even though < 2 docs
    # share its windows), and short-token docs (< k) produce no windows
    assert out[3].clean_text == "clean words only here now"


def test_excise_cross_doc_span_first_occurrence_wins(spark):
    # doc 2 embeds a 5-token span of doc 1 — only doc 2's copy is cut,
    # and only the covered tokens go (the flanks survive)
    d1 = "alpha beta gamma delta epsilon zeta eta"
    d2 = "left1 left2 alpha beta gamma delta epsilon right1 right2"
    out = {
        r.doc_id: r
        for r in curation.excise_duplicated_spans(
            _docs(spark, [(1, d1), (2, d2)]), "doc_id", "text", k=5
        ).collect()
    }
    assert out[1].clean_text == d1
    assert out[2].clean_text == "left1 left2 right1 right2"
    assert out[2].n_removed == 5


def test_excise_intra_doc_repeat(spark):
    # the same 5-gram twice INSIDE one doc: second occurrence excised
    span = "p q r s t"
    text = f"{span} filler1 filler2 {span} tail"
    out = curation.excise_duplicated_spans(
        _docs(spark, [(1, text)]), "doc_id", "text", k=5
    ).collect()[0]
    assert out.clean_text == f"{span} filler1 filler2 tail"
    assert out.n_removed == 5


def test_excise_short_doc_passthrough(spark):
    out = curation.excise_duplicated_spans(
        _docs(spark, [(1, "a b c"), (2, "a b c")]), "doc_id", "text", k=5
    ).collect()
    # 3 tokens < k: no windows exist, so even identical docs pass through
    assert all(r.n_removed == 0 for r in out)


class TestPackSequences:
    def test_greedy_fill_matches_sequential_reference(self, spark):
        from stream_sentinel_spark.operators.curation import pack_sequences
        import pyspark.sql.functions as F

        docs = spark.range(1, 300).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 13) % 120 + 1).alias("n_tok"),
        )
        out = pack_sequences(
            docs, "doc_id", "n_tok", context_len=96, n_shards=4
        ).cache()
        rows = sorted(
            (r.shard, r.doc_id, r.window_id, r.win_offset, r.n_tok_packed)
            for r in out.collect()
        )
        # python reference: next-fit per shard in doc_id order
        by_shard = {}
        for s, d, *_ in rows:
            by_shard.setdefault(s, []).append(d)
        want = []
        for s, ids in by_shard.items():
            win, used = 0, 0
            for d in sorted(ids):
                n = min((d * 13) % 120 + 1, 96)
                if used + n > 96:
                    win, used = win + 1, 0
                want.append((s, d, win, used, n))
                used += n
        assert rows == sorted(want)

    def test_no_straddle_truncate_and_flag(self, spark):
        from stream_sentinel_spark.operators.curation import (
            pack_fill_stats,
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(1, 100), (2, 200), (3, 50), (4, 300), (5, 10)],
            "doc_id long, n_tok long",
        )
        out = pack_sequences(
            docs, "doc_id", "n_tok", context_len=256, n_shards=1
        ).cache()
        got = {r.doc_id: r for r in out.collect()}
        # every document fits entirely inside its window
        assert all(
            r.win_offset + r.n_tok_packed <= 256 for r in got.values()
        )
        # doc 4 (300 tokens) truncates to the window and flags
        assert got[4].n_tok_packed == 256 and got[4].truncated
        assert not got[1].truncated
        # fill stats: token totals per window match, fill_rate exact
        stats = {
            (r.shard, r.window_id): r
            for r in pack_fill_stats(out, 256).collect()
        }
        for (s, w), r in stats.items():
            members = [
                g for g in got.values() if (g.shard, g.window_id) == (s, w)
            ]
            assert r.n_tokens == sum(g.n_tok_packed for g in members)
            assert r.fill_rate == r.n_tokens / 256.0
            assert r.n_truncated == sum(1 for g in members if g.truncated)

    def test_zero_token_docs_dropped_and_bad_args(self, spark):
        import pytest

        from stream_sentinel_spark.operators.curation import pack_sequences

        docs = spark.createDataFrame(
            [(1, 0), (2, 5)], "doc_id long, n_tok long"
        )
        rows = pack_sequences(
            docs, "doc_id", "n_tok", context_len=8, n_shards=1
        ).collect()
        assert [r.doc_id for r in rows] == [2]
        with pytest.raises(ValueError, match="context_len"):
            pack_sequences(docs, "doc_id", "n_tok", context_len=0)


class TestNbMinDf:
    def test_min_df_bounds_vocab_and_drops_unscoreable_docs(self, spark):
        import pytest

        from stream_sentinel_spark.operators.curation import (
            nb_quality_classifier,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta alpha beta gamma"),
                (2, "alpha beta beta alpha alpha"),
                (3, "zzzunique qqqsingleton"),  # singletons only
            ],
            "doc_id long, text string",
        )
        base = {r.doc_id: r for r in nb_quality_classifier(
            docs, "doc_id", "text"
        ).collect()}
        cut = {r.doc_id: r for r in nb_quality_classifier(
            docs, "doc_id", "text", min_df=2
        ).collect()}
        # doc 3's tokens are all count-1: cut from the vocabulary, so
        # the doc has no scored instances and vanishes
        assert 3 in base and 3 not in cut
        # docs 1/2 keep alpha/beta (df>=2); gamma (count 1) no longer
        # contributes length
        assert cut[1].n_tokens == 4 and base[1].n_tokens == 5
        assert cut[2].n_tokens == 5
        with pytest.raises(ValueError, match="min_df"):
            nb_quality_classifier(docs, "doc_id", "text", min_df=0)


class TestPackBucketed:
    def test_equal_length_windows_and_fill(self, spark):
        import pyspark.sql.functions as F

        from stream_sentinel_spark.operators.curation import (
            pack_fill_stats,
            pack_sequences,
            pack_sequences_bucketed,
        )

        docs = spark.range(1, 400).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 13) % 120 + 1).alias("n_tok"),
        )
        out = pack_sequences_bucketed(
            docs, "doc_id", "n_tok", context_len=96, n_shards=4
        ).cache()
        rows = out.collect()
        # schema contract shared with pack_sequences
        assert {r.doc_id for r in rows} == set(
            r.doc_id
            for r in docs.filter("n_tok > 0").collect()
        )
        # every window holds equal-length docs, never over capacity,
        # offsets are the dense multiples of the length
        by_win = {}
        for r in rows:
            by_win.setdefault((r.shard, r.window_id), []).append(r)
        for (s, w), members in by_win.items():
            lens = {m.n_tok_packed for m in members}
            assert len(lens) == 1
            L = lens.pop()
            assert w >> 32 == L
            k = 96 // L
            assert len(members) <= k
            assert sorted(m.win_offset for m in members) == [
                i * L for i in range(len(members))
            ]
        # pack_fill_stats applies unchanged on the same grain
        stats = pack_fill_stats(out, 96)
        st = stats.agg(
            F.sum("n_tokens").alias("s"), F.avg("fill_rate").alias("f")
        ).head()
        want = docs.agg(F.sum(F.least("n_tok", F.lit(96)))).head()[0]
        assert int(st.s) == int(want)
        # on a uniform-length corpus bucketing beats next-fit fill
        uni = spark.range(1, 200).select(
            F.col("id").alias("doc_id"), F.lit(60).alias("n_tok")
        )
        fill_b = pack_fill_stats(
            pack_sequences_bucketed(uni, "doc_id", "n_tok", 96, n_shards=1),
            96,
        ).agg(F.avg("fill_rate")).head()[0]
        fill_n = pack_fill_stats(
            pack_sequences(uni, "doc_id", "n_tok", 96, n_shards=1), 96
        ).agg(F.avg("fill_rate")).head()[0]
        assert fill_b >= fill_n

    def test_truncation_and_zero_drop(self, spark):
        from stream_sentinel_spark.operators.curation import (
            pack_sequences_bucketed,
        )

        docs = spark.createDataFrame(
            [(1, 0), (2, 500), (3, 10)], "doc_id long, n_tok long"
        )
        got = {
            r.doc_id: r
            for r in pack_sequences_bucketed(
                docs, "doc_id", "n_tok", context_len=256, n_shards=1
            ).collect()
        }
        assert set(got) == {2, 3}
        assert got[2].n_tok_packed == 256 and got[2].truncated
        assert not got[3].truncated


# ---------------------------------------------------------------------------
# factorize (dimension extraction)
# ---------------------------------------------------------------------------


def test_factorize_dense_deterministic_ids(spark):
    from stream_sentinel_spark.operators.curation import factorize

    df = spark.createDataFrame(
        [(1, "b", "x"), (2, "a", "y"), (3, "b", "x"), (4, "a", "y"), (5, "c", "z")],
        "id long, s string, l string",
    )
    dims, fact = factorize(df, ["s", "l"])
    d = {(r["s"], r["l"]): r["dim_id"] for r in dims.collect()}
    # dense 1..K in tuple sort order
    assert d == {("a", "y"): 1, ("b", "x"): 2, ("c", "z"): 3}
    f = {r["id"]: r["dim_id"] for r in fact.collect()}
    assert f == {1: 2, 2: 1, 3: 2, 4: 1, 5: 3}
    assert "s" not in fact.columns and "l" not in fact.columns


def test_factorize_null_is_a_dimension_member(spark):
    from stream_sentinel_spark.operators.curation import factorize

    df = spark.createDataFrame([(1, None), (2, "a"), (3, None)], "id long, s string")
    dims, fact = factorize(df, ["s"])
    d = {r["s"]: r["dim_id"] for r in dims.collect()}
    assert d == {None: 1, "a": 2}  # Spark sorts NULLS FIRST
    assert {r["id"]: r["dim_id"] for r in fact.collect()} == {1: 1, 2: 2, 3: 1}


def test_factorize_rejects_no_cols(spark):
    from stream_sentinel_spark.operators.curation import factorize

    with pytest.raises(ValueError, match="at least one column"):
        factorize(spark.range(1), [])


# ---------------------------------------------------------------------------
# select_token_budget
# ---------------------------------------------------------------------------


def test_token_budget_matches_single_window_reference(spark):
    from stream_sentinel_spark.operators.curation import select_token_budget

    import random

    rng = random.Random(7)
    rows = [(i, float(rng.randint(0, 50)), rng.randint(1, 99)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tok long")
    got = {
        r["doc_id"]: r["running_total"]
        for r in select_token_budget(df, 3000, "score", "n_tok", "doc_id", partitions=7).collect()
    }
    # sequential reference: descending score, doc_id tie-break
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, cum = {}, 0
    for i, (doc, _s, tok) in enumerate(ordered):
        cum += tok
        if cum > 3000:
            break
        want[doc] = cum
    assert got == want


def test_token_budget_boundary_doc_excluded_whole(spark):
    from stream_sentinel_spark.operators.curation import select_token_budget

    df = spark.createDataFrame(
        [(1, 3.0, 60), (2, 2.0, 50), (3, 1.0, 40)],
        "doc_id long, score double, n_tok long",
    )
    rows = select_token_budget(df, 100, "score", "n_tok", "doc_id").collect()
    # doc 2 would land at 110 > 100: excluded entirely, and the greedy
    # does NOT skip ahead to doc 3 (prefix selection, not knapsack)
    assert [(r["doc_id"], r["running_total"]) for r in rows] == [(1, 60)]


def test_token_budget_rejects_nulls_and_negative_budget(spark):
    from stream_sentinel_spark.operators.curation import select_token_budget

    df = spark.createDataFrame(
        [(1, None, 5), (2, 1.0, 5)], "doc_id long, score double, n_tok long"
    )
    with pytest.raises(ValueError, match="NULL"):
        select_token_budget(df, 10, "score", "n_tok", "doc_id")
    ok = spark.createDataFrame([(1, 1.0, 5)], "doc_id long, score double, n_tok long")
    with pytest.raises(ValueError, match="non-negative"):
        select_token_budget(ok, -1, "score", "n_tok", "doc_id")
