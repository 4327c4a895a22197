"""Semantic unit tests for dedup.containment_pairs (corpus entry x70
locks cross-engine parity; these lock the operator contract on crafted
inputs — the near-subset case Jaccard misses, and the rare-feature
blocking semantics)."""

from __future__ import annotations

import pytest

from stream_sentinel_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_subset_doc_scores_full_containment(spark):
    # Doc 1's entire shingle set occurs inside doc 2 → containment 1.0,
    # while Jaccard is |A|/|B| ≈ 6/16 and would miss at any high
    # threshold. rare_frac=1.0 disables blocking so the score is over
    # the full shingle universe.
    df = _docs(
        spark,
        [
            (1, "abcdefgh"),
            (2, "XXWXYZ abcdefgh QQPQRS"),
            (3, "entirely different text"),
        ],
    )
    pairs = {
        (r.a_id, r.b_id): r
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0
        ).collect()
    }
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.containment == 1.0
    assert r.a_sz == 6  # "abcdefgh" → 6 distinct 3-grams
    assert r.shared == 6
    # Jaccard on the same pair is far below 0.9 — the case this
    # operator exists for.
    jacc = r.shared / (r.a_sz + r.b_sz - r.shared)
    assert jacc < 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_symmetric_orientation_uses_min_size(spark):
    # Orientation must not matter: the score divides by the SMALLER
    # set regardless of which id sorts first.
    df = _docs(
        spark,
        [
            (10, "XXWXYZ abcdefgh QQPQRS"),  # superset has the lower id
            (20, "abcdefgh"),
        ],
    )
    rows = dedup.containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0
    ).collect()
    assert len(rows) == 1
    assert (rows[0].a_id, rows[0].b_id) == (10, 20)
    assert rows[0].containment == 1.0


def test_rare_blocking_drops_ubiquitous_only_overlap(spark):
    # Every doc shares the ubiquitous run "mmmm..." (its shingles have
    # document frequency 4, the vocabulary's top); docs 1/2 additionally
    # share df=2 content. The vocabulary is 16 df=1 + 8 df=2 + 2 df=4
    # shingles, so rare_frac=0.7 → rank ceil(0.7·26)=19 → cutoff df=2:
    # the shared-content shingles survive, the ubiquitous ones don't.
    # The 3-4 pair (overlapping ONLY through ubiquitous shingles) must
    # not surface, while 1-2 must.
    common = "mmmmmmmm"
    df = _docs(
        spark,
        [
            (1, f"abcdefgh {common}"),
            (2, f"abcdefgh {common}"),
            (3, f"uvqrstuv {common}"),
            (4, f"kjihgfed {common}"),
        ],
    )
    pairs = {
        (r.a_id, r.b_id)
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, rare_frac=0.7
        ).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) not in pairs


def test_no_self_pairs_and_ordered_ids(spark):
    df = _docs(spark, [(5, "abcdefgh"), (6, "abcdefgh"), (7, "abcdefgh")])
    rows = dedup.containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0
    ).collect()
    got = sorted((r.a_id, r.b_id) for r in rows)
    assert got == [(5, 6), (5, 7), (6, 7)]
    assert all(r.containment == 1.0 for r in rows)


def test_min_size_floor_drops_tiny_sets(spark):
    # Docs 8/9 share their ONLY rare shingle-set (2 shingles of "xyzq")
    # → containment 1.0 over a size-2 set: classic small-set noise.
    # min_size=3 must drop that pair while keeping the real one.
    df = _docs(
        spark,
        [
            (1, "abcdefgh"),
            (2, "abcdefgh"),
            (8, "xyzq"),
            (9, "xyzq"),
        ],
    )
    base = {
        (r.a_id, r.b_id)
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0
        ).collect()
    }
    assert (8, 9) in base and (1, 2) in base
    floored = {
        (r.a_id, r.b_id)
        for r in dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0, min_size=3
        ).collect()
    }
    assert floored == {(1, 2)}


def _template_corpus(spark):
    # 16 templates × 12 copies, each template sharing a long common run
    # plus template-specific rare content: rare-sets COLLAPSE (≥12
    # docs/class), so the compression gate admits the class regime.
    bases = [
        f"doc body shared run {chr(97 + i)}{chr(98 + i)}{chr(99 + i)} "
        f"unique{i:02d}tail{i * 7:03d}"
        for i in range(16)
    ]
    rows = [(i * 100 + j, bases[i]) for i in range(16) for j in range(12)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_class_regime_equals_prefix_path(spark, monkeypatch):
    # The two pair-generation strategies (degenerate-universe classes
    # vs asymmetric prefix filtering) must emit EXACTLY the same rows
    # (same pairs, same shared/sizes/score) — physical strategies, not
    # semantics changes. The oracle parity gate is the third
    # implementation (SQL per-doc join) agreeing on the same output.
    # The fixture must actually COMPRESS (≥4 docs per distinct
    # rare-set) or the class regime's gate rejects it and the test
    # compares the prefix path to itself — asserted below by making
    # the prefix path unreachable on the class side.
    df = _template_corpus(spark)
    kw = dict(n=3, threshold=0.9, rare_frac=0.2, min_size=5)

    monkeypatch.setattr(dedup, "_CONTAIN_CLASS_VOCAB_MAX", -1)
    rows_prefix = sorted(map(tuple, dedup.containment_pairs(
        df, "doc_id", "text", **kw
    ).collect()))
    monkeypatch.undo()

    def _boom(*a, **k):  # pragma: no cover - fails the test if reached
        raise AssertionError("class regime did not engage on the template corpus")

    monkeypatch.setattr(dedup, "_containment_by_prefix", _boom)
    rows_class = sorted(map(tuple, dedup.containment_pairs(
        df, "doc_id", "text", **kw
    ).collect()))

    assert rows_class == rows_prefix
    # every template yields its C(12,2)=66 within-class pairs at least
    assert len(rows_class) >= 16 * 66


def test_short_docs_emit_no_shingles(spark):
    # Spark's sequence(1, 0) DESCENDS, so without gram_arrays' length
    # gate a sub-n-char doc would emit truncated grams (and empty text
    # ['']) that the SQL oracle's range() never produces — shifting the
    # global df table and the rank cutoff. Short docs must vanish.
    df = _docs(spark, [(1, "ab"), (2, ""), (3, "x"), (4, "abcdefgh"), (5, "abcdefgh")])
    ga = {r.id: r.grams for r in dedup.gram_arrays(df, "doc_id", "text", 3).collect()}
    assert set(ga) == {4, 5}
    pairs = dedup.containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0
    ).collect()
    assert sorted((r.a_id, r.b_id) for r in pairs) == [(4, 5)]


def _heaps_corpus(spark, n_docs, words=30, seed=7):
    """A Heaps'-law corpus for 8-grams: every word is an independent
    random 8-letter string, so 8-char grams are (near-)unique across
    the corpus — the vocabulary grows with it and document frequencies
    stay O(1)."""
    import random

    rnd = random.Random(seed)
    rows = [
        (
            i,
            " ".join(
                "".join(
                    rnd.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(8)
                )
                for _ in range(words)
            ),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fixed_vocab_corpus(spark, n_docs):
    """The measured quadratic regime (STRESS_r08_x70): a FIXED 60-word
    lexicon, so every shingle's df grows with the corpus while the rank
    cutoff admits the same vocabulary fraction."""
    from stream_sentinel_spark.testing import make_skewed_corpus

    return make_skewed_corpus(
        spark, n_docs=n_docs, hot_cluster=max(20, n_docs // 100),
        planted_pairs=max(40, n_docs // 50), vocab=60, words_per_doc=30,
    ).docs


# slow tier: 500-1500-doc growth-law stress of the guard's cost model; the guard's routing itself is covered by the regime tests
@pytest.mark.slow
def test_candidate_mass_growth_law(spark):
    """The cost law the guard's docstring states: Σ idx_df·df grows
    quadratically on a fixed-vocab corpus (every df ∝ n) and linearly
    on a Heaps'-law one (df stays O(1), mass = Σ plen)."""
    masses = {}
    for tag, mk in (("fixed", _fixed_vocab_corpus), ("heaps", _heaps_corpus)):
        for n in (500, 1500):
            ds, _ = dedup._containment_doc_sets(
                mk(spark, n), "doc_id", "text", 8, 0.2, 5
            )
            masses[(tag, n)] = dedup._containment_candidate_mass(ds, 0.9)
    # 3x the docs: fixed-vocab mass grows >8x (measured 1595 -> 31556);
    # Heaps mass grows exactly with the doc count (measured 3.0x).
    assert masses[("fixed", 1500)] > 8 * masses[("fixed", 500)]
    assert masses[("heaps", 1500)] < 3.5 * masses[("heaps", 500)]


# slow tier: 5000-doc sized probe of the warn bound; the probe/warning plumbing is exercised by the guard regime tests at default size
@pytest.mark.slow
def test_candidate_warn_fires_fixed_vocab_silent_heaps(spark):
    """The guard itself, at the SAME corpus size and the SAME bound:
    5000 fixed-vocab docs exceed it (measured mass 539549), 5000
    Heaps'-law docs stay under (measured 140000). The probe is the
    only action containment_pairs runs before returning its lazy plan,
    so the warning fires without paying for the quadratic join."""
    import warnings

    bound = 280_000
    with pytest.warns(UserWarning, match="candidate collisions"):
        dedup.containment_pairs(
            _fixed_vocab_corpus(spark, 5000), "doc_id", "text",
            n=8, threshold=0.9, rare_frac=0.2, min_size=5,
            candidate_warn=bound,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup.containment_pairs(
            _heaps_corpus(spark, 5000), "doc_id", "text",
            n=8, threshold=0.9, rare_frac=0.2, min_size=5,
            candidate_warn=bound,
        )


def test_candidate_warn_class_regime_exempt(spark):
    """A corpus the class regime absorbs (few distinct rare-sets, ≥4x
    compression) never probes candidate mass — its member-pair
    explosion is output-bounded by construction, so even
    candidate_warn=0 stays silent."""
    import warnings

    df = _docs(spark, [(i, "abcdefgh common text") for i in range(40)])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = dedup.containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, rare_frac=1.0,
            candidate_warn=0,
        ).collect()
    assert len(rows) == 40 * 39 // 2
