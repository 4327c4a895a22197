"""Text analysis operators for training-data curation.

All pure column expressions (codegen'd, zero UDFs), so they cost one
scan at any scale: token/char statistics, quality scoring, heuristic
language ID, and content fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny stopword lexicons for the heuristic language guesser. Word-
#: boundary regex match counts per language; argmax wins (first language
#: in this order wins ties — keep the order stable, it is part of the
#: operator's contract).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|un|es)\b",
    "fr": r"\b(le|la|les|et|des|un|une|est|que|dans)\b",
    "zh": r"[一-鿿]",
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_count(col: Column) -> Column:
    """Count of non-alphanumeric, non-space characters (explicit class —
    identical semantics across regex dialects)."""
    return F.length(col) - F.length(
        F.regexp_replace(col, r"[^a-zA-Z0-9 \t\n]", "")
    )


def stopword_count(col: Column, pattern: str = LANG_MARKERS["en"]) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Score = mean of three deterministic ratio signals (token length
    band, low punctuation, stopword presence) — division-only double
    arithmetic, reproducible anywhere.
    """
    c = F.col(text_col)
    toks = token_count(c)
    chars = char_count(c)
    puncts = punct_count(c)
    stops = stopword_count(c)
    avg_tok_len = F.when(toks > 0, chars.cast("double") / toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(chars > 0, puncts.cast("double") / chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(toks > 0, stops.cast("double") / toks).otherwise(F.lit(0.0))
    tok_len_ok = F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        chars.alias("n_chars"),
        puncts.alias("n_punct"),
        stops.alias("n_stopwords"),
        avg_tok_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ((tok_len_ok + punct_ok + stop_ok) / F.lit(3.0)).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: stopword-marker match counts per language,
    argmax with a stable tie order (lexicon declaration order)."""
    lowered = F.lower(F.col(text_col))
    scores = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat), F.lit(0)))
        for lang, pat in LANG_MARKERS.items()
    }
    # argmax via a greatest-first CASE chain in declaration order
    best = F.greatest(*scores.values())
    guess = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):
        guess = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(guess)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        guess.alias("lang_guess"),
    )
    return out


#: BPE-ish pre-tokenizer regex — a lookahead-free simplification of the
#: GPT-2 pattern (contractions | space+letters | space+digits |
#: space+punct-run | whitespace-run), RE2-compatible so the DuckDB
#: oracle can run the identical pattern.
BPE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"

#: Rabin-Karp rolling-hash parameters (public textbook construction):
#: polynomial base 31 mod the Mersenne prime 2^31−1 — products stay
#: < 2^36, exact in 64-bit integer arithmetic on any engine.
ROLL_BASE = 31
ROLL_MOD = 2_147_483_647


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counts two ways: whitespace tokens and BPE-ish subword
    pre-tokens (the standard first pass of a GPT-style tokenizer). Pure
    regexp column expressions — one scan, codegen'd, no UDF."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        token_count(c).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(c), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("n_bpe_tokens"),
    )


def rolling_hash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rabin-Karp polynomial fingerprint of the printable-ASCII
    projection of the text: h = Σ code·31^i mod (2^31−1), folded
    left-to-right with ``aggregate`` over the char array (codegen'd
    integer arithmetic, deterministic on every engine — the oracle runs
    the same fold via list_reduce)."""
    ascii_only = F.regexp_replace(F.col(text_col), r"[^\x20-\x7e]", "")
    h = F.aggregate(
        F.split(ascii_only, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLL_BASE + F.ascii(ch)) % ROLL_MOD,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(ascii_only) > 0, h).otherwise(F.lit(0)).alias("roll_hash"),
        F.length(ascii_only).alias("ascii_len"),
    )


#: PII redaction patterns (lookahead-free, RE2-compatible so the DuckDB
#: oracle can run the identical regexes). ORDERED — each rule sees the
#: output of the previous one: emails first (their local/domain digits
#: must not look like phones/SSNs afterwards), cards with separators
#: before bare phones (a 4-4-4-4 group run must not half-match as a
#: phone), IPs before contiguous digit runs, SSN last. International
#: phones need a separate '+'-anchored rule because RE2 has no
#: lookbehind and \b never matches before '+'.
REDACTION_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{4}[-. ][0-9]{4}[-. ][0-9]{4}[-. ][0-9]{4}\b", "<CARD>"),
    # three phone shapes because RE2 has no lookbehind and \b cannot sit
    # before the non-word chars '+' and '(':
    (r"\+[0-9]{1,3}[-. ]?(?:\([0-9]{3}\)|[0-9]{3})[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b", "<PHONE>"),
    (r"\([0-9]{3}\)[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b", "<PHONE>"),
    (r"\b[0-9]{3}[-. ]?[0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{13,19}\b", "<CARD>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
)


#: One alternation matching every placeholder the rules can emit —
#: counting its occurrences in the FINAL text replaces 8 per-rule
#: count scans with a single pass.
_REDACTION_TOKEN_PATTERN = (
    "<(?:" + "|".join(sorted({tok[1:-1] for _, tok in REDACTION_RULES})) + ")>"
)


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Replace common PII shapes (emails, cards incl. 4-4-4-4 formatted,
    domestic and '+'-prefixed phones, IPs, SSNs) with typed placeholder
    tokens — chained regexp_replace, one scan, codegen'd. The rule list
    is ordered and RE2-safe so any engine reproduces it byte-for-byte.

    ``n_redactions`` is EXACTLY the number of replacements performed,
    computed as placeholder-token count in the FINAL text minus the
    count already present in the SOURCE text — two regex passes instead
    of one count scan per rule (the replacement chain is 8 passes either
    way; per-rule counting doubled it to 16). The difference is exact
    because no rule pattern can consume a character of an existing
    placeholder: no pattern's character classes include ``<`` or ``>``,
    so a match can never span a placeholder boundary, and a match
    cannot sit strictly inside one either (the interiors are pure
    letters, every pattern requires a digit or ``@``). Adversarial
    token-adjacent shapes stay exact — ``<EMAIL>@x.co`` has NO email
    match (the mandatory ``@``-adjacent local part would need the
    ``>``), and ``<EMAIL@x.co>`` → ``<<EMAIL>>`` is one replacement
    and one net new token — pinned for both this chain and the RE2
    oracle in tests/test_extensions.py. Pre-existing tokens therefore
    survive every rule untouched and each replacement adds exactly one
    token."""
    src = F.col(text_col)
    out = src
    for pattern, token in REDACTION_RULES:
        out = F.regexp_replace(out, pattern, token)

    def tok_count(col):
        return F.size(
            F.regexp_extract_all(col, F.lit(_REDACTION_TOKEN_PATTERN), F.lit(0))
        )

    return df.select(
        F.col(id_col).alias("doc_id"),
        out.alias("redacted_text"),
        (tok_count(out) - tok_count(src)).alias("n_redactions"),
    )


def content_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization fingerprint: md5 of the lower-cased text with all
    non-alphanumerics stripped — catches whitespace/punctuation-only
    near-duplicates exactly."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("normalized_len"),
    )


def c4_filters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> DataFrame:
    """C4-style heuristic document filters (Raffel et al. 2020, §2.2 of
    the T5 paper): the rule set that turned Common Crawl into C4,
    expressed as one pass of pure column expressions.

    Per-document signals:

    - ``n_words`` — whitespace token count;
    - ``n_lines`` — newline-separated line count;
    - ``frac_lines_terminal`` — fraction of lines ending in terminal
      punctuation (``. ! ? "``), the C4 "retain lines that end in a
      terminal punctuation mark" signal, lifted to a per-doc fraction;
    - ``mean_word_len`` — total word chars / word count (the classic
      gibberish-vs-prose band is ~3-10);
    - ``has_lorem`` — contains "lorem ipsum" (case-insensitive);
    - ``has_brace`` — contains ``{`` (the C4 code/JS filter);
    - ``keep`` — the conjunction: word count in
      ``[min_words, max_words]``, mean word length in the band, no
      lorem-ipsum, no brace.

    All divisions are single IEEE-double ops on exact integer counts —
    deterministic cross-engine without rounding.

    Scale shape: map-only (one projection over the scan, zero shuffles,
    zero UDFs); at 100 TB this is the cheapest possible filter pass and
    composes with any downstream dedup without adding an exchange.
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    words = F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    n_terminal = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike('[.!?"]$'))
    ).cast("bigint")
    word_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(n_words > 0, word_chars / n_words)
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    frac_terminal = F.when(n_lines > 0, n_terminal / n_lines)
    keep = (
        n_words.between(min_words, max_words)
        & mean_word_len.between(min_mean_word_len, max_mean_word_len)
        & ~has_lorem
        & ~has_brace
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        frac_terminal.alias("frac_lines_terminal"),
        mean_word_len.alias("mean_word_len"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
