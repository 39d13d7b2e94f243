"""Text-analysis functions for training-data pipelines — all pure column
expressions (whole-stage codegen; no UDFs).

- token/char counting (whitespace + the BM25 regex tokenizer's count)
- quality scoring: length, punctuation ratio, stopword ratio, alpha ratio
- language-ID heuristic: stopword-hit share per language list
- document fingerprinting: md5 content digest + positional rolling digest
- Gopher-style repetition signals: duplicate-line / duplicate-word
  fractions and top-n-gram character coverage (Rae et al. 2021, §A1.1)
- normalization + PII redaction: whitespace/control cleanup, URL /
  e-mail / digit-run masking
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.tokenization import STOPWORDS_EN

# tiny public function-word lists for the lang-id heuristic (top function
# words; public knowledge, any introductory corpus-linguistics list)
_LANG_MARKERS = {
    "en": sorted(STOPWORDS_EN),
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "del", "para", "que", "con"],
}


def _ws_tokens(col):
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def _lines(col):
    """Non-empty trimmed lines.  Splits on ``\\r?\\n`` so CRLF text does
    not leave ``\\r`` remnants (Spark's trim strips only spaces) — a
    remnant would make blank lines count as equal non-empty lines and
    defeat suffix rules like the ellipsis check."""
    return F.filter(
        F.transform(F.split(col, r"\r?\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _content_norm(col):
    """Whitespace-normalized, lowercased text — the shared content
    identity for fingerprinting and streaming dedup keys."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def content_md5(col) -> "F.Column":
    """md5 of :func:`_content_norm` — equal to ``fp_md5`` from
    :func:`with_fingerprint`; the single definition both batch
    fingerprinting and :mod:`~bm25s_spark.streaming.dedup` key on."""
    return F.md5(_content_norm(col))


# GPT-2-style pre-tokenizer pattern, lookahead-free: English contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, and
# whitespace runs.  The published GPT-2 pattern ends in ``\s+(?!\S)|\s+``;
# RE2 engines (DuckDB's regexp) have no lookahead, so this drops the
# trailing-space special case — counts differ from tiktoken's
# pre-tokenizer only on interior-whitespace boundaries ("BPE-ish").
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(col) -> "F.Column":
    """Count of BPE pre-tokenizer pieces (:data:`BPE_SPLIT_PATTERN`) —
    the standard proxy for "LLM tokens" when the real BPE merges aren't
    needed (each piece splits into ≥1 BPE token, so this is a lower
    bound and tracks the true count closely on natural text).  A pure
    column expression (one regex scan per row, linear-time — the
    pattern is backtracking-free)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), 0))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_chars_text / n_ws_tokens / n_regex_tokens (the BM25
    tokenizer's ``\\w\\w+`` count, pre-stopword) / n_bpe_tokens (the
    BPE pre-tokenizer piece count)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_chars_text", F.length(c))
        .withColumn("n_ws_tokens", F.size(_ws_tokens(c)))
        .withColumn(
            "n_regex_tokens", F.size(F.regexp_extract_all(F.lower(c), F.lit(r"\w\w+"), 0))
        )
        .withColumn("n_bpe_tokens", bpe_token_count(c))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality signals: stopword_ratio, alpha_ratio, punct_ratio,
    mean_token_len, and a composite quality_score in [0,1]."""
    c = F.col(text_col)
    toks = _ws_tokens(F.lower(c))
    n_toks = F.size(toks)
    sw = F.array(*[F.lit(w) for w in sorted(STOPWORDS_EN)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}]", ""))
    n_chars = F.greatest(F.length(c), F.lit(1))
    df = (
        df.withColumn("n_tokens", n_toks)
        .withColumn(
            "stopword_ratio",
            (n_stop / F.greatest(n_toks, F.lit(1))).cast("double"),
        )
        .withColumn("alpha_ratio", (n_alpha / n_chars).cast("double"))
        .withColumn("punct_ratio", (n_punct / n_chars).cast("double"))
        .withColumn(
            "mean_token_len",
            (F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
             / F.greatest(n_toks, F.lit(1))).cast("double"),
        )
    )
    # composite: reward mid-length docs with some (not all) stopwords and
    # mostly alphabetic content — a simple, deterministic heuristic
    len_score = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    stop_score = F.lit(1.0) - F.abs(F.col("stopword_ratio") - 0.3) / F.lit(0.7)
    return df.withColumn(
        "quality_score",
        (F.lit(0.4) * len_score + F.lit(0.3) * F.greatest(stop_score, F.lit(0.0))
         + F.lit(0.3) * F.col("alpha_ratio")).cast("double"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append lang_guess: the language whose function-word list hits the
    largest share of whitespace tokens ('und' beats 'the' for German…);
    'unk' when nothing hits.  An n-gram/stopword heuristic — cheap, fully
    deterministic, and good enough for corpus routing."""
    toks = _ws_tokens(F.lower(F.col(text_col)))
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct((hits / n).alias("share"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_guess",
        F.when(best["share"] > 0, best["lang"]).otherwise(F.lit("unk")),
    )


def _ngrams(tokens_col, n: int):
    """Word n-grams of a *materialized* token-array column, built from
    shifted slices zip_with'd together — O(L) per row.  (slice/element_at
    over an inline expression inside a per-element lambda re-evaluates
    the expression per element, i.e. O(L^2); column-reference slices
    evaluate once.)"""
    sz = F.size(tokens_col)
    width = F.greatest(sz - (n - 1), F.lit(0))
    out = F.slice(tokens_col, F.lit(1), width)
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(tokens_col, F.lit(i + 1), width),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def _top_run(sorted_col):
    """(count, value) of the most frequent element of a *sorted* array
    column via a single linear scan: equal elements are adjacent, so the
    longest run is the mode.  Ties resolve to the lexicographically
    smallest element (first encountered in ascending order; the update
    requires a strictly longer run).  Zero shuffle, whole-stage codegen."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best_cnt"), F.lit("").alias("best_val"),
    )

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best_cnt"]
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, g).otherwise(acc["best_val"]).alias("best_val"),
        )

    return F.aggregate(sorted_col, init, step)


def with_repetition(
    df: DataFrame, text_col: str = "text", ngram_ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Append Gopher-style repetition signals (Rae et al. 2021, §A1.1 —
    the repetition filters of the MassiveText pipeline; same family as
    RefinedWeb/Dolma):

    - ``n_lines``             non-empty lines (split on newline, trimmed)
    - ``dup_line_frac``       fraction of lines that repeat an earlier line
    - ``dup_line_char_frac``  fraction of line characters inside those repeats
    - ``dup_word_frac``       fraction of word occurrences beyond each
                              word's first occurrence
    - ``top_{n}gram``         most frequent word n-gram (tie → lexicographically
                              smallest), ``''`` when the doc has < n words
    - ``top_{n}gram_cnt``     its occurrence count
    - ``top_{n}gram_char_frac`` chars covered by its occurrences
                              (cnt × len(gram) / doc chars; overlapping
                              occurrences may overcount — the standard
                              Gopher approximation)

    Scale shape: every signal is a pure column expression over per-row
    arrays — no explode, no shuffle, no UDF; the top-n-gram is a sorted
    run-length scan (O(L log L) per row), so the operator stays narrow
    and whole-stage-codegen'd at any corpus size.  Reference scope: the
    reference engine has no quality filters; this implements the
    beyond-reference training-data-pipeline mandate.
    """
    c = F.col(text_col)
    doc_chars = F.greatest(F.length(c), F.lit(1))

    lines = _lines(c)
    df = df.withColumn("_lines", lines).withColumn(
        "_dlines", F.array_distinct(F.col("_lines"))
    )
    n_lines = F.size(F.col("_lines"))
    line_chars = F.aggregate(
        F.col("_lines"), F.lit(0), lambda a, l: a + F.length(l)
    )
    dline_chars = F.aggregate(
        F.col("_dlines"), F.lit(0), lambda a, l: a + F.length(l)
    )
    df = (
        df.withColumn("n_lines", n_lines)
        .withColumn(
            "dup_line_frac",
            ((n_lines - F.size(F.col("_dlines")))
             / F.greatest(n_lines, F.lit(1))).cast("double"),
        )
        .withColumn(
            "dup_line_char_frac",
            ((line_chars - dline_chars)
             / F.greatest(line_chars, F.lit(1))).cast("double"),
        )
    )

    df = df.withColumn("_toks", _ws_tokens(F.lower(c)))
    n_toks = F.size(F.col("_toks"))
    df = df.withColumn(
        "dup_word_frac",
        ((n_toks - F.size(F.array_distinct(F.col("_toks"))))
         / F.greatest(n_toks, F.lit(1))).cast("double"),
    )
    for n in ngram_ns:
        # the run-scan aggregate is the expensive expression here:
        # materialize its struct ONCE and read fields from the alias —
        # inlining `top[...]` per output column authored N copies of the
        # whole aggregate into the plan (interpreted HOFs get no codegen
        # CSE, so every copy executes; it also bloats optimizer time)
        df = df.withColumn(f"_g{n}", F.sort_array(_ngrams(F.col("_toks"), n)))
        df = df.withColumn(f"_top{n}", _top_run(F.col(f"_g{n}")))
        df = (
            df.withColumn(f"top_{n}gram", F.col(f"_top{n}")["best_val"])
            .withColumn(f"top_{n}gram_cnt", F.col(f"_top{n}")["best_cnt"])
            .withColumn(
                f"top_{n}gram_char_frac",
                (F.col(f"top_{n}gram_cnt") * F.length(F.col(f"top_{n}gram"))
                 / doc_chars).cast("double"),
            )
            .drop(f"_g{n}", f"_top{n}")
        )
    return df.drop("_lines", "_dlines", "_toks")


def with_normalized(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Append ``{text_col}_norm``: control characters (``\\x00-\\x1f``,
    ``\\x7f``) replaced by spaces, whitespace runs collapsed to one
    space, trimmed, optionally lowercased.  Explicit byte-range classes
    (not ``\\p{Cntrl}``) so the exact same regex runs under Java regex
    and RE2 — the correctness oracle replays it in DuckDB."""
    out = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"[\x00-\x1f\x7f]", " "),
            r"\s+", " ",
        )
    )
    if lowercase:
        out = F.lower(out)
    return df.withColumn(out_col or f"{text_col}_norm", out)


def with_redacted(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    redact_urls: bool = True,
    redact_emails: bool = True,
    min_digits: int | None = 6,
) -> DataFrame:
    """Append ``{text_col}_redacted``: URLs → ``<URL>``, e-mail
    addresses → ``<EMAIL>``, digit runs of ``min_digits``+ (IDs, phone
    numbers, SSNs…) → ``<NUM>`` (``min_digits=None`` disables).  URL
    masking runs first so addresses/digits embedded in a URL don't
    leave partial residue.  Patterns are RE2-compatible (no lookarounds,
    no backreferences) so they run identically on Spark's Java regex,
    RE2-based engines, and the DuckDB oracle — and stay linear-time on
    adversarial inputs at 100 TB."""
    out = F.col(text_col)
    if redact_urls:
        out = F.regexp_replace(out, r"https?://[^\s]+", "<URL>")
    if redact_emails:
        out = F.regexp_replace(
            out, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
            "<EMAIL>",
        )
    if min_digits is not None:
        if min_digits < 1:
            # \d{0,} matches the empty string at every offset and would
            # interleave <NUM> through the whole text
            raise ValueError(f"min_digits must be >= 1 or None, got {min_digits}")
        out = F.regexp_replace(out, r"\d{%d,}" % min_digits, "<NUM>")
    return df.withColumn(out_col or f"{text_col}_redacted", out)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append content digests: ``fp_md5`` (exact content identity on
    normalized text) and ``fp_head`` (digest of the first 5 normalized
    tokens — a cheap prefix fingerprint for clustering boilerplate)."""
    norm = _content_norm(F.col(text_col))
    head = F.array_join(F.slice(F.split(norm, " "), 1, 5), " ")
    return (
        df.withColumn("fp_md5", F.md5(norm))
        .withColumn("fp_head", F.md5(head))
    )


# the eight function words Gopher requires at least two of (Rae et al.
# 2021, §A1.1: "must contain at least 2 of the following English words")
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# fixed rule order — drop_reasons lists failures in this order, so the
# output is deterministic and comparable across engines
_GOPHER_RULES = (
    "word_count", "mean_word_length", "symbol_ratio", "bullet_lines",
    "ellipsis_lines", "alpha_words", "stop_words", "dup_line_frac",
    "dup_line_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_start_frac: float = 0.9,
    max_ellipsis_end_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_word_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_2gram_char_frac: float = 0.2,
    max_top_3gram_char_frac: float = 0.18,
) -> DataFrame:
    """Compose the Gopher document-quality rules (Rae et al. 2021, §A1.1
    Table A1 — the MassiveText filter; defaults are the published
    thresholds) into a keep/drop decision.

    Appends the underlying signals plus:

    - ``drop_reasons``  ``array<string>`` of failed rules in the fixed
      :data:`_GOPHER_RULES` order (empty → document survives)
    - ``keep``          ``drop_reasons`` is empty

    Signals reused from :func:`with_repetition` (dup-line / top-n-gram
    family) plus the document-shape rules computed here: word count,
    mean word length, symbol-to-word ratio (``#`` and ellipses), lines
    starting with a bullet, lines ending in an ellipsis, fraction of
    words with an alphabetic character, and required-stop-word hits.

    Every rule is a pure column expression over per-row arrays — no
    shuffle, no UDF, whole-stage-codegen'd; the filter costs one narrow
    pass regardless of corpus size.  All ratios are exact integer
    divisions, so threshold comparisons are FP-identical across engines
    (the DuckDB oracle replays them verbatim).  Reference scope: the
    reference engine has no quality filters; this implements the
    beyond-reference training-data-pipeline mandate.
    """
    c = F.col(text_col)
    df = with_repetition(df, text_col=text_col)

    # materialize the expensive per-row arrays ONCE as temp columns —
    # authoring them inline put 3-4 copies of each regex split into the
    # plan (one per consuming signal), and interpreted HOFs execute
    # every copy; aliases referenced more than once are not re-inlined
    # by the optimizer because they are non-cheap
    df = (
        df.withColumn("_gw", _ws_tokens(c))
        .withColumn("_glw", _ws_tokens(F.lower(c)))
        .withColumn("_gl", _lines(c))
    )
    words = F.col("_gw")
    lwords = F.col("_glw")
    lines = F.col("_gl")
    n_words = F.size(words)
    n_words1 = F.greatest(n_words, F.lit(1))
    n_lines1 = F.greatest(F.size(lines), F.lit(1))

    n_symbols = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\.|…"), 0))
    n_bullet = F.size(
        F.filter(lines, lambda l: F.substring(l, 1, 1).isin("•", "‣", "▶", "-", "*"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    stop_hits = F.size(F.filter(req, lambda s: F.array_contains(lwords, s)))

    df = (
        df.withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            (F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
             / n_words1).cast("double"),
        )
        .withColumn("symbol_word_ratio", (n_symbols / n_words1).cast("double"))
        .withColumn("bullet_start_frac", (n_bullet / n_lines1).cast("double"))
        .withColumn("ellipsis_end_frac", (n_ellipsis / n_lines1).cast("double"))
        .withColumn("alpha_word_frac", (n_alpha_words / n_words1).cast("double"))
        .withColumn("stop_word_hits", stop_hits)
        .drop("_gw", "_glw", "_gl")
    )
    checks = {
        "word_count": (F.col("n_words") < min_words)
        | (F.col("n_words") > max_words),
        "mean_word_length": (F.col("mean_word_len") < min_mean_word_len)
        | (F.col("mean_word_len") > max_mean_word_len),
        "symbol_ratio": F.col("symbol_word_ratio") > max_symbol_word_ratio,
        "bullet_lines": F.col("bullet_start_frac") > max_bullet_start_frac,
        "ellipsis_lines": F.col("ellipsis_end_frac") > max_ellipsis_end_frac,
        "alpha_words": F.col("alpha_word_frac") < min_alpha_word_frac,
        "stop_words": F.col("stop_word_hits") < min_stop_word_hits,
        "dup_line_frac": F.col("dup_line_frac") > max_dup_line_frac,
        "dup_line_char_frac": F.col("dup_line_char_frac") > max_dup_line_char_frac,
        "top_2gram_char_frac": F.col("top_2gram_char_frac") > max_top_2gram_char_frac,
        "top_3gram_char_frac": F.col("top_3gram_char_frac") > max_top_3gram_char_frac,
    }
    reasons = F.filter(
        F.array(*[F.when(checks[r], F.lit(r)) for r in _GOPHER_RULES]),
        lambda x: x.isNotNull(),
    )
    # `keep` carries a nondeterministic no-op conjunct
    # (spark_partition_id() ≥ 0 is always true, so the VALUE is
    # unchanged): a deterministic `keep` lets the optimizer substitute a
    # caller's `.where("keep")` through the projection, duplicating the
    # ENTIRE signal tree (every interpreted HOF above) into the pushed
    # filter — measured 3× the per-row work and ~3× the optimizer/
    # codegen time on the bench pass.  (rand()-based guards no longer
    # work: Spark 4 range-folds comparisons against rand's [0,1) bounds.)
    # Guide §4.4 fix applied to the one expensive composite, not blanket.
    # Cost: predicates on gopher columns no longer reorder below this
    # projection (they never reached the parquet scan anyway — derived
    # columns don't push down).
    return df.withColumn("drop_reasons", reasons).withColumn(
        "keep",
        (F.spark_partition_id() >= F.lit(0))
        & (F.size(F.col("drop_reasons")) == 0),
    )
