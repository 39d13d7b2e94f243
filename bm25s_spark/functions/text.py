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


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_chars_text / n_ws_tokens / n_regex_tokens (the BM25
    tokenizer's ``\\w\\w+`` count, pre-stopword)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_chars_text", F.length(c))
        .withColumn("n_ws_tokens", F.size(_ws_tokens(c)))
        .withColumn(
            "n_regex_tokens", F.size(F.regexp_extract_all(F.lower(c), F.lit(r"\w\w+"), 0))
        )
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

    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
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
        df = df.withColumn(f"_g{n}", F.sort_array(_ngrams(F.col("_toks"), n)))
        top = _top_run(F.col(f"_g{n}"))
        df = (
            df.withColumn(f"top_{n}gram", top["best_val"])
            .withColumn(f"top_{n}gram_cnt", top["best_cnt"])
            .withColumn(
                f"top_{n}gram_char_frac",
                (F.col(f"top_{n}gram_cnt") * F.length(F.col(f"top_{n}gram"))
                 / doc_chars).cast("double"),
            )
            .drop(f"_g{n}")
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
        out = F.regexp_replace(out, r"\d{%d,}" % min_digits, "<NUM>")
    return df.withColumn(out_col or f"{text_col}_redacted", out)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append content digests: ``fp_md5`` (exact content identity on
    normalized text) and ``fp_head`` (digest of the first 5 normalized
    tokens — a cheap prefix fingerprint for clustering boilerplate)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    head = F.array_join(F.slice(F.split(norm, " "), 1, 5), " ")
    return (
        df.withColumn("fp_md5", F.md5(norm))
        .withColumn("fp_head", F.md5(head))
    )
