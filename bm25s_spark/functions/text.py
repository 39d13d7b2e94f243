"""Text-analysis functions for training-data pipelines — all pure column
expressions (whole-stage codegen; no UDFs).

- token/char counting (whitespace + the BM25 regex tokenizer's count)
- quality scoring: length, punctuation ratio, stopword ratio, alpha ratio
- language-ID heuristic: stopword-hit share per language list
- document fingerprinting: md5 content digest + positional rolling digest
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
