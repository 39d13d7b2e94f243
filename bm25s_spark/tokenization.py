"""Arrow-vectorized tokenization with reference-exact semantics.

Pipeline per document (matching the reference's functional tokenizer,
``reference/bm25s/tokenization.py:566-719``):

1. lowercase the whole string (``:649-650``)
2. regex ``findall`` with ``(?u)\\b\\w\\w+\\b`` — the sklearn
   CountVectorizer pattern; drops 1-char tokens (``:638``, ``:152``)
3. optional empty fallback: an empty token list becomes ``[""]``
   (functional path quirk: ``allow_empty=False`` *inserts* the empty
   token, ``:654-655``; the ``Tokenizer`` class inverts the flag,
   ``:318-319`` — our boolean ``empty_fallback`` names the behavior
   directly and both reference spellings map onto it)
4. stopword filter on the **lowercased, unstemmed** token (``:659-661``)
5. optional stemming applied to unique tokens then remapped (``:675-699``)

Everything runs inside an iterator-of-series pandas UDF: regex compiled
once per executor task, stemmer instantiated once per task (the C stemmer
object is not picklable — same constraint the reference hits in
``reference/examples/tokenize_multiprocess.py:5-8``), stem results memoized
across batches in a per-task dict (mirrors the reference's ``word_to_stem``
cache, ``reference/bm25s/tokenization.py:334-339``).

No per-row Python at the DataFrame API level: the UDF receives Arrow
batches and uses pandas ``str`` ops for the regex scan.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# The classic Lucene StandardAnalyzer English stopword set (33 words) —
# public knowledge (org.apache.lucene.analysis.en.EnglishAnalyzer
# ENGLISH_STOP_WORDS_SET); identical to the reference's default English
# list semantics (verified by tests against the in-process reference).
STOPWORDS_EN: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    }
)

DEFAULT_TOKEN_PATTERN = r"(?u)\b\w\w+\b"


# reference language-name aliases (reference/bm25s/tokenization.py:524-560)
_LANG_ALIASES = {
    "english": "en", "english_plus": "en_plus", "german": "de",
    "dutch": "nl", "french": "fr", "spanish": "es", "portuguese": "pt",
    "italian": "it", "russian": "ru", "swedish": "sv", "norwegian": "no",
    "chinese": "zh", "turkish": "tr", "korean": "ko",
}


def resolve_stopwords(stopwords: str | Iterable[str] | None) -> frozenset[str]:
    """Resolve a stopword spec to a frozenset.

    Accepts the 14 language names/codes the reference supports plus
    ``en_plus`` (``reference/bm25s/tokenization.py:524-560`` /
    ``stopwords.py:1-3471`` — public NLTK / stopwords-iso lists), an
    explicit iterable of words, or None/"" (no filtering)."""
    if stopwords is None:
        return frozenset()
    if isinstance(stopwords, str):
        key = stopwords.lower()
        if key in ("", "none"):
            return frozenset()
        key = _LANG_ALIASES.get(key, key)
        from bm25s_spark.stopword_data import STOPWORD_SETS

        if key in STOPWORD_SETS:
            return STOPWORD_SETS[key]
        raise ValueError(
            f"Unknown stopword set {stopwords!r}; supported: "
            f"{sorted(STOPWORD_SETS)} (or pass an explicit list)."
        )
    return frozenset(stopwords)


def load_stemmer(stemmer: str | Callable | None):
    """Resolve a stemmer spec to a list[str]->list[str] callable, or None.

    Accepts a language name, a callable (``stemWords``-style or plain),
    or None.  ``"english"`` (the reference's recommended configuration,
    ``reference/bm25s/tokenization.py:675-699``), ``"german"``,
    ``"french"``, ``"spanish"``, ``"italian"`` and ``"portuguese"``
    (its most common non-English settings) always resolve to the
    vendored pure-Python Snowball implementations so behavior does not
    depend on whether PyStemmer is installed; other languages use
    PyStemmer when available (gated behind import-try).
    """
    if stemmer is None:
        return None
    if callable(stemmer):
        if hasattr(stemmer, "stemWords"):
            return stemmer.stemWords
        return stemmer
    if stemmer.lower() in ("en", "english", "porter2", "snowball"):
        from bm25s_spark.stemmer import SnowballEnglishStemmer

        return SnowballEnglishStemmer().stemWords
    if stemmer.lower() in ("de", "german"):
        from bm25s_spark.stemmer import SnowballGermanStemmer

        return SnowballGermanStemmer().stemWords
    if stemmer.lower() in ("fr", "french"):
        from bm25s_spark.stemmer import SnowballFrenchStemmer

        return SnowballFrenchStemmer().stemWords
    if stemmer.lower() in ("es", "spanish"):
        from bm25s_spark.stemmer import SnowballSpanishStemmer

        return SnowballSpanishStemmer().stemWords
    if stemmer.lower() in ("it", "italian"):
        from bm25s_spark.stemmer import SnowballItalianStemmer

        return SnowballItalianStemmer().stemWords
    if stemmer.lower() in ("pt", "portuguese"):
        from bm25s_spark.stemmer import SnowballPortugueseStemmer

        return SnowballPortugueseStemmer().stemWords
    try:
        import Stemmer  # type: ignore

        return Stemmer.Stemmer(stemmer).stemWords
    except ImportError as exc:
        raise ImportError(
            f"PyStemmer is not installed (needed for language {stemmer!r}); "
            "pass stemmer='english', None, or a callable."
        ) from exc


def _sql_token_pattern(py_pattern: str) -> str:
    """Translate the tokenizer's Python ``re`` pattern for Java regex.

    The default ``(?u)\\b\\w\\w+\\b`` becomes ``(?U)\\w\\w+`` — extract-all
    of a greedy word-char run is leftmost-longest, so the boundaries are
    implied, and Java's ``(?U)`` flag makes ``\\w`` Unicode-aware like
    Python's default.  Custom patterns pass through with only the flag
    respelled (callers own any remaining engine-semantics gap)."""
    if py_pattern == DEFAULT_TOKEN_PATTERN:
        return r"(?U)\w\w+"
    if py_pattern.startswith("(?u)"):
        return "(?U)" + py_pattern[4:]
    return py_pattern


def make_tokenizer_udf(
    stopwords: str | Iterable[str] | None = "en",
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
    lower: bool = True,
    stemmer: str | None = None,
    empty_fallback: bool = False,
    engine: str = "pandas",
):
    """Build the ``text:string -> tokens:array<string>`` tokenizer.

    ``stemmer`` must be a *spec* (language string or None) — not a live
    object — so the UDF closure stays picklable; the stemmer is
    instantiated lazily on each executor task.

    ``engine="pandas"`` (default) is the reference-exact path: Python
    ``re`` findall inside an Arrow-batched pandas UDF, required for
    stemming and for bit-exact Python-regex semantics on exotic Unicode.
    ``engine="sql"`` compiles the same pipeline to pure JVM column
    expressions (``lower`` → ``regexp_extract_all`` → stopword
    ``filter``) — no Python in the scan at all, whole-stage-codegen
    eligible.  Identical output for ASCII and ordinary Unicode text
    (Java's ``(?U)\\w`` vs Python's ``\\w`` differ only on exotic
    categories: superscript digits and the like).

    ``engine="sql"`` WITH a stemmer returns the pandas UDF (stemming is
    not expressible as JVM column expressions): the spec is honored by
    ``indexer.build_index``, which scans the corpus with the JVM
    tokenizer and folds stemming into a vocab-sized pass
    (:func:`bm25s_spark.indexer.stem_tf`); query batches — tiny next to
    the corpus — take this exact pandas twin, so query tokens stem
    identically to the build's vocab pass (same Snowball code).
    NOTE: only the ``build_index`` entry points deliver the JVM-scan +
    ``stem_tf`` combination — a direct caller of this factory (e.g. the
    standalone :func:`tokenize` helper) requesting ``sql`` + stemmer
    silently gets the pandas UDF in its scan, not the JVM engine.

    Both engines return a callable ``Column -> Column``, so the spec
    travels in ``tokenizer_kwargs`` and query-side tokenization always
    matches the index's build-side semantics.
    """
    sw = resolve_stopwords(stopwords)
    if engine == "sql" and stemmer is None:
        jpattern = _sql_token_pattern(token_pattern)
        sw_sorted = sorted(sw)

        def sql_tokenize(col):
            c = F.coalesce(col, F.lit(""))
            if lower:
                c = F.lower(c)
            arr = F.regexp_extract_all(c, F.lit(jpattern), 0)
            if empty_fallback:
                arr = F.when(
                    F.size(arr) == 0, F.array(F.lit(""))
                ).otherwise(arr)
            if sw_sorted:
                arr = F.filter(arr, lambda t: ~t.isin(*sw_sorted))
            return arr

        return sql_tokenize
    if engine not in ("pandas", "sql"):
        raise ValueError(f"unknown tokenizer engine {engine!r}")
    pattern = token_pattern
    do_lower = lower
    fallback = empty_fallback
    stemmer_spec = stemmer

    def tokenize_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        run = _pandas_token_fn(pattern, do_lower, fallback, sw, stemmer_spec)
        for series in batches:
            yield run(series)

    return F.pandas_udf(tokenize_iter, ArrayType(StringType()))


def _pandas_token_fn(pattern, do_lower, fallback, sw, stemmer_spec):
    """The pandas tokenizer kernel — ``pd.Series[str] -> pd.Series[list]``.

    ONE implementation shared by the Arrow UDF (executor-side) and
    :func:`make_local_tokenizer` (driver-side), so the two are identical
    by construction: lower → ``re`` findall → empty fallback → stopword
    filter → memoized per-type stemming."""
    stem_fn = load_stemmer(stemmer_spec)
    stem_cache: dict[str, str] = {"": ""}

    def finish(tokens: list[str]) -> list[str]:
        if fallback and not tokens:
            tokens = [""]
        kept = [t for t in tokens if t not in sw]
        if stem_fn is None:
            return kept
        missing = [t for t in set(kept) if t not in stem_cache]
        if missing:
            for tok, st in zip(missing, stem_fn(missing)):
                stem_cache[tok] = st
        return [stem_cache[t] for t in kept]

    def run(series: pd.Series) -> pd.Series:
        s = series.fillna("")
        if do_lower:
            s = s.str.lower()
        found = s.str.findall(pattern)
        return found.map(finish)

    return run


def make_local_tokenizer(
    stopwords: str | Iterable[str] | None = "en",
    token_pattern: str = DEFAULT_TOKEN_PATTERN,
    lower: bool = True,
    stemmer: str | None = None,
    empty_fallback: bool = False,
    engine: str = "pandas",
):
    """Driver-local twin of :func:`make_tokenizer_udf` for query batches
    already resident on the driver (``pd.Series[str] -> pd.Series[list]``).

    The sharded retrieval path pulls each ≤chunk query batch to the
    driver anyway (the kernel broadcast needs the metadata), so
    tokenizing those few thousand short strings through a pandas UDF
    costs a full Spark job + Python-worker round-trip for work the
    driver does in milliseconds.  This returns the SAME kernel the UDF
    wraps (:func:`_pandas_token_fn` — shared closure, parity by
    construction) whenever the query-side tokenizer is the pandas path:
    ``engine="pandas"``, or ``engine="sql"`` WITH a stemmer (where
    :func:`make_tokenizer_udf` already returns the pandas twin for
    queries).  Returns ``None`` for the stemmer-less ``engine="sql"``
    configuration — there query tokenization is JVM column expressions,
    and Python ``re`` differs on exotic Unicode categories, so the
    caller must keep the distributed path to match the build's vocab."""
    if engine == "sql" and stemmer is None:
        return None
    if engine not in ("pandas", "sql"):
        raise ValueError(f"unknown tokenizer engine {engine!r}")
    return _pandas_token_fn(
        token_pattern, lower, empty_fallback,
        resolve_stopwords(stopwords), stemmer,
    )


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    **udf_kwargs,
) -> DataFrame:
    """Append a ``tokens`` column; the standalone-tokenizer API
    (functional ``bm25s.tokenize`` analog, returning a DataFrame)."""
    udf = make_tokenizer_udf(**udf_kwargs)
    return df.withColumn(out_col, udf(F.col(text_col)))


def make_stem_udf(stemmer: str | Callable):
    """``term:string -> stem:string`` pandas UDF over token *types*.

    The building block of the vocab-sized stemming fold
    (:func:`bm25s_spark.indexer.stem_tf`): stemming is deterministic per
    token type, so it never needs to run per occurrence — this UDF is
    applied to the distinct-term table (vocab-sized), not the corpus.
    Same lazy-instantiation + memoization contract as the tokenizer UDF
    (``stemmer`` is a picklable spec; the stemmer object is created per
    executor task); ``""`` maps to ``""`` (the empty-fallback token)."""
    spec = stemmer

    def stem_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        stem_fn = load_stemmer(spec)
        if stem_fn is None:
            raise ValueError("make_stem_udf requires a stemmer spec")
        cache: dict[str, str] = {"": ""}
        for series in batches:
            toks = series.fillna("").tolist()
            missing = [t for t in set(toks) if t not in cache]
            if missing:
                for tok, st in zip(missing, stem_fn(missing)):
                    cache[tok] = st
            yield pd.Series([cache[t] for t in toks], index=series.index)

    return F.pandas_udf(stem_iter, StringType())


def make_hf_tokenizer_udf(tokenizer_loader: Callable[[], object],
                          add_special_tokens: bool = False):
    """Bridge a Hugging Face tokenizer into the pipeline as a pandas UDF
    (the reference's ``batch_tokenize``, ``reference/bm25s/hf.py:187-203``,
    which runs any HF tokenizer over the corpus and keeps the token
    *strings*).

    ``tokenizer_loader`` is a zero-arg picklable callable that returns
    the tokenizer **on the executor** — HF tokenizer objects (Rust
    handles) are not reliably picklable, the same constraint the stemmer
    has; a loader like ``lambda: AutoTokenizer.from_pretrained(...)``
    (or the ``tokenizers.Tokenizer.from_file`` twin) runs once per task.
    The returned object may speak either HF interface:

    - ``tokenizers.Tokenizer``: ``encode_batch(texts)`` → encodings with
      ``.tokens``
    - ``transformers`` tokenizer: batch ``__call__`` → a BatchEncoding
      whose ``[i].tokens`` gives the token strings (exactly the
      reference's extraction).

    Output is ``array<string>`` — feed it to ``indexer.
    build_index_from_tokens`` (corpus side) and pass the tokenized
    array column as the query text (``retrieval.tokenize_queries``
    accepts arrays verbatim), so both sides use the same subword vocab.
    """

    def hf_tokenize_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        tok = tokenizer_loader()
        encode_batch = getattr(tok, "encode_batch", None)

        def tokens_of(texts: list[str]) -> list[list[str]]:
            if encode_batch is not None:
                encs = encode_batch(texts)
                return [list(e.tokens) for e in encs]
            out = tok(
                texts,
                return_attention_mask=False,
                return_token_type_ids=False,
                add_special_tokens=add_special_tokens,
                max_length=None,
            )
            return [list(out[i].tokens) for i in range(len(texts))]

        for series in batches:
            texts = series.fillna("").tolist()
            yield pd.Series(tokens_of(texts), index=series.index)

    return F.pandas_udf(hf_tokenize_iter, ArrayType(StringType()))


def tokenize_hf(df: DataFrame, tokenizer_loader: Callable[[], object],
                text_col: str = "text", out_col: str = "tokens",
                add_special_tokens: bool = False) -> DataFrame:
    """Append an HF-tokenized ``tokens`` column (bridge convenience)."""
    udf = make_hf_tokenizer_udf(tokenizer_loader, add_special_tokens)
    return df.withColumn(out_col, udf(F.col(text_col)))


def tokens_to_terms(df: DataFrame, doc_id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """Explode tokens to one row per occurrence: (doc_id, term)."""
    return df.select(doc_id_col, F.explode_outer(tokens_col).alias("term")).where(
        F.col("term").isNotNull()
    )
