"""HF-tokenizer bridge (reference/bm25s/hf.py:187-203 batch_tokenize
analog): both HF interfaces (tokenizers.encode_batch / transformers
batch-call) drive the pandas-UDF bridge, and the bridged tokens flow
through the pretokenized build + array-query retrieval end to end.

The HF libraries are not installed here, so the fakes implement the
exact interface surface the bridge consumes (``encode_batch(texts) →
[enc.tokens]`` / ``tok(texts, **kw)[i].tokens``) with a deterministic
wordpiece-style rule; the loader-callable pattern (construct on the
executor, never pickle the tokenizer object) is the part that matters
for Spark and is exercised for real.  Loaders are built as closures so
cloudpickle ships them by value — the executor never imports this test
module, exactly how a user would ship ``lambda:
AutoTokenizer.from_pretrained(...)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25s_spark.indexer import build_index_from_tokens
from bm25s_spark.tokenization import make_hf_tokenizer_udf, tokenize_hf
from bm25s_spark.transcripts import transcripts_df


def _wordpiece(text: str) -> list[str]:
    """Deterministic wordpiece-ish rule: lowercase, whitespace split,
    words >4 chars continue as ##-prefixed 4-char pieces.  (Driver-side
    expected-value twin of the rule baked into the loaders below.)"""
    out = []
    for w in text.lower().split():
        w = "".join(c for c in w if c.isalnum())
        if not w:
            continue
        out.append(w[:4])
        for i in range(4, len(w), 4):
            out.append("##" + w[i:i + 4])
    return out


def make_tokenizers_style_loader():
    """tokenizers.Tokenizer-shaped fake: encode_batch → [enc.tokens]."""

    def loader():
        def pieces(text):
            out = []
            for w in text.lower().split():
                w = "".join(c for c in w if c.isalnum())
                if not w:
                    continue
                out.append(w[:4])
                for i in range(4, len(w), 4):
                    out.append("##" + w[i:i + 4])
            return out

        class Enc:
            def __init__(self, toks):
                self.tokens = toks

        class Fake:
            def encode_batch(self, texts):
                return [Enc(pieces(t)) for t in texts]

        return Fake()

    return loader


def make_transformers_style_loader():
    """transformers-tokenizer-shaped fake: batch __call__ → BatchEncoding
    whose [i].tokens gives the strings (the reference's extraction,
    reference/bm25s/hf.py:188-201)."""

    def loader():
        def pieces(text):
            out = []
            for w in text.lower().split():
                w = "".join(c for c in w if c.isalnum())
                if not w:
                    continue
                out.append(w[:4])
                for i in range(4, len(w), 4):
                    out.append("##" + w[i:i + 4])
            return out

        class Item:
            def __init__(self, toks):
                self.tokens = toks

        class Batch:
            def __init__(self, items):
                self._items = items

            def __getitem__(self, i):
                return self._items[i]

        class Fake:
            def __call__(self, texts, return_attention_mask=None,
                         return_token_type_ids=None,
                         add_special_tokens=None, max_length=None):
                assert return_attention_mask is False
                assert return_token_type_ids is False
                return Batch([Item(pieces(t)) for t in texts])

        return Fake()

    return loader


def test_bridge_matches_rule_both_interfaces(spark):
    rows = [("a", "Distributed tokenization pipelines"),
            ("b", "bm25 scoring"), ("c", "")]
    df = spark.createDataFrame(rows, "id string, text string")
    expected = {r[0]: _wordpiece(r[1]) for r in rows}
    for name, loader in (("tokenizers", make_tokenizers_style_loader()),
                         ("transformers", make_transformers_style_loader())):
        got = {
            r["id"]: r["tokens"]
            for r in tokenize_hf(df, loader).select("id", "tokens").collect()
        }
        assert got == expected, name
    # null text behaves like empty (fillna in the bridge)
    ndf = spark.createDataFrame([("n", None)], "id string, text string")
    udf = make_hf_tokenizer_udf(make_tokenizers_style_loader())
    assert ndf.select(udf(F.col("text")).alias("t")).collect()[0]["t"] == []


def test_bridge_end_to_end_subword_retrieval(spark):
    """Corpus + queries through the same HF bridge → pretokenized build
    → array-query retrieve: subword vocab round-trips and the query's
    source turn ranks first."""
    loader = make_tokenizers_style_loader()
    tdf = transcripts_df(spark, "t2", seed=75).persist()
    toks = tokenize_hf(tdf, loader)
    idx = build_index_from_tokens(toks, order_cols=["conv_id", "turn_idx"])

    # subword pieces made it into the vocabulary
    assert idx.term_stats.where(F.col("term").startswith("##")).count() > 0

    probe = tdf.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    qdf = tokenize_hf(
        spark.createDataFrame([("q0", probe["text"])],
                              "query_id string, text string"),
        loader,
    ).select("query_id", F.col("tokens").alias("text"))
    top = idx.retrieve(qdf, k=3).orderBy("rank").collect()
    top_doc = idx.doc_map.where(F.col("doc_id") == top[0]["doc_id"]).collect()[0]
    assert (top_doc["conv_id"], top_doc["turn_idx"]) == (
        probe["conv_id"], probe["turn_idx"])
