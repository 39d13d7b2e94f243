"""Deterministic synthetic transcript corpora (FIXTURES.md).

Input shape (BASELINE.json ``input_hint``):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` — one document per turn; doc order = (conv_id, turn_idx).

Everything is seeded (seed=42) and generated driver-side as plain Python
lists at test scales, or distributively via ``spark.range`` arithmetic at
bench scales — no external data, no randomness at execution time.
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "calc", "browse"]
_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

# the reference's golden 4-doc animal corpus
# (reference/tests/core/test_retrieve.py:16-21)
ANIMAL_CORPUS = [
    "a cat is a feline and likes to purr",
    "a dog is the human's best friend and loves to play",
    "a bird is a beautiful animal that can fly",
    "a fish is a creature that lives in water and swims",
]

# base vocabulary for the t2/bench corpora: content words + inflected
# families (stemming exercise) + stopwords injected at draw time
_CONTENT_WORDS = [
    "spark", "shuffle", "partition", "executor", "driver", "catalyst",
    "tungsten", "arrow", "parquet", "iceberg", "snapshot", "manifest",
    "lineage", "checkpoint", "token", "index", "posting", "impact",
    "score", "query", "retrieval", "ranking", "corpus", "document",
    "transcript", "conversation", "agent", "assistant", "search",
    "browse", "compute", "memory", "cluster", "scale", "throughput",
    "latency", "batch", "stream", "window", "join", "merge", "sort",
    "hash", "filter", "project", "aggregate", "broadcast", "salt",
    "skew", "block", "delta", "gap", "encode", "compress", "vocab",
    "term", "frequency", "inverse", "weight", "mask", "run", "running",
    "runs", "runner", "play", "playing", "played", "player", "swim",
    "swimming", "swims", "connect", "connection", "connected",
    "connects", "optimize", "optimizer", "optimized", "optimizing",
]
_STOPWORD_DRAWS = [
    "the", "a", "an", "and", "is", "are", "of", "to", "in", "on", "for",
    "with", "that", "this", "it", "as", "by", "was", "will",
]
HEAD_TERM = "telemetry"  # appears in ~50% of docs — the skew fixture

_NON_ASCII = [
    "שלום עולם מבחן",          # Hebrew (mirrors reference/tests/core/test_save_load.py:23-33)
    "你好 世界 测试 文档",      # Chinese
    "привет мир тест документ",  # Russian
    "merhaba dünya test belgesi",  # Turkish
]


def _make_rows(n_convs: int, turns_per_conv: int, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    g = 0
    for ci in range(n_convs):
        conv_id = f"conv-{ci:06d}"
        for ti in range(turns_per_conv):
            role = ROLES[g % 3]
            tool = TOOLS[g % 3] if role == "tool" else ""
            n_tok = rng.randint(5, 40)
            words = []
            for _ in range(n_tok):
                if rng.random() < 0.30:
                    words.append(rng.choice(_STOPWORD_DRAWS))
                else:
                    # Zipf-ish: prefer low indices
                    idx = min(
                        int(rng.paretovariate(1.3)) - 1, len(_CONTENT_WORDS) - 1
                    )
                    words.append(_CONTENT_WORDS[idx])
            if rng.random() < 0.5:
                words.insert(rng.randrange(len(words) + 1), HEAD_TERM)
            text = " ".join(words)
            rows.append((conv_id, ti, role, text, tool, _EPOCH + _dt.timedelta(seconds=60 * g)))
            g += 1
    # special fixtures replace the first turns of the last convs
    specials = [
        "the a an and of to",          # all stopwords → empty token list
        "",                             # empty string
        "a b c",                        # single-char tokens → dropped by regex
        *_NON_ASCII,
    ]
    for i, text in enumerate(specials):
        if i < len(rows):
            conv_id, ti, role, _, tool, ts = rows[-(i + 1)]
            rows[-(i + 1)] = (conv_id, ti, role, text, tool, ts)
    return rows


def transcripts_df(spark: SparkSession, scale: str = "t2", seed: int = 42) -> DataFrame:
    """Build the synthetic transcripts table at a named scale.

    t1: the 4-doc golden animal corpus; t2: 200 convs × 10 turns;
    bench: 10,000 convs × 20 turns (generated distributively).
    """
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    if scale == "t1":
        rows = [
            (f"conv-{i:06d}", 0, ROLES[i % 3],
             ANIMAL_CORPUS[i], "", _EPOCH + _dt.timedelta(seconds=60 * i))
            for i in range(4)
        ]
        return spark.createDataFrame(rows, schema)
    if scale == "t2":
        return spark.createDataFrame(_make_rows(200, 10, seed), schema)
    if scale == "bench":
        return distributed_transcripts(spark, n_convs=10_000, turns_per_conv=20)
    raise ValueError(f"unknown scale {scale!r}")


def distributed_transcripts(
    spark: SparkSession, n_convs: int, turns_per_conv: int
) -> DataFrame:
    """Generate a transcript corpus of arbitrary size with pure column
    arithmetic (no driver-side materialization, deterministic, no RNG at
    execution time) — the pattern that scales to any row count."""
    n = n_convs * turns_per_conv
    words = F.array(*[F.lit(w) for w in _CONTENT_WORDS])
    stop = F.array(*[F.lit(w) for w in _STOPWORD_DRAWS])
    df = spark.range(n).select(
        F.format_string("conv-%06d", (F.col("id") / turns_per_conv).cast("long")).alias("conv_id"),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.col("id") % 3 + 1).cast("int")).alias("role"),
        F.col("id"),
    )
    # deterministic pseudo-random word picks via hash mixing; 5–40 words
    n_tok = F.abs(F.hash(F.col("id"), F.lit(7))) % 36 + 5
    idxs = F.sequence(F.lit(0), n_tok - 1)
    word_at = F.transform(
        idxs,
        lambda i: F.when(
            F.abs(F.hash(F.col("id"), i, F.lit(11))) % 100 < 30,
            F.element_at(stop, (F.abs(F.hash(F.col("id"), i, F.lit(13))) % len(_STOPWORD_DRAWS) + 1).cast("int")),
        ).otherwise(
            # Zipf-ish skew: square the uniform draw to prefer low indices
            F.element_at(
                words,
                (
                    F.pow(
                        (F.abs(F.hash(F.col("id"), i, F.lit(17))) % 1000) / 1000.0, F.lit(2.0)
                    ) * len(_CONTENT_WORDS)
                ).cast("int") + 1,
            )
        ),
    )
    with_head = F.when(
        F.abs(F.hash(F.col("id"), F.lit(23))) % 2 == 0,
        F.concat(F.array(F.lit(HEAD_TERM)), word_at),
    ).otherwise(word_at)
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.array_join(with_head, " ").alias("text"),
        F.when(F.col("role") == "tool", F.lit("search")).otherwise(F.lit("")).alias("tool"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("id") * 60)).alias("ts"),
    )


def queries_for(corpus_texts: list[str], n_queries: int, seed: int = 43) -> list[tuple[str, str]]:
    """Reference-style query mix (FIXTURES.md §2): 70% spans sampled from
    docs, 10% with injected OOV, 5% all-stopword, 5% empty, 10% rare term."""
    rng = random.Random(seed)
    out = []
    nonempty = [t for t in corpus_texts if t.strip()]
    for i in range(n_queries):
        qid = f"q-{i:04d}"
        r = rng.random()
        if r < 0.70:
            doc = rng.choice(nonempty)
            words = doc.split()
            span = rng.randint(3, min(12, max(3, len(words))))
            start = rng.randrange(max(1, len(words) - span + 1))
            text = " ".join(words[start:start + span])
        elif r < 0.80:
            doc = rng.choice(nonempty)
            text = " ".join(doc.split()[:5]) + " zzqx"
        elif r < 0.85:
            text = "the and of to a"
        elif r < 0.90:
            text = ""
        else:
            doc = rng.choice(nonempty)
            words = [w for w in doc.split() if len(w) > 2]
            text = rng.choice(words) if words else "spark"
        out.append((qid, text))
    return out


def conversation_rollup(
    turns_df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """Turns → one row per conversation: the turn texts joined in
    ``turn_idx`` order plus per-role turn counts and size stats — the
    doc-granularity flip a transcript pipeline needs when indexing whole
    conversations instead of turns.

    ``collect_list`` order is NOT deterministic under parallel
    aggregation, so turns are collected as (turn_idx, text) structs and
    ``sort_array``-ed before joining — the plan stays a single hash
    aggregation on ``conv_col`` (one shuffle; conversations bound the
    group size the way shards bound postings).
    """
    pair = F.struct(F.col(turn_col).alias("i"), F.col(text_col).alias("t"))
    return turns_df.groupBy(conv_col).agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list(pair)), lambda s: s["t"]),
            " ",
        ).alias("conv_text"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col(role_col) == "user").cast("int")).alias("n_user_turns"),
        F.sum((F.col(role_col) == "assistant").cast("int")).alias("n_assistant_turns"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.min(turn_col).alias("first_turn"),
        F.max(turn_col).alias("last_turn"),
    )


def speaker_stats(
    turns_df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-(conversation, role) turn-taking analytics → one row per
    (``conv_col``, ``role_col``): turn count, token volume, and response
    latency — the speaker-level report a transcript pipeline runs before
    deciding per-role sampling weights or turn-granularity filters.

    Columns:

    - ``n_turns`` / ``n_tokens`` / ``avg_tokens`` — volume per speaker;
      tokens are ``\\w\\w+`` matches of the lowercased text (the engine
      tokenizer's pattern, pre-stopword), counted JVM-side.
    - ``n_responses`` — turns whose previous turn (in ``turn_col`` order
      within the conversation) exists and has a DIFFERENT role, i.e.
      actual replies rather than consecutive same-speaker turns.
    - ``sum_response_us`` — total reply latency in exact integer
      microseconds (the ``session_summary`` convention: float seconds
      land on round-half boundaries engines resolve differently).
    - ``avg_response_sec`` — ``sum_response_us / n_responses / 1e6``
      rounded to 6; NULL for speakers that never reply.

    Scale shape: one hash shuffle on ``conv_col`` for the lag window
    (per-conversation work is a sequential prefix scan — the same skew
    bound as sessionization), then a map-side-combinable aggregation on
    (``conv_col``, ``role_col``).  No Python in the plan, nothing
    driver-side.  ``turn_col`` is assumed unique per conversation (the
    input-hint contract), so the window order is total and the lag is
    deterministic.
    """
    from bm25s_spark.operators.events import _ts_micros

    from pyspark.sql import Window

    ts_us = _ts_micros(turns_df, ts_col)
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    n_tok = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w\w+"), F.lit(0))
    )
    prev_role = F.lag(F.col(role_col)).over(w)
    prev_us = F.lag(ts_us).over(w)
    is_resp = prev_role.isNotNull() & (prev_role != F.col(role_col))
    lagged = turns_df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("role"),
        n_tok.cast("long").alias("_nt"),
        is_resp.cast("int").alias("_ir"),
        F.when(is_resp, ts_us - prev_us).alias("_rus"),
    )
    return lagged.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.round(F.sum("_nt") / F.count(F.lit(1)), 6).alias("avg_tokens"),
        F.sum("_ir").cast("long").alias("n_responses"),
        F.coalesce(F.sum("_rus"), F.lit(0)).cast("long").alias("sum_response_us"),
        F.when(
            F.sum("_ir") > 0,
            F.round(F.sum("_rus") / F.sum("_ir") / F.lit(1000000.0), 6),
        ).alias("avg_response_sec"),
    )
