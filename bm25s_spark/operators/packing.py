"""Distributed sequence packing: assign documents to fixed-token-budget
training sequences (bins) deterministically.

LLM training consumes fixed-length sequences; packing multiple short
documents per sequence instead of padding recovers most of the wasted
context window.  Exact bin packing is NP-hard and *global* greedy
packing is inherently order-sequential — a single stream over 100 TB
would serialize the whole corpus through one worker.  The distributed
design used here:

1. hash-partition documents into ``n_groups`` independent packing
   streams with the same content-stable keyed-md5 bucket as
   :mod:`~bm25s_spark.operators.sampling` (stable under repartitioning
   and re-processing, reproducible on any engine);
2. greedy first-fit-in-id-order *within* each group — one
   ``applyInPandas`` group per stream, a linear scan over that group's
   ``(doc_id, n_tokens)`` metadata only;
3. join payloads (text/token arrays) back by ``doc_id`` afterwards.

Only id + length metadata flows through the packer, so the one shuffle
is tiny regardless of document size.  Per-group greedy loses a little
fill versus global greedy, but the loss vanishes when each group's
token mass ≫ ``max_tokens`` (size ``n_groups`` ≈ corpus_tokens /
(bins_per_group_target · max_tokens); thousands of groups keep every
executor busy at 100 TB while each group still packs thousands of
bins).  The assignment is fully deterministic — same corpus, same
parameters → bit-identical packing on any cluster layout, which the
DuckDB correctness oracle replays via a recursive CTE.

Reference scope: the reference engine has no training-data operators;
this implements the beyond-reference pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bm25s_spark.functions.text import _ws_tokens
from bm25s_spark.operators.sampling import hash_bucket



def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    *,
    n_tokens_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_groups: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """Assign each document to a ``(group, seq)`` training sequence.

    Greedy rule within a group, scanning in ascending ``id_col`` order:
    a document joins the current sequence unless that would push the
    sequence past ``max_tokens``, in which case it starts the next one.
    A single document longer than ``max_tokens`` occupies a sequence
    alone (callers chunk long documents first — see
    :func:`~bm25s_spark.operators.chunking.chunk_documents`).

    ``n_tokens_col`` names a precomputed length column; otherwise
    whitespace tokens of ``text_col`` are counted.  Returns one row per
    document: ``(group, seq, pos, doc_id, n_tokens, seq_tokens)`` where
    ``pos`` is the document's 0-based position inside its sequence and
    ``seq_tokens`` the sequence's total token count (its fill level).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")

    n_tok = (
        F.col(n_tokens_col).cast("int")
        if n_tokens_col
        else F.size(_ws_tokens(F.col(text_col)))
    )
    # null text / null length → 0 tokens: a null would reach the greedy
    # loop as NaN, and NaN comparisons silently disable the budget check
    # for the rest of the group
    n_tok = F.coalesce(n_tok, F.lit(0))
    meta = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        hash_bucket(id_col, seed=seed, buckets=n_groups).cast("int").alias("group"),
    )
    # carry the caller's id type through the Arrow boundary (string,
    # int, … all hash-bucket fine; a hardcoded long would crash the
    # executor at serialization for non-bigint ids)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"group int, seq int, pos int, doc_id {id_type}, "
        "n_tokens int, seq_tokens int"
    )

    cap = int(max_tokens)

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)
        n = pdf["n_tokens"].to_numpy()
        seq = np.empty(len(n), dtype=np.int32)
        pos = np.empty(len(n), dtype=np.int32)
        s = p = acc = 0
        for i, t in enumerate(n.tolist()):
            if acc > 0 and acc + t > cap:
                s += 1
                acc = p = 0
            seq[i] = s
            pos[i] = p
            acc += t
            p += 1
        totals = pd.Series(n).groupby(seq).transform("sum").to_numpy()
        return pd.DataFrame(
            {
                "group": pdf["group"],
                "seq": seq,
                "pos": pos,
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "seq_tokens": totals.astype(np.int32),
            }
        )

    # one shuffle keyed by group; each stream packs in a single task.
    # applyInPandas (not mapInPandas) so a group is never split across
    # Arrow batches — the greedy scan needs the whole stream at once
    return meta.groupBy("group").applyInPandas(pack_group, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One row per ``(group, seq)``: document count, token total, and
    ``fill_frac`` — the fraction of the ``max_tokens`` budget used.
    Aggregate of the packing output; a single partial-agg shuffle."""
    return packed.groupBy("group", "seq").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("int").alias("tokens"),
        (F.sum("n_tokens") / F.lit(float(max_tokens))).alias("fill_frac"),
    )
