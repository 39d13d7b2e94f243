"""Maximal Marginal Relevance (MMR) result diversification.

Carbonell & Goldstein (SIGIR 1998): re-rank a retrieved candidate pool
so each next pick maximizes ``λ·relevance − (1−λ)·max-similarity-to-
already-picked`` — the standard answer to "my top-k are five copies of
the same document" after a near-dup-heavy retrieval, and the classic
final stage of a RAG passage selector.  The reference engine has no
diversification surface (flat score arrays only); this composes with
any of its retrieval outputs plus an embedding column.

Determinism contract (the cross-engine gate relies on it): every
pairwise cosine is rounded to ``round_to`` decimals BEFORE the max, the
objective is rounded again before the argmax, and ties break
doc-id-ascending — so engines whose float sums differ below the
rounding granularity still select identical sequences.

Scale shape: the candidate pool is queries × pool-size rows (tiny);
it broadcasts into ONE inner join against the corpus-sized embedding
table, and the O(pool² · dim) selection loop runs vectorized inside
``applyInPandas`` — per-query state never leaves its task, queries
distribute freely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StructField, StructType,
)


def mmr_rerank(
    results: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    round_to: int = 4,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR over each query's candidate pool → (query_id, rank,
    <id_col>, relevance, mmr_score).

    ``results``: retrieval output carrying (query, id, relevance score)
    — the pool to diversify (pass more than ``k`` candidates, e.g. the
    top 3–5k of a first-stage retrieval).  ``embeddings``: (id, vector).
    Candidates without an embedding row are dropped (they cannot be
    compared); queries with fewer than ``k`` surviving candidates return
    what they have.  ``lam=1`` reproduces pure relevance order; ``lam=0``
    maximizes pure diversity after the first pick.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    q_field = results.schema[query_id_col]
    id_field = results.schema[id_col]
    cand = (
        F.broadcast(
            results.select(
                F.col(query_id_col).alias("_qid"),
                F.col(id_col).alias("_did"),
                F.col(score_col).cast("double").alias("_rel"),
            )
        )
        .join(
            embeddings.select(
                F.col(id_col).alias("_did"), F.col(vec_col).alias("_vec")
            ),
            "_did",
        )
    )
    out_schema = StructType([
        StructField(query_id_col, q_field.dataType),
        StructField("rank", IntegerType()),
        StructField(id_col, id_field.dataType),
        StructField("relevance", DoubleType()),
        StructField("mmr_score", DoubleType()),
    ])
    k_, lam_, rt = int(k), float(lam), int(round_to)

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_did").reset_index(drop=True)
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        # full pairwise cosine, rounded once — the selection loop only
        # ever reads rounded values (the determinism contract)
        sims = np.round(unit @ unit.T, rt)
        rel = pdf["_rel"].to_numpy(dtype=np.float64)
        dids = pdf["_did"].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        obj_at_pick: list[float] = []
        remaining = np.ones(n, dtype=bool)
        maxsim = np.full(n, -np.inf)
        for _ in range(min(k_, n)):
            if picked:
                obj = np.round(lam_ * rel - (1.0 - lam_) * maxsim, rt)
            else:
                obj = np.round(lam_ * rel, rt)
            obj_masked = np.where(remaining, obj, -np.inf)
            # argmax with doc-id-ascending ties: rows are sorted by _did,
            # and argmax returns the first maximal index
            i = int(np.argmax(obj_masked))
            picked.append(i)
            obj_at_pick.append(float(obj_masked[i]))
            remaining[i] = False
            maxsim = np.maximum(maxsim, sims[:, i])
        return pd.DataFrame({
            query_id_col: [pdf["_qid"].iloc[0]] * len(picked),
            "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            id_col: dids[picked],
            "relevance": rel[picked],
            "mmr_score": obj_at_pick,
        })

    return cand.groupBy("_qid").applyInPandas(pick, out_schema)
