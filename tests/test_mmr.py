"""MMR diversification: brute-force python twin parity, λ edge
behaviors, cluster-escape diversification, missing embeddings, pool
smaller than k, validation."""

from __future__ import annotations

import numpy as np
import pytest

from bm25s_spark.operators.mmr import mmr_rerank


def _brute_mmr(cands, k, lam, rt=4):
    """cands: list of (doc_id, rel, vec). Returns [(doc_id, rank)]."""
    cands = sorted(cands, key=lambda c: c[0])
    vecs = np.array([c[2] for c in cands], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sims = np.round(unit @ unit.T, rt)
    rel = np.array([c[1] for c in cands], dtype=np.float64)
    picked, maxsim = [], np.full(len(cands), -np.inf)
    remaining = set(range(len(cands)))
    for _ in range(min(k, len(cands))):
        best = None
        for i in sorted(remaining):
            o = np.round(lam * rel[i] - (0 if not picked else (1 - lam) * maxsim[i]), rt)
            if best is None or o > best[1]:
                best = (i, o)
        i = best[0]
        picked.append(cands[i][0])
        remaining.discard(i)
        maxsim = np.maximum(maxsim, sims[:, i])
    return picked


def _mk(spark, cands, qid="q1"):
    res = spark.createDataFrame(
        [(qid, d, float(r)) for d, r, _ in cands],
        "query_id string, doc_id long, score double",
    )
    emb = spark.createDataFrame(
        [(d, [float(x) for x in v]) for d, _, v in cands],
        "doc_id long, embedding array<double>",
    )
    return res, emb


CLUSTERED = [
    # cluster A around (1, 0), cluster B around (0, 1)
    (0, 0.95, [1.0, 0.01]),
    (1, 0.94, [0.99, 0.02]),
    (2, 0.93, [1.0, 0.0]),
    (3, 0.80, [0.01, 1.0]),
    (4, 0.79, [0.0, 0.99]),
]


def test_matches_brute_force_random(spark):
    rng = np.random.default_rng(7)
    cands = [
        (i, float(np.round(rng.uniform(0, 1), 4)), rng.standard_normal(8).tolist())
        for i in range(20)
    ]
    res, emb = _mk(spark, cands)
    for lam in (0.3, 0.5, 0.8):
        got = [
            r.doc_id
            for r in mmr_rerank(res, emb, k=10, lam=lam).orderBy("rank").collect()
        ]
        assert got == _brute_mmr(cands, 10, lam), f"lam={lam}"


def test_lambda_one_is_relevance_order(spark):
    res, emb = _mk(spark, CLUSTERED)
    got = [r.doc_id for r in mmr_rerank(res, emb, k=5, lam=1.0).orderBy("rank").collect()]
    assert got == [0, 1, 2, 3, 4]


def test_diversification_escapes_cluster(spark):
    """With lam=0.5 the second pick must jump to cluster B even though
    cluster A holds the next-highest relevances."""
    res, emb = _mk(spark, CLUSTERED)
    got = [r.doc_id for r in mmr_rerank(res, emb, k=3, lam=0.5).orderBy("rank").collect()]
    assert got[0] == 0
    assert got[1] == 3
    assert got == _brute_mmr(CLUSTERED, 3, 0.5)


def test_missing_embedding_dropped_and_short_pool(spark):
    res, emb = _mk(spark, CLUSTERED)
    emb2 = emb.where("doc_id != 1")
    rows = mmr_rerank(res, emb2, k=10, lam=0.5).collect()
    assert len(rows) == 4 and all(r.doc_id != 1 for r in rows)


def test_relevance_and_first_score(spark):
    res, emb = _mk(spark, CLUSTERED)
    rows = {r.rank: r for r in mmr_rerank(res, emb, k=2, lam=0.5).collect()}
    assert rows[1].relevance == pytest.approx(0.95)
    assert rows[1].mmr_score == pytest.approx(round(0.5 * 0.95, 4))


def test_validation(spark):
    res, emb = _mk(spark, CLUSTERED)
    with pytest.raises(ValueError):
        mmr_rerank(res, emb, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(res, emb, k=1, lam=1.5)
