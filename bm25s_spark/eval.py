"""BEIR-style retrieval evaluation (driver-side, on collected top-k).

The reference evaluates with pytrec_eval over dict-shaped results
(``reference/bm25s/utils/beir.py:334-401``).  We keep the same
result/qrels shapes but compute NDCG@k / Recall@k / Precision@k / MAP@k
in plain NumPy (pytrec_eval isn't needed for these standard metrics).
Inputs are DataFrames; only ≤k rows per query are ever collected.

**This module collects the run to the driver** — it is the small-batch
/ pytest twin.  For large runs (≳10k queries) use
:func:`bm25s_spark.operators.evaldf.evaluate_per_query` /
``evaluate_macro``: the same metrics computed relationally, nothing
collected, gate-checked against this implementation.
"""

from __future__ import annotations

import math
import warnings
from collections import defaultdict

from pyspark.sql import DataFrame

# above this many distinct run queries the collect-based evaluator emits
# a UserWarning pointing at the distributed twin
_DRIVER_SIDE_QUERY_SOFT_LIMIT = 10_000


def _collect_runs(results_df: DataFrame) -> dict[str, list[tuple[int, float]]]:
    runs: dict[str, list] = defaultdict(list)
    for r in results_df.collect():
        runs[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
    return {
        q: [(doc, score) for _, doc, score in sorted(rows)]
        for q, rows in runs.items()
    }


def _collect_qrels(qrels_df: DataFrame) -> dict[str, dict[int, int]]:
    qrels: dict[str, dict[int, int]] = defaultdict(dict)
    for r in qrels_df.collect():
        qrels[r["query_id"]][r["doc_id"]] = int(r["score"])
    return qrels


def evaluate(results_df: DataFrame, qrels_df: DataFrame,
             k_values: tuple[int, ...] = (1, 5, 10)) -> dict[str, float]:
    """results: (query_id, rank, doc_id, score); qrels: (query_id,
    doc_id, score).  Returns {"ndcg@k": …, "recall@k": …, "p@k": …,
    "map@k": …} averaged over queries with ≥1 relevant doc.

    Driver-side: the whole run is collected.  Past ~10k queries a
    UserWarning points at ``operators.evaldf.evaluate_per_query``, the
    distributed twin that collects nothing."""
    runs = _collect_runs(results_df)
    qrels = _collect_qrels(qrels_df)
    if len(runs) > _DRIVER_SIDE_QUERY_SOFT_LIMIT:
        warnings.warn(
            f"evaluate() collected {len(runs)} queries to the driver; "
            "for runs this large use bm25s_spark.operators.evaldf."
            "evaluate_per_query / evaluate_macro (distributed, nothing "
            "collected)",
            UserWarning,
            stacklevel=2,
        )
    out: dict[str, float] = {}
    # pytrec_eval (the reference's evaluator) counts only rel>0 judgments
    # toward num_rel and skips queries with no positive judgment — qrels
    # files may carry explicit 0-graded rows
    qids = [q for q in qrels if any(g > 0 for g in qrels[q].values())]
    if not qids:
        out = {f"{m}@{k}": 0.0 for k in k_values for m in ("ndcg", "recall", "p", "map")}
        out["mrr"] = 0.0
        return out
    # MRR (pytrec_eval recip_rank): rank of the first positive hit over
    # the full run, not truncated per k
    mrr_s = []
    for q in qids:
        rel = qrels[q]
        rr = 0.0
        for i, (d, _) in enumerate(runs.get(q, [])):
            if rel.get(d, 0) > 0:
                rr = 1.0 / (i + 1)
                break
        mrr_s.append(rr)
    out["mrr"] = round(sum(mrr_s) / len(qids), 5)
    for k in k_values:
        ndcg_s, rec_s, p_s, map_s = [], [], [], []
        for q in qids:
            rel = qrels[q]
            n_rel = sum(1 for g in rel.values() if g > 0)
            ranked = [doc for doc, _ in runs.get(q, [])][:k]
            gains = [rel.get(d, 0) for d in ranked]
            dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains))
            ideal = sorted(rel.values(), reverse=True)[:k]
            idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
            ndcg_s.append(dcg / idcg if idcg > 0 else 0.0)
            hits = sum(1 for d in ranked if rel.get(d, 0) > 0)
            rec_s.append(hits / n_rel)
            p_s.append(hits / k)
            ap, seen = 0.0, 0
            for i, d in enumerate(ranked):
                if rel.get(d, 0) > 0:
                    seen += 1
                    ap += seen / (i + 1)
            # trec_eval/pytrec_eval map_cut_k divides by the FULL relevant
            # count, not min(n_rel, k)
            map_s.append(ap / n_rel)
        n = len(qids)
        out[f"ndcg@{k}"] = round(sum(ndcg_s) / n, 5)
        out[f"recall@{k}"] = round(sum(rec_s) / n, 5)
        out[f"p@{k}"] = round(sum(p_s) / n, 5)
        out[f"map@{k}"] = round(sum(map_s) / n, 5)
    return out
