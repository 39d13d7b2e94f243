"""Property-based checks against pure-Python oracles — robustness
coverage for inputs no fixture enumerates: hypothesis drives the pure
stemmer functions (cheap, thousands of examples), while the Spark-backed
operators (sessionize, duplicate_components) get seed-looped random
inputs instead: hypothesis's generate-and-shrink loop multiplies Spark
jobs against the suite's long-lived 8 GB JVM and was observed tipping it
into heap exhaustion late in a full run; fixed seeds give equivalent
randomized coverage at a bounded, deterministic job count."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from bm25s_spark.stemmer import stem, stem_french, stem_german, stem_spanish


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark


words = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzäöüßâàëéêèïîôûùçáíóúñü'",
    min_size=0, max_size=18,
)


@given(words)
@settings(max_examples=300, deadline=None)
def test_stemmers_total_and_deterministic(w):
    """All vendored stemmers accept any lowercase-ish token without
    raising, return a str bounded by input + appended chars (Porter2
    may append 'e'; German expands each ß to ss; French may rewrite
    ic→iqU, +1), and are deterministic."""
    for fn in (stem, stem_german, stem_french, stem_spanish):
        out = fn(w)
        assert isinstance(out, str)
        assert len(out) <= len(w) + w.count("ß") + 1
        assert fn(w) == out


@given(words)
@settings(max_examples=200, deadline=None)
def test_german_stemmer_output_is_umlaut_free(w):
    out = stem_german(w)
    assert not set(out) & set("äöüß"), (w, out)


def _sessionize_oracle(rows, gap_minutes):
    """Brute-force per-user session assignment (sorted scan)."""
    by_user: dict = {}
    for eid, ts, uid in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        idx = 0
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() * 1_000_000 > gap_minutes * 60_000_000:
                idx += 1
            out[eid] = (uid, idx)
            prev = ts
    return out



def _random_events(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 30))
    users = rng.integers(0, 4, size=n)
    offs = rng.choice(5000, size=n, replace=False)
    return [(i, int(u), int(o)) for i, (u, o) in enumerate(zip(users, offs))]


def test_sessionize_matches_bruteforce(spark):
    from bm25s_spark.operators.events import sessionize

    t0 = dt.datetime(2026, 1, 1)
    for seed in range(5):
        gap = 1 + seed * 4
        ev = _random_events(seed)
        rows = [
            (eid, t0 + dt.timedelta(seconds=off), uid) for eid, uid, off in ev
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long"
        )
        got = {
            r["event_id"]: (r["user_id"], r["session_idx"])
            for r in sessionize(df, gap_minutes=gap).collect()
        }
        assert got == _sessionize_oracle(rows, gap), seed


def _components_oracle(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find(spark):
    import numpy as np

    from bm25s_spark.operators.dedup import duplicate_components

    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        n_edges = int(rng.integers(1, 18))
        edges = []
        while len(edges) < n_edges:
            a, b = int(rng.integers(0, 13)), int(rng.integers(0, 13))
            if a != b:
                edges.append((a, b))
        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["component"]
            for r in duplicate_components(pairs).collect()
        }
        assert got == _components_oracle(edges), (seed, edges)


def test_sqlstem_build_matches_pandas_randomized(spark):
    """Seed-looped randomized corpora (empty docs, stopword-only docs,
    ordinary Unicode, morphological suffixes, empty_fallback on/off):
    the sqlstem build (JVM surface scan + indexer.stem_tf vocab fold)
    must equal the pandas-stemmer build exactly — postings (term,
    doc_id, tf, dl) and term_stats (term, df)."""
    import random

    from bm25s_spark.indexer import build_index

    stems_pool = ["run", "connect", "caress", "walk", "über", "café",
                  "pony", "fli", "happi", "gener"]
    sufs = ["", "s", "ed", "ing", "er", "ers", "ation", "ly", "ness"]
    stop = ["the", "a", "and", "of", "to", "is", "it"]
    for seed in range(3):
        rng = random.Random(400 + seed)
        docs = []
        for i in range(40):
            r = rng.random()
            if r < 0.08:
                text = ""                       # empty doc
            elif r < 0.16:
                text = " ".join(rng.choices(stop, k=rng.randint(1, 4)))
            else:
                text = " ".join(
                    rng.choice(stems_pool) + rng.choice(sufs)
                    if rng.random() > 0.25 else rng.choice(stop)
                    for _ in range(rng.randint(3, 20))
                )
            docs.append((f"c{i:03d}", 0, "user", text))
        tdf = spark.createDataFrame(
            docs, "conv_id string, turn_idx int, role string, text string"
        )
        for fb in (False, True):
            a = build_index(tdf, order_cols=["conv_id", "turn_idx"],
                            stemmer="english", empty_fallback=fb)
            b = build_index(tdf, order_cols=["conv_id", "turn_idx"],
                            stemmer="english", empty_fallback=fb,
                            tokenizer_engine="sql")
            pa = sorted(tuple(r) for r in a.postings.select(
                "term", "doc_id", "tf", "dl").collect())
            pb = sorted(tuple(r) for r in b.postings.select(
                "term", "doc_id", "tf", "dl").collect())
            assert pa == pb, (seed, fb)
            ta = sorted((r.term, r.df) for r in
                        a.term_stats.select("term", "df").collect())
            tb = sorted((r.term, r.df) for r in
                        b.term_stats.select("term", "df").collect())
            assert ta == tb, (seed, fb)
