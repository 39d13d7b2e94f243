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
