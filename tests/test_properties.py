"""Property-based checks (hypothesis) against pure-Python oracles —
robustness coverage for inputs no fixture enumerates: arbitrary token
shapes for the stemmers, random event timelines for sessionization,
random graphs for the duplicate-components fixpoint."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from bm25s_spark.stemmer import stem, stem_german


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark


words = st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüß'", min_size=0, max_size=18)


@given(words)
@settings(max_examples=300, deadline=None)
def test_stemmers_total_and_deterministic(w):
    """Both stemmers accept any lowercase-ish token without raising,
    return a str bounded by input + appended chars (Porter2 may append
    'e'; German expands each ß to ss), and are deterministic."""
    for fn in (stem, stem_german):
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


event_sets = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.integers(0, 5000),                   # offset seconds
    ),
    min_size=1,
    max_size=25,
    unique=True,
)


@given(event_sets, st.integers(1, 20))
@settings(max_examples=12, deadline=None)
def test_sessionize_matches_bruteforce(spark_prop, ev, gap):
    from bm25s_spark.operators.events import sessionize

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=off), uid)
        for i, (uid, off) in enumerate(ev)
    ]
    df = spark_prop.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(df, gap_minutes=gap).collect()
    }
    assert got == _sessionize_oracle(rows, gap)


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


graphs = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=20,
)


@given(graphs)
@settings(max_examples=10, deadline=None)
def test_components_match_union_find(spark_prop, edges):
    from bm25s_spark.operators.dedup import duplicate_components

    pairs = spark_prop.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in duplicate_components(pairs).collect()
    }
    assert got == _components_oracle(edges)
