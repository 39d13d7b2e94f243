"""Trending terms: hand-checked window counts, tie + top_n rules,
salted two-phase equivalence, prev-window counts, null timestamps."""

from __future__ import annotations

import datetime as dt
import pytest

from bm25s_spark.operators.trends import trending_terms

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, text string")


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    # hour 0: spark×3, shuffle×2, join×1 ; hour 1: join×3, scan×1
    rows += [(T0 + dt.timedelta(minutes=m), t) for m, t in [
        (1, "spark spark shuffle"), (20, "spark shuffle"), (40, "join data"),
        (61, "join join scan"), (90, "join the of"),
    ]]
    rows.append((None, "ghost ghost ghost"))
    return _mk(spark, rows)


def test_counts_and_ranks(spark, events):
    rows = trending_terms(events, "1 hour", top_n=3, stopwords="en").collect()
    got = {}
    for r in rows:
        got.setdefault(r.window_start, []).append((r.rank, r.term, r.n))
    for w in got:
        got[w].sort()
    assert got[T0] == [(1, "spark", 3), (2, "shuffle", 2), (3, "data", 1)]
    # hour 1: "the"/"of" are stopwords and never count
    assert got[T0 + dt.timedelta(hours=1)] == [(1, "join", 3), (2, "scan", 1)]
    # null-ts row contributed nothing
    assert all("ghost" != t for v in got.values() for _, t, _ in v)


def test_tie_breaks_term_ascending(spark):
    df = _mk(spark, [(T0, "zeta alpha"), (T0, "zeta alpha")])
    rows = sorted(
        trending_terms(df, "1 hour", top_n=2).collect(), key=lambda r: r.rank
    )
    assert [(r.term, r.n) for r in rows] == [("alpha", 2), ("zeta", 2)]


def test_salted_two_phase_matches_single_partition(spark, events):
    """salt_partitions=1 (plain per-window rank) and the default salted
    path must agree exactly."""
    a = sorted(map(tuple, trending_terms(events, "1 hour", top_n=3).collect()))
    b = sorted(map(tuple, trending_terms(
        events, "1 hour", top_n=3, salt_partitions=1
    ).collect()))
    assert a == b


def test_with_previous_counts(spark, events):
    rows = trending_terms(events, "1 hour", top_n=3, with_previous=True).collect()
    got = {(r.window_start, r.term): r.prev_n for r in rows}
    h1 = T0 + dt.timedelta(hours=1)
    assert got[(h1, "join")] == 1      # hour 0 had one "join"
    assert got[(h1, "scan")] == 0      # new arrival
    assert got[(T0, "spark")] == 0     # no window before hour 0


def test_min_count_filter(spark, events):
    rows = trending_terms(events, "1 hour", top_n=5, min_count=2).collect()
    assert {(r.window_start, r.term) for r in rows} == {
        (T0, "spark"), (T0, "shuffle"), (T0 + dt.timedelta(hours=1), "join"),
    }


def test_top_n_validation(spark, events):
    with pytest.raises(ValueError):
        trending_terms(events, top_n=0)
