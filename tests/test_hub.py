"""Hub save/load surface (reference/bm25s/hf.py analog): LocalHubClient
commit/revision semantics, index push/pull round-trip, tokenizer-config
round-trip.  The HfHubClient adapter maps 1:1 onto huggingface_hub (not
installed here); LocalHubClient exercises the identical call contract."""

from __future__ import annotations

import json
import os

import pytest

from bm25s_spark.hub import (
    LocalHubClient,
    can_save_locally,
    is_dir_empty,
    load_index_from_hub,
    load_tokenizer_from_hub,
    save_index_to_hub,
    save_tokenizer_to_hub,
)
from bm25s_spark.indexer import SparkBM25
from bm25s_spark.transcripts import queries_for, transcripts_df


# ---------- pure client semantics (no Spark) ----------

def _write(d, name, content):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        f.write(content)


def test_dir_gates_match_reference_semantics(tmp_path):
    # reference/bm25s/hf.py:205-252
    missing = str(tmp_path / "nope")
    assert is_dir_empty(None) and is_dir_empty(missing)
    assert not can_save_locally(None, overwrite_local=True)
    assert can_save_locally(missing, overwrite_local=False)
    _write(str(tmp_path / "full"), "a.txt", "x")
    assert not can_save_locally(str(tmp_path / "full"), overwrite_local=False)
    assert can_save_locally(str(tmp_path / "full"), overwrite_local=True)


def test_local_hub_commits_and_revisions(tmp_path):
    hub = LocalHubClient(str(tmp_path / "hub"))
    with pytest.raises(ValueError):
        hub.create_repo("no-slash")
    hub.create_repo("alice/idx", private=True)
    info = hub.repo_info("alice/idx")
    assert info["private"] is True and info["refs"]["main"] is None

    stage = str(tmp_path / "stage")
    _write(stage, "f.txt", "v1")
    c1 = hub.upload_folder("alice/idx", stage, "first")
    _write(stage, "f.txt", "v2")
    c2 = hub.upload_folder("alice/idx", stage, "second")
    assert c1 != c2
    assert hub.list_commits("alice/idx") == [c1, c2]
    assert hub.repo_info("alice/idx")["refs"]["main"] == c2

    # identical re-upload dedups: same content-addressed id, no third commit
    c3 = hub.upload_folder("alice/idx", stage, "same again")
    assert c3 == c2 and hub.list_commits("alice/idx") == [c1, c2]

    # revision pinning reads history; default reads main
    with open(os.path.join(hub.snapshot_download("alice/idx", revision=c1), "f.txt")) as f:
        assert f.read() == "v1"
    with open(os.path.join(hub.snapshot_download("alice/idx"), "f.txt")) as f:
        assert f.read() == "v2"
    with pytest.raises(FileNotFoundError):
        hub.snapshot_download("alice/idx", revision="deadbeef")
    with pytest.raises(FileNotFoundError):
        hub.repo_info("alice/missing")

    # snapshot_download(local_dir=...) copies (HfApi behavior)
    dst = str(tmp_path / "dl")
    out = hub.snapshot_download("alice/idx", local_dir=dst)
    assert out == dst and open(os.path.join(dst, "f.txt")).read() == "v2"


def test_tokenizer_config_roundtrip_no_vocab(tmp_path, spark):
    hub = LocalHubClient(str(tmp_path / "hub"))
    kwargs = {"stopwords": "en", "stemmer": None, "empty_fallback": False}
    save_tokenizer_to_hub(hub, "alice/tok", kwargs)
    spec, vocab = load_tokenizer_from_hub(spark, "alice/tok", hub)
    assert spec == kwargs and vocab is None
    # the stored artifact carries the resolved stopword list for audit
    snap = hub.snapshot_download("alice/tok")
    stored = json.load(open(os.path.join(snap, "tokenizer.json")))
    assert "the" in stored["resolved_stopwords"]


# ---------- Spark round-trips ----------

def _normalize(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 4))
        )
    return {q: sorted(v) for q, v in out.items()}


def test_index_hub_roundtrip_with_corpus_and_readme(spark, tmp_path):
    tdf = transcripts_df(spark, "t2", seed=71).persist()
    texts = [r["text"] for r in
             tdf.orderBy("conv_id", "turn_idx").select("text").collect()]
    qdf = spark.createDataFrame(queries_for(texts, 6, seed=3),
                                "query_id string, text string")
    idx = SparkBM25(method="lucene").index(tdf)
    before = _normalize(idx.retrieve(qdf, k=5))

    hub = LocalHubClient(str(tmp_path / "hub"))
    c1 = save_index_to_hub(idx, "alice/bm25-hub1", hub, corpus=tdf,
                           commit_message="v1")
    snap = hub.snapshot_download("alice/bm25-hub1")
    readme = open(os.path.join(snap, "README.md")).read()
    assert f"| num_docs | {idx.num_docs} |" in readme

    loaded = load_index_from_hub(spark, "alice/bm25-hub1", hub,
                                 load_corpus=True)
    assert loaded.num_docs == idx.num_docs
    assert _normalize(loaded.retrieve(qdf, k=5)) == before
    # corpus rode along as executor-written JSONL and loads lazily
    corpus = loaded.corpus
    assert corpus.count() == tdf.count()
    assert set(corpus.columns) >= {"conv_id", "turn_idx", "text"}

    # a second push is a new revision; the first stays loadable
    c2 = save_index_to_hub(idx, "alice/bm25-hub1", hub, commit_message="v2")
    assert c2 != c1
    pinned = load_index_from_hub(spark, "alice/bm25-hub1", hub, revision=c1)
    assert _normalize(pinned.retrieve(qdf, k=5)) == before


def test_index_hub_local_dir_staging(spark, tmp_path):
    tdf = transcripts_df(spark, "t2", seed=72)
    idx = SparkBM25().index(tdf)
    hub = LocalHubClient(str(tmp_path / "hub"))
    stage = str(tmp_path / "stage")
    save_index_to_hub(idx, "bob/staged", hub, local_dir=stage,
                      include_readme=False)
    # staging dir was kept (reference keeps local_dir saves), and the
    # hub snapshot matches it
    assert os.path.exists(os.path.join(stage, "params.json"))
    snap = hub.snapshot_download("bob/staged")
    assert os.path.exists(os.path.join(snap, "params.json"))
    # non-empty staging dir without overwrite falls back to a temp dir
    # (can_save_locally contract) — push succeeds and stage is untouched
    mtime = os.path.getmtime(os.path.join(stage, "params.json"))
    save_index_to_hub(idx, "bob/staged", hub, local_dir=stage,
                      include_readme=False, commit_message="again")
    assert os.path.getmtime(os.path.join(stage, "params.json")) == mtime


def test_tokenizer_hub_with_vocab_table(spark, tmp_path):
    tdf = transcripts_df(spark, "t2", seed=73)
    idx = SparkBM25().index(tdf)
    hub = LocalHubClient(str(tmp_path / "hub"))
    vocab = idx.term_stats.select("term", "term_id")
    save_tokenizer_to_hub(hub, "alice/tok-v", idx.tokenizer_kwargs, vocab=vocab)
    spec, vdf = load_tokenizer_from_hub(spark, "alice/tok-v", hub)
    assert spec == idx.tokenizer_kwargs
    assert vdf is not None and vdf.count() == vocab.count()


def test_snapshot_download_reused_local_dir_is_exact(spark, tmp_path):
    """Downloading a DIFFERENT revision into the same local_dir must
    replace it wholesale: Spark part-file names are unique per write,
    so a merge would leave both generations of parquet parts on disk
    and spark.read.parquet would read doubled postings (regression)."""
    small = transcripts_df(spark, "t1", seed=74)
    big = transcripts_df(spark, "t2", seed=74)
    idx_small = SparkBM25(method="lucene").index(small)
    idx_big = SparkBM25(method="lucene").index(big)

    hub = LocalHubClient(str(tmp_path / "hub"))
    c1 = save_index_to_hub(idx_big, "carol/swap", hub, commit_message="big")
    c2 = save_index_to_hub(idx_small, "carol/swap", hub,
                           commit_message="small")
    assert c1 != c2

    local = str(tmp_path / "local_copy")
    got_big = load_index_from_hub(spark, "carol/swap", hub, revision=c1,
                                  local_dir=local)
    assert got_big.num_docs == idx_big.num_docs
    n_postings_big = got_big.postings.count()
    assert n_postings_big == idx_big.postings.count()

    # re-download the OTHER revision into the SAME dir: no stale parts
    got_small = load_index_from_hub(spark, "carol/swap", hub, revision=c2,
                                    local_dir=local)
    assert got_small.num_docs == idx_small.num_docs
    assert got_small.postings.count() == idx_small.postings.count()


def test_snapshot_download_local_dir_equal_to_snapshot_is_noop(tmp_path):
    """Pointing local_dir AT the snapshot itself (via a relative hub
    root) must be a no-op — the old abspath-vs-relative compare missed
    the match and rmtree'd the snapshot before copying from it."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        hub = LocalHubClient("relhub")  # RELATIVE root
        hub.create_repo("dana/idx")
        src = str(tmp_path / "stage")
        _write(src, "f.txt", "payload")
        cid = hub.upload_folder("dana/idx", src)
        snap_rel = os.path.join("relhub", "dana", "idx", "commits", cid)
        out = hub.snapshot_download("dana/idx", revision=cid,
                                    local_dir=snap_rel)
        assert os.path.isfile(os.path.join(out, "f.txt"))
        with open(os.path.join(snap_rel, "f.txt")) as f:
            assert f.read() == "payload"
    finally:
        os.chdir(cwd)
