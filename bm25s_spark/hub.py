"""Model-hub save/load for BM25 indexes + tokenizer configs.

Re-expresses the reference's Hugging Face Hub surface
(``reference/bm25s/hf.py`` — ``BM25HF.save_to_hub`` /
``BM25HF.load_from_hub`` at ``:477-666``, ``TokenizerHF.save_vocab_to_hub``
/ ``load_vocab_from_hub`` / ``save_stopwords_to_hub`` /
``load_stopwords_from_hub`` at ``:254-476``) behind a pluggable hub
client, so the semantics are real and testable in an offline sandbox:

- :class:`HfHubClient` — thin adapter over ``huggingface_hub.HfApi``
  (the exact calls the reference makes: ``create_repo`` /
  ``upload_folder`` / ``repo_info`` / ``snapshot_download``), gated
  behind an import-try because the library and the network are absent
  here.
- :class:`LocalHubClient` — directory-backed hub with real
  commit/revision semantics: every ``upload_folder`` creates a new
  content-addressed commit, ``"main"`` tracks the latest, and
  ``snapshot_download(revision=...)`` resolves any historical commit.
  Deterministic (commit ids hash parent + content, no wall clock), so
  save→load roundtrips and revision pinning are unit-testable offline.

Scale note: the heavy artifacts (sharded postings parquet) are written
once by ``index_io.save_index`` — executors write directly to the
staging directory; the hub client only moves/uploads finished files.
Nothing re-serializes through the driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bm25s_spark.index_io import load_index, save_index
from bm25s_spark.indexer import BM25Index
from bm25s_spark.tokenization import resolve_stopwords


def is_dir_empty(local_save_dir: str | None) -> bool:
    """True if the directory is missing or empty
    (``reference/bm25s/hf.py:205-222``)."""
    if local_save_dir is None or not os.path.exists(local_save_dir):
        return True
    return len(os.listdir(local_save_dir)) == 0


def can_save_locally(local_save_dir: str | None, overwrite_local: bool) -> bool:
    """Whether a hub save may stage into ``local_save_dir`` instead of a
    temp dir (``reference/bm25s/hf.py:224-252``: None → no; empty → yes;
    non-empty → only with ``overwrite_local``)."""
    if local_save_dir is None:
        return False
    return is_dir_empty(local_save_dir) or bool(overwrite_local)


class LocalHubClient:
    """Directory-backed model hub with commit/revision semantics.

    Layout under ``root``::

        <root>/<username>/<repo_name>/
            repo.json                  {"private": ..., "repo_id": ...}
            refs.json                  {"main": "<cid>", "commits": [...]}
            commits/<cid>/             snapshot of the uploaded folder
            commits/<cid>.json         {"message": ..., "parent": ...}

    Commit ids are content-addressed (sha256 over sorted relative paths
    + file bytes), so identical re-uploads dedup to the same revision
    and the history is deterministic — no wall clock, no randomness.
    The parent pointer is recorded in the commit metadata, not the id.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- path helpers -------------------------------------------------
    def _repo_dir(self, repo_id: str) -> str:
        if "/" not in repo_id:
            raise ValueError(
                f"repo_id must be 'username/repo_name', got {repo_id!r}"
            )
        username, repo_name = repo_id.split("/", 1)
        if not username or not repo_name or ".." in repo_id:
            raise ValueError(f"malformed repo_id {repo_id!r}")
        return os.path.join(self.root, username, repo_name)

    def _refs(self, repo_id: str) -> dict:
        path = os.path.join(self._repo_dir(repo_id), "refs.json")
        if not os.path.exists(path):
            return {"main": None, "commits": []}
        with open(path) as f:
            return json.load(f)

    # -- HfApi-shaped surface -----------------------------------------
    def create_repo(self, repo_id: str, private: bool = True,
                    exist_ok: bool = True) -> str:
        d = self._repo_dir(repo_id)
        meta = os.path.join(d, "repo.json")
        if os.path.exists(meta):
            if not exist_ok:
                raise FileExistsError(f"repo {repo_id!r} already exists")
            return repo_id
        os.makedirs(os.path.join(d, "commits"), exist_ok=True)
        with open(meta, "w") as f:
            json.dump({"repo_id": repo_id, "private": bool(private)}, f)
        return repo_id

    def repo_info(self, repo_id: str) -> dict:
        meta = os.path.join(self._repo_dir(repo_id), "repo.json")
        if not os.path.exists(meta):
            raise FileNotFoundError(f"repo {repo_id!r} not found on this hub")
        with open(meta) as f:
            info = json.load(f)
        info["refs"] = self._refs(repo_id)
        return info

    def upload_folder(self, repo_id: str, folder_path: str,
                      commit_message: str = "update") -> str:
        """Snapshot ``folder_path`` as a new commit; returns the commit id.

        Identical content on top of the same parent produces the same
        commit id and is deduplicated (no new snapshot)."""
        self.repo_info(repo_id)  # must exist
        refs = self._refs(repo_id)
        parent = refs["main"] or ""
        h = hashlib.sha256()
        rels = []
        for base, _, files in sorted(os.walk(folder_path)):
            for name in sorted(files):
                full = os.path.join(base, name)
                rel = os.path.relpath(full, folder_path)
                rels.append((rel, full))
        for rel, full in sorted(rels):
            h.update(rel.encode())
            with open(full, "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    h.update(chunk)
        cid = h.hexdigest()[:16]
        repo = self._repo_dir(repo_id)
        snap = os.path.join(repo, "commits", cid)
        if not os.path.exists(snap):
            shutil.copytree(folder_path, snap)
            with open(snap + ".json", "w") as f:
                json.dump({"message": commit_message, "parent": parent or None}, f)
            refs["commits"].append(cid)
        refs["main"] = cid
        with open(os.path.join(repo, "refs.json"), "w") as f:
            json.dump(refs, f)
        return cid

    def snapshot_download(self, repo_id: str, revision: str | None = None,
                          local_dir: str | None = None) -> str:
        """Resolve a revision (default ``main``) to a snapshot directory.

        With ``local_dir``, copies the snapshot there (the HfApi
        behavior); otherwise returns the hub's own snapshot path."""
        refs = self.repo_info(repo_id)["refs"]
        cid = refs["main"] if revision in (None, "main") else revision
        if cid is None or cid not in refs["commits"]:
            raise FileNotFoundError(
                f"revision {revision!r} not found in {repo_id!r} "
                f"(have: {refs['commits']})"
            )
        snap = os.path.join(self._repo_dir(repo_id), "commits", cid)
        if local_dir is None:
            return snap
        if os.path.abspath(local_dir) != os.path.abspath(snap):
            # local_dir becomes an EXACT copy of the snapshot: stale
            # files from a previously downloaded revision are removed
            # first.  Spark part-file names are unique per write, so a
            # merge (dirs_exist_ok alone) would leave both generations
            # on disk and spark.read.parquet would read them all —
            # silently doubled postings.
            if os.path.isdir(local_dir):
                shutil.rmtree(local_dir)
            shutil.copytree(snap, local_dir)
        return local_dir

    def list_commits(self, repo_id: str) -> list[str]:
        return list(self._refs(repo_id)["commits"])


class HfHubClient:
    """Adapter over ``huggingface_hub.HfApi`` with the same four calls
    the reference makes (``reference/bm25s/hf.py:557-566,576-585,
    646-655``).  Import-gated: the library (and network) are absent in
    this sandbox, so only :class:`LocalHubClient` is exercised by tests;
    the call mapping is 1:1 with the reference's."""

    def __init__(self, token: str | None = None):
        try:
            from huggingface_hub import HfApi  # type: ignore
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "huggingface_hub is not installed; use LocalHubClient or "
                "install huggingface_hub for real Hub access"
            ) from exc
        self.api = HfApi(token=token)

    def create_repo(self, repo_id: str, private: bool = True,
                    exist_ok: bool = True) -> str:  # pragma: no cover
        url = self.api.create_repo(repo_id=repo_id, private=private,
                                   repo_type="model", exist_ok=exist_ok)
        return url.repo_id

    def repo_info(self, repo_id: str):  # pragma: no cover
        return self.api.repo_info(repo_id)

    def upload_folder(self, repo_id: str, folder_path: str,
                      commit_message: str = "update"):  # pragma: no cover
        return self.api.upload_folder(repo_id=repo_id,
                                      folder_path=folder_path,
                                      commit_message=commit_message,
                                      repo_type="model")

    def snapshot_download(self, repo_id: str, revision: str | None = None,
                          local_dir: str | None = None):  # pragma: no cover
        from huggingface_hub import snapshot_download  # type: ignore

        return snapshot_download(repo_id, revision=revision,
                                 local_dir=local_dir)


_README_TEMPLATE = """# BM25S-Spark index: {repo_id}

A PySpark-native BM25 index built with `bm25s_spark` (reference model
card: `reference/bm25s/hf.py:28-185`).

## Stats

| field | value |
|---|---|
| num_docs | {num_docs} |
| num_postings | {num_postings} |
| avg tokens per doc | {avgdl:.2f} |
| k1 | {k1} |
| b | {b} |
| delta | {delta} |
| docs_per_shard | {docs_per_shard} |
| tokenizer | `{tokenizer}` |

## Usage

```python
from bm25s_spark.hub import LocalHubClient, load_index_from_hub
index = load_index_from_hub(spark, "{repo_id}", client)
results = index.retrieve(queries_df, k=10)
```
"""


def save_index_to_hub(
    index: BM25Index,
    repo_id: str,
    client,
    corpus: DataFrame | None = None,
    private: bool = True,
    commit_message: str = "Update BM25S model",
    local_dir: str | None = None,
    overwrite_local: bool = False,
    include_readme: bool = True,
    fmt: str = "parquet",
) -> str:
    """Save the index and push it to a hub repo; returns the commit id
    (``reference/bm25s/hf.py:477-599`` semantics: create repo, stage the
    ``save()`` output — into ``local_dir`` when allowed, else a temp dir
    — add a README model card, upload the folder).

    ``corpus`` (optional) is saved alongside as JSONL part files —
    the distributed analog of the reference's single ``corpus.jsonl``
    (``:512-517``): executors write their partitions directly, nothing
    is collected.
    """
    repo_id = client.create_repo(repo_id, private=private, exist_ok=True)
    staging_locally = can_save_locally(local_dir, overwrite_local)
    save_dir = local_dir if staging_locally else tempfile.mkdtemp(
        prefix="bm25s_spark_hub_")
    if staging_locally:
        os.makedirs(save_dir, exist_ok=True)
    try:
        save_index(index, save_dir, fmt=fmt)
        if corpus is not None:
            corpus.write.mode("overwrite").json(
                os.path.join(save_dir, "corpus.jsonl"))
        if include_readme:
            # sum(df) over the vocab-sized term_stats == the number of
            # (term, doc) posting rows — NEVER count() the postings
            # table (a full corpus-sized scan) for a README stat
            num_postings = int(
                index.term_stats.agg(
                    F.sum("df").alias("s")).collect()[0]["s"] or 0
            )
            with open(os.path.join(save_dir, "README.md"), "w") as f:
                f.write(_README_TEMPLATE.format(
                    repo_id=repo_id,
                    num_docs=index.num_docs,
                    num_postings=num_postings,
                    avgdl=index.avg_doc_len,
                    k1=index.k1, b=index.b, delta=index.delta,
                    docs_per_shard=index.docs_per_shard,
                    tokenizer=json.dumps(index.tokenizer_kwargs,
                                         sort_keys=True),
                ))
        return client.upload_folder(repo_id, save_dir,
                                    commit_message=commit_message)
    finally:
        if not staging_locally:
            shutil.rmtree(save_dir, ignore_errors=True)


def load_index_from_hub(
    spark: SparkSession,
    repo_id: str,
    client,
    revision: str | None = None,
    local_dir: str | None = None,
    load_corpus: bool = False,
    fmt: str = "parquet",
) -> BM25Index:
    """Download a snapshot and load the index
    (``reference/bm25s/hf.py:601-666``: ``repo_info`` existence check,
    ``snapshot_download``, then ``load``).  With ``load_corpus=True``
    and a saved corpus present, attaches it as ``index.corpus`` (a lazy
    DataFrame over the snapshot files — the mmap-analog: nothing loads
    until an action, matching ``load(..., load_corpus=True, mmap=True)``).
    """
    client.repo_info(repo_id)
    snapshot = client.snapshot_download(repo_id, revision=revision,
                                        local_dir=local_dir)
    index = load_index(spark, snapshot, fmt=fmt)
    corpus_path = os.path.join(snapshot, "corpus.jsonl")
    if load_corpus and os.path.isdir(corpus_path):
        index.corpus = spark.read.json(corpus_path)
    return index


def save_tokenizer_to_hub(
    client,
    repo_id: str,
    tokenizer_kwargs: dict,
    vocab: DataFrame | None = None,
    private: bool = True,
    commit_message: str = "Update tokenizer",
) -> str:
    """Push a tokenizer config (+ optional vocab table) to a hub repo
    (``TokenizerHF.save_vocab_to_hub`` / ``save_stopwords_to_hub``,
    ``reference/bm25s/hf.py:254-435``).

    The reference stores ``vocab.json`` (token→id) and
    ``stopwords.json``; here the config JSON carries the full tokenizer
    spec (pattern, language, resolved stopword list) and the vocab —
    corpus-vocabulary-sized, potentially millions of rows at 100 TB —
    stays a parquet table written by executors, never a driver-side
    JSON blob.
    """
    repo_id = client.create_repo(repo_id, private=private, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="bm25s_spark_tok_")
    try:
        spec = dict(tokenizer_kwargs)
        spec["resolved_stopwords"] = sorted(
            resolve_stopwords(spec.get("stopwords", "en")))
        with open(os.path.join(stage, "tokenizer.json"), "w") as f:
            json.dump(spec, f, indent=2, sort_keys=True)
        if vocab is not None:
            vocab.write.mode("overwrite").parquet(
                os.path.join(stage, "vocab"))
        return client.upload_folder(repo_id, stage,
                                    commit_message=commit_message)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def load_tokenizer_from_hub(
    spark: SparkSession,
    repo_id: str,
    client,
    revision: str | None = None,
) -> tuple[dict, DataFrame | None]:
    """Fetch a tokenizer config (+ vocab table if present) from a hub
    repo (``TokenizerHF.load_vocab_from_hub`` / ``load_stopwords_from_hub``,
    ``reference/bm25s/hf.py:325-476``).  Returns ``(tokenizer_kwargs,
    vocab_df_or_None)``; the kwargs round-trip straight into
    ``make_tokenizer_udf`` / ``build_index``."""
    client.repo_info(repo_id)
    snapshot = client.snapshot_download(repo_id, revision=revision)
    with open(os.path.join(snapshot, "tokenizer.json")) as f:
        spec = json.load(f)
    spec.pop("resolved_stopwords", None)
    vocab = None
    vocab_path = os.path.join(snapshot, "vocab")
    if os.path.isdir(vocab_path):
        vocab = spark.read.parquet(vocab_path)
    return spec, vocab
