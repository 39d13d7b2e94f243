"""bm25s_spark — a PySpark-native full-text (BM25) analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
library ``xhluca/bm25s`` (eager sparse BM25 scoring): per-turn tokenization
of transcript text via Arrow-vectorized pandas UDFs, posting-list
construction / merge / compression as DataFrame aggregations, eagerly
precomputed BM25 impacts for all five variants (robertson, lucene, atire,
bm25l, bm25+), and distributed top-k retrieval via a doc-sharded
scatter-gather kernel inside ``mapInPandas``.

The index *is* a set of tables (parquet locally, Iceberg on a cluster):
``postings`` / ``term_stats`` / ``doc_map`` / ``stats``.  Nothing is ever
collected to the driver except final ≤k-per-query candidate lists.

Reference behavior parity is documented per-function with file:line
citations into the reference repo (read-only at ``/root/reference``).
"""

from bm25s_spark.tokenization import tokenize, make_tokenizer_udf, STOPWORDS_EN
from bm25s_spark.scoring import METHODS, idf_expr, tfc_expr, nnoc_value
from bm25s_spark.indexer import (
    SparkBM25,
    BM25Index,
    build_index,
    build_index_from_token_ids,
    build_index_from_tokens,
    merge_indexes,
)
from bm25s_spark.index_io import (
    load_index,
    read_term_postings,
    save_index,
)
from bm25s_spark.compat import export_bm25s, import_bm25s
from bm25s_spark.session import get_spark
from bm25s_spark.transcripts import conversation_rollup
from bm25s_spark.functions.text import bpe_token_count, gopher_filter
from bm25s_spark.operators.similarity import quantize_embeddings, quantized_knn
from bm25s_spark.operators.asof import asof_join
from bm25s_spark.operators.collocations import pmi_collocations
from bm25s_spark.operators.lm import unigram_counts, with_lm_score
from bm25s_spark.operators.prf import prf_expand, prf_retrieve
from bm25s_spark.operators.curate import curate_corpus
from bm25s_spark.operators.evaldf import compare_runs
from bm25s_spark.operators.drift import distribution_divergence, term_drift
from bm25s_spark.operators.coverage import query_coverage
from bm25s_spark.operators.clustering import (
    cluster_assign,
    cluster_documents,
    cluster_keywords,
    cluster_summary,
)
from bm25s_spark.operators.events import session_summary, sessionize
from bm25s_spark.operators.hybrid import hybrid_retrieve, rrf_fuse
from bm25s_spark.operators.keywords import top_terms_per_doc
from bm25s_spark.operators.packing import pack_sequences, packing_stats
from bm25s_spark.operators.phrase import (
    phrase_match,
    phrase_topk,
    proximity_match,
)
from bm25s_spark.operators.snippets import snippets, snippets_for_results
from bm25s_spark.operators.mlt import more_like_this
from bm25s_spark.operators.wildcard import wildcard_retrieve
from bm25s_spark.operators.fuzzy import fuzzy_retrieve
from bm25s_spark.operators.bm25f import build_bm25f, bm25f_retrieve
from bm25s_spark.operators.boolean import retrieve_excluding
from bm25s_spark.operators.facets import facet_counts
from bm25s_spark.operators.trends import trending_terms
from bm25s_spark.operators.mmr import mmr_rerank
from bm25s_spark.operators.deletes import compact_index, with_tombstones
from bm25s_spark.operators.explain import explain_scores
from bm25s_spark.operators.synonyms import (
    expand_query_terms,
    retrieve_with_synonyms,
)
from bm25s_spark.operators.suggest import suggest_terms
from bm25s_spark.operators.recency import retrieve_with_decay
from bm25s_spark.operators.filtered import retrieve_filtered
from bm25s_spark.operators.collapse import collapse_results
from bm25s_spark.operators.percolate import percolate
from bm25s_spark.operators.paging import retrieve_after
from bm25s_spark.operators.similarity import mean_pool_embeddings
from bm25s_spark.streaming.dedup import (
    StreamingNearDeduplicator,
    streaming_deduplicate,
)
from bm25s_spark.streaming.sessions import session_window_rollup
from bm25s_spark.streaming.windows import windowed_event_rollup
from bm25s_spark.transcripts import speaker_stats
from bm25s_spark.hub import (
    HfHubClient,
    LocalHubClient,
    load_index_from_hub,
    load_tokenizer_from_hub,
    save_index_to_hub,
    save_tokenizer_to_hub,
)
from bm25s_spark.mcp_server import McpServer, create_mcp_server
from bm25s_spark.tokenization import make_hf_tokenizer_udf, tokenize_hf

__version__ = "0.8.0"

__all__ = [
    "tokenize",
    "make_tokenizer_udf",
    "STOPWORDS_EN",
    "METHODS",
    "idf_expr",
    "tfc_expr",
    "nnoc_value",
    "SparkBM25",
    "BM25Index",
    "build_index",
    "build_index_from_tokens",
    "build_index_from_token_ids",
    "merge_indexes",
    "quantize_embeddings",
    "quantized_knn",
    "bpe_token_count",
    "save_index",
    "load_index",
    "read_term_postings",
    "get_spark",
    "conversation_rollup",
    "sessionize",
    "asof_join",
    "curate_corpus",
    "session_summary",
    "session_window_rollup",
    "windowed_event_rollup",
    "gopher_filter",
    "rrf_fuse",
    "hybrid_retrieve",
    "top_terms_per_doc",
    "pack_sequences",
    "streaming_deduplicate",
    "packing_stats",
    "pmi_collocations",
    "prf_expand",
    "prf_retrieve",
    "unigram_counts",
    "with_lm_score",
    "phrase_match",
    "phrase_topk",
    "proximity_match",
    "snippets",
    "snippets_for_results",
    "more_like_this",
    "wildcard_retrieve",
    "fuzzy_retrieve",
    "build_bm25f",
    "bm25f_retrieve",
    "retrieve_excluding",
    "facet_counts",
    "trending_terms",
    "mmr_rerank",
    "with_tombstones",
    "compact_index",
    "explain_scores",
    "expand_query_terms",
    "retrieve_with_synonyms",
    "suggest_terms",
    "retrieve_with_decay",
    "retrieve_filtered",
    "collapse_results",
    "percolate",
    "retrieve_after",
    "mean_pool_embeddings",
    "StreamingNearDeduplicator",
    "term_drift",
    "distribution_divergence",
    "query_coverage",
    "speaker_stats",
]
