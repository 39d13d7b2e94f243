"""MCP (Model Context Protocol) server exposing BM25 retrieval as tools.

The reference ships an MCP server built on ``fastmcp``
(``reference/bm25s/mcp/server.py:5-47``) with two tools — ``retrieve``
(query + k → ranked snippets) and ``get_info`` (index stats).  This is
the same surface as a dependency-free implementation of the MCP stdio
transport: newline-delimited JSON-RPC 2.0 (``initialize`` →
``notifications/initialized`` → ``tools/list`` / ``tools/call`` /
``ping``), per the public MCP specification (2024-11-05).  No ``mcp``
/ ``fastmcp`` package is needed, so the server runs anywhere PySpark
does — e.g. launched with ``spark-submit --py-files`` next to a saved
index on a cluster edge node.

Protocol handling (`McpServer.handle`) is pure and unit-testable
without a SparkSession; `create_mcp_server` wires the two reference
tools over a loaded index.

Run::

    python -m bm25s_spark.mcp_server --index-dir /path/to/saved/index
"""

from __future__ import annotations

import inspect
import json
import sys
from typing import Callable

PROTOCOL_VERSION = "2024-11-05"
JSONRPC = "2.0"

# JSON-RPC 2.0 error codes
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602


class McpServer:
    """Minimal MCP server core: tool registry + JSON-RPC dispatch.

    ``handle(msg)`` maps one decoded JSON-RPC message to a response
    dict (or ``None`` for notifications); ``serve()`` runs the stdio
    loop.  Tool callables receive the ``arguments`` object as kwargs
    and return a string; exceptions surface as ``isError`` tool
    results, not protocol errors (the MCP-specified split: protocol
    errors are for malformed requests, tool failures are content)."""

    def __init__(self, name: str, version: str = "1.0.0"):
        self.name = name
        self.version = version
        self._tools: dict[str, dict] = {}
        self._initialized = False

    def add_tool(self, name: str, description: str, input_schema: dict,
                 fn: Callable[..., str]) -> None:
        self._tools[name] = {
            "description": description,
            "inputSchema": input_schema,
            "fn": fn,
        }

    # -- dispatch ------------------------------------------------------
    def handle(self, msg: dict) -> dict | None:
        if not isinstance(msg, dict) or msg.get("jsonrpc") != JSONRPC:
            return self._error(msg.get("id") if isinstance(msg, dict) else None,
                               INVALID_REQUEST, "not a JSON-RPC 2.0 message")
        method = msg.get("method")
        msg_id = msg.get("id")
        is_notification = "id" not in msg
        try:
            if method == "initialize":
                self._initialized = True
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {"listChanged": False}},
                    "serverInfo": {"name": self.name, "version": self.version},
                }
            elif method == "notifications/initialized":
                return None
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {
                    "tools": [
                        {
                            "name": n,
                            "description": t["description"],
                            "inputSchema": t["inputSchema"],
                        }
                        for n, t in sorted(self._tools.items())
                    ]
                }
            elif method == "tools/call":
                params = msg.get("params") or {}
                name = params.get("name")
                if name not in self._tools:
                    # JSON-RPC 2.0: a notification NEVER gets a response,
                    # not even an error one
                    return None if is_notification else self._error(
                        msg_id, INVALID_PARAMS, f"unknown tool {name!r}")
                args = params.get("arguments") or {}
                fn = self._tools[name]["fn"]
                try:
                    # argument-shape errors are protocol errors (-32602),
                    # distinct from tool failures (isError content)
                    inspect.signature(fn).bind(**args)
                except TypeError as exc:
                    return None if is_notification else self._error(
                        msg_id, INVALID_PARAMS, str(exc))
                try:
                    text = fn(**args)
                    result = {
                        "content": [{"type": "text", "text": str(text)}],
                        "isError": False,
                    }
                except Exception as exc:  # tool failure → content error
                    result = {
                        "content": [{"type": "text",
                                     "text": f"{type(exc).__name__}: {exc}"}],
                        "isError": True,
                    }
            elif is_notification:
                return None  # unknown notifications are ignored per spec
            else:
                return self._error(msg_id, METHOD_NOT_FOUND,
                                   f"method {method!r} not found")
        except TypeError as exc:  # bad kwargs shape for a tool
            return None if is_notification else self._error(
                msg_id, INVALID_PARAMS, str(exc))
        if is_notification:
            return None
        return {"jsonrpc": JSONRPC, "id": msg_id, "result": result}

    @staticmethod
    def _error(msg_id, code: int, message: str) -> dict:
        return {"jsonrpc": JSONRPC, "id": msg_id,
                "error": {"code": code, "message": message}}

    # -- stdio transport -------------------------------------------------
    def serve(self, stdin=None, stdout=None) -> None:
        """Newline-delimited JSON-RPC loop (the MCP stdio transport)."""
        stdin = stdin if stdin is not None else sys.stdin
        stdout = stdout if stdout is not None else sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError as exc:
                resp = self._error(None, PARSE_ERROR, f"parse error: {exc}")
            else:
                resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


def create_mcp_server(spark, index_dir: str, text_col: str = "text",
                      method: str = "lucene") -> McpServer:
    """Load a saved index and expose the reference's two tools
    (``reference/bm25s/mcp/server.py:13-40``): ``retrieve(query, k)``
    and ``get_info()``.

    Interactive single queries ride the join strategy (one query, no
    shard fan-out needed); document text comes from the saved
    ``doc_map`` when present, else ranks carry bare doc ids."""
    from pyspark.sql import functions as F

    from bm25s_spark.index_io import load_index

    index = load_index(spark, index_dir)
    server = McpServer("bm25s_spark")

    def retrieve(query: str, k: int = 10) -> str:
        queries = spark.createDataFrame([(0, query)], "query_id int, text string")
        with_docs = index.doc_map is not None
        rows = index.retrieve(
            queries, k=int(k), method=method, with_docs=with_docs,
        ).orderBy("rank").collect()
        out = []
        for r in rows:
            doc = r[text_col] if with_docs and text_col in r.asDict() \
                else f"doc_id={r['doc_id']}"
            out.append(f"Rank {r['rank']} (Score: {r['score']:.4f}):\n{doc}\n")
        return "\n".join(out) if out else "(no results)"

    def get_info() -> str:
        n_terms = index.term_stats.where(F.col("df") > 0).count()
        return (
            "BM25S Index Info:\n"
            f"- Vocab Size: {n_terms}\n"
            f"- Num Docs: {index.num_docs}\n"
            "- Backend: pyspark"
        )

    server.add_tool(
        "retrieve",
        "Retrieve documents from the index based on the query.",
        {
            "type": "object",
            "properties": {
                "query": {"type": "string",
                          "description": "The search query string."},
                "k": {"type": "integer", "default": 10,
                      "description": "The number of documents to retrieve."},
            },
            "required": ["query"],
        },
        retrieve,
    )
    server.add_tool(
        "get_info",
        "Get information about the loaded index.",
        {"type": "object", "properties": {}},
        get_info,
    )
    return server


def main(argv=None) -> None:  # pragma: no cover - thin CLI shell
    import argparse

    from bm25s_spark.session import get_spark

    ap = argparse.ArgumentParser(description="Run the bm25s_spark MCP server")
    ap.add_argument("--index-dir", required=True,
                    help="Path to a saved bm25s_spark index directory")
    args = ap.parse_args(argv)
    spark = get_spark("bm25s_spark-mcp")
    server = create_mcp_server(spark, args.index_dir)
    server.serve()


if __name__ == "__main__":  # pragma: no cover
    main()
