"""MCP server surface (reference/bm25s/mcp/server.py analog): protocol
core (pure, no Spark) + the two reference tools over a real saved index."""

from __future__ import annotations

import io
import json

from bm25s_spark.index_io import save_index
from bm25s_spark.indexer import SparkBM25
from bm25s_spark.mcp_server import (
    METHOD_NOT_FOUND,
    PARSE_ERROR,
    PROTOCOL_VERSION,
    McpServer,
    create_mcp_server,
)
from bm25s_spark.transcripts import transcripts_df


def _req(method, msg_id=1, **params):
    m = {"jsonrpc": "2.0", "id": msg_id, "method": method}
    if params:
        m["params"] = params
    return m


def _mk():
    s = McpServer("test-server", version="9.9.9")
    s.add_tool(
        "echo", "Echo the input.",
        {"type": "object", "properties": {"text": {"type": "string"}},
         "required": ["text"]},
        lambda text: f"echo:{text}",
    )
    s.add_tool(
        "boom", "Always fails.",
        {"type": "object", "properties": {}},
        lambda: (_ for _ in ()).throw(RuntimeError("kaput")),
    )
    return s


def test_protocol_handshake_and_listing():
    s = _mk()
    init = s.handle(_req("initialize", protocolVersion=PROTOCOL_VERSION,
                         capabilities={}))
    assert init["result"]["protocolVersion"] == PROTOCOL_VERSION
    assert init["result"]["serverInfo"] == {"name": "test-server",
                                            "version": "9.9.9"}
    assert "tools" in init["result"]["capabilities"]
    # initialized notification: no response
    assert s.handle({"jsonrpc": "2.0",
                     "method": "notifications/initialized"}) is None
    assert s.handle(_req("ping", msg_id=2))["result"] == {}
    tools = s.handle(_req("tools/list", msg_id=3))["result"]["tools"]
    assert [t["name"] for t in tools] == ["boom", "echo"]
    assert all({"name", "description", "inputSchema"} <= set(t) for t in tools)


def test_tool_calls_success_failure_and_errors():
    s = _mk()
    ok = s.handle(_req("tools/call", msg_id=4, name="echo",
                       arguments={"text": "hi"}))["result"]
    assert ok == {"content": [{"type": "text", "text": "echo:hi"}],
                  "isError": False}
    # tool exception → isError content, NOT a protocol error (MCP split)
    bad = s.handle(_req("tools/call", msg_id=5, name="boom",
                        arguments={}))["result"]
    assert bad["isError"] and "kaput" in bad["content"][0]["text"]
    # unknown tool / unknown method → JSON-RPC errors
    assert "error" in s.handle(_req("tools/call", msg_id=6, name="nope",
                                    arguments={}))
    err = s.handle(_req("definitely/not", msg_id=7))
    assert err["error"]["code"] == METHOD_NOT_FOUND
    # wrong argument shape → invalid params
    assert "error" in s.handle(_req("tools/call", msg_id=8, name="echo",
                                    arguments={"wrong": 1}))
    # non-jsonrpc message rejected
    assert "error" in s.handle({"id": 9, "method": "ping"})


def test_stdio_loop_newline_delimited():
    s = _mk()
    lines = [
        json.dumps(_req("initialize", msg_id=1)),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        "this is not json",
        "",
        json.dumps(_req("tools/call", msg_id=2, name="echo",
                        arguments={"text": "x"})),
    ]
    out = io.StringIO()
    s.serve(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    # 3 responses: init result, parse error, tool result (notification +
    # blank line produce nothing)
    assert len(resp) == 3
    assert resp[0]["id"] == 1 and "result" in resp[0]
    assert resp[1]["error"]["code"] == PARSE_ERROR
    assert resp[2]["result"]["content"][0]["text"] == "echo:x"


def test_reference_tools_over_real_index(spark, tmp_path):
    tdf = transcripts_df(spark, "t2", seed=74).persist()
    idx = SparkBM25().index(tdf)
    path = str(tmp_path / "index")
    save_index(idx, path)

    s = create_mcp_server(spark, path)
    tools = s.handle(_req("tools/list"))["result"]["tools"]
    assert [t["name"] for t in tools] == ["get_info", "retrieve"]

    info = s.handle(_req("tools/call", msg_id=2, name="get_info",
                         arguments={}))["result"]
    assert not info["isError"]
    text = info["content"][0]["text"]
    assert f"Num Docs: {idx.num_docs}" in text and "Vocab Size:" in text

    # pick a query phrase from a real turn; top hit must carry that text
    probe = tdf.orderBy("conv_id", "turn_idx").select("text").collect()[0]["text"]
    res = s.handle(_req("tools/call", msg_id=3, name="retrieve",
                        arguments={"query": probe, "k": 3}))["result"]
    assert not res["isError"]
    body = res["content"][0]["text"]
    assert body.startswith("Rank 1 (Score: ")
    assert body.count("Rank ") == 3
    # doc text came from the saved doc_map join
    assert "doc_id=" not in body


def test_notifications_never_get_responses_even_on_error():
    """JSON-RPC 2.0: a notification (no id) MUST NOT receive a response
    — including error responses for an unknown tool or a bad argument
    shape (regression: these branches returned id:null errors)."""
    s = _mk()
    # unknown tool as a notification → silence
    assert s.handle({"jsonrpc": "2.0", "method": "tools/call",
                     "params": {"name": "nope"}}) is None
    # bad argument shape as a notification → silence
    assert s.handle({"jsonrpc": "2.0", "method": "tools/call",
                     "params": {"name": "echo",
                                "arguments": {"bogus": 1}}}) is None
    # a tools/call notification that works also stays silent
    assert s.handle({"jsonrpc": "2.0", "method": "tools/call",
                     "params": {"name": "echo",
                                "arguments": {"text": "hi"}}}) is None
    # the same shapes WITH an id still get their error responses
    r = s.handle(_req("tools/call", msg_id=7, name="nope"))
    assert r["id"] == 7 and "error" in r
