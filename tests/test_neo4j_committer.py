"""Neo4j committer against a live stub server speaking Bolt 4.4 over
real sockets: handshake + HELLO + explicit BEGIN/RUN/PULL/COMMIT
transactions, PackStream-decoded server-side; the graph produced by
the default MERGE/DETACH-DELETE Cypher must equal
resolve_operations' fold, and a server FAILURE must raise with the
Neo.* code. Reference contract: Neo4jClient.java:92-161 (post loop,
postUpsert/postDelete, toObjectMap), Neo4jCommitterConfig.java:47-96
(defaults, optionalParameters)."""

import socketserver
import struct
import threading

import pytest

from crawlspark.sinks.committers import resolve_operations
from crawlspark.sinks.neo4j import (
    MSG_BEGIN,
    MSG_COMMIT,
    MSG_GOODBYE,
    MSG_HELLO,
    MSG_PULL,
    MSG_RESET,
    MSG_ROLLBACK,
    MSG_RUN,
    MSG_SUCCESS,
    Neo4jCommitterConfig,
    chunk,
    neo4j_committer,
    ps_decode,
    ps_encode,
    ps_struct,
    to_object_map,
)

FAILURE_META = {
    "code": "Neo.ClientError.Statement.SyntaxError",
    "message": "injected",
}


@pytest.fixture()
def bolt_server():
    """TCP stub: real Bolt 4.4 handshake/framing/PackStream, an
    in-memory node store applying the default Cypher semantics
    (MERGE on $id upserts $doc; DETACH DELETE drops $id) with
    transaction buffering; state['fail_next'] answers one RUN with
    FAILURE."""
    state = {
        "nodes": {}, "hello": None, "fail_next": 0, "commits": 0,
    }
    lock = threading.Lock()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            magic = self._read(20)
            if magic is None:
                return
            assert magic[:4] == b"\x60\x60\xb0\x17"
            assert magic[4:8] == b"\x00\x00\x04\x04", "proposes 4.4"
            self.request.sendall(b"\x00\x00\x04\x04")
            txbuf = []
            failed = False
            while True:
                msg = self._read_message()
                if msg is None:
                    return
                (sig, fields), _ = ps_decode(msg)
                if sig == MSG_GOODBYE:
                    return
                if sig == MSG_HELLO:
                    with lock:
                        state["hello"] = fields[0]
                    self._success({"server": "Neo4j/4.4-stub"})
                elif sig == MSG_RESET:
                    failed = False
                    txbuf = []
                    self._success()
                elif failed:
                    self._send(ps_struct(0x7E))  # IGNORED
                elif sig == MSG_BEGIN:
                    txbuf = []
                    self._success()
                elif sig == MSG_RUN:
                    cypher, params = fields[0], fields[1]
                    with lock:
                        if state["fail_next"]:
                            state["fail_next"] -= 1
                            failed = True
                            self._send(
                                ps_struct(0x7F, FAILURE_META)
                            )
                            continue
                    txbuf.append((cypher, params))
                    self._success({"fields": []})
                elif sig == MSG_PULL:
                    self._success({"t_last": 0})
                elif sig == MSG_COMMIT:
                    with lock:
                        for cypher, params in txbuf:
                            if "DETACH DELETE" in cypher:
                                state["nodes"].pop(params["id"], None)
                            else:
                                node = state["nodes"].setdefault(
                                    params["id"], {}
                                )
                                node.update(params["doc"])
                        state["commits"] += 1
                    txbuf = []
                    self._success({"bookmark": "bk:1"})
                elif sig == MSG_ROLLBACK:
                    txbuf = []
                    self._success()
                else:  # pragma: no cover — protocol misuse
                    raise AssertionError(f"unexpected 0x{sig:02x}")

        def _success(self, meta=None):
            self._send(ps_struct(MSG_SUCCESS, meta or {}))

        def _send(self, message):
            self.request.sendall(chunk(message))

        def _read(self, n):
            buf = b""
            while len(buf) < n:
                part = self.request.recv(n - len(buf))
                if not part:
                    return None
                buf += part
            return buf

        def _read_message(self):
            out = b""
            while True:
                hdr = self._read(2)
                if hdr is None:
                    return None
                size = struct.unpack(">H", hdr)[0]
                if size == 0:
                    if out:
                        return out
                    continue
                out += self._read(size)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"bolt://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


def _ops_df(spark):
    rows = [
        (1, "a", "upsert", "first"),
        (5, "a", "upsert", "final-a"),
        (2, "b", "upsert", "doomed"),
        (6, "b", "delete", None),
        (3, "c", "delete", None),
        (7, "c", "upsert", "final-c"),
        (4, "d", "upsert", "final-d"),
    ]
    return spark.createDataFrame(
        rows, "seq long, image_id string, op string, caption string"
    ).repartition(4)


def test_neo4j_graph_matches_resolved_fold(spark, bolt_server):
    uri, state = bolt_server
    ops = _ops_df(spark)
    cfg = Neo4jCommitterConfig(
        uri=uri, username="neo4j", password="pw",
        batch_size=2, num_spark_partitions=2,
    )
    neo4j_committer(ops, cfg)
    got = {k: v["content"] for k, v in state["nodes"].items()}
    want = {
        r["image_id"]: r["caption"]
        for r in resolve_operations(ops).collect()
    }
    assert got == want == {
        "a": "final-a", "c": "final-c", "d": "final-d",
    }
    # node properties: id + content set from reference/content column
    # (postUpsert), original columns preserved
    node = state["nodes"]["a"]
    assert node["id"] == "a" and node["image_id"] == "a"
    assert node["caption"] == "final-a"
    # HELLO carried basic auth + the user agent
    hello = state["hello"]
    assert hello["scheme"] == "basic"
    assert hello["principal"] == "neo4j"
    assert hello["credentials"] == "pw"
    assert hello["user_agent"].startswith("crawlspark")
    # batch_size=2 over 7 ops across 2 partitions -> >1 transaction
    assert state["commits"] >= 2


def test_neo4j_server_failure_raises(spark, bolt_server):
    uri, state = bolt_server
    state["fail_next"] = 1
    with pytest.raises(Exception, match="Neo.ClientError"):
        neo4j_committer(
            _ops_df(spark),
            Neo4jCommitterConfig(uri=uri, num_spark_partitions=1),
        )


def test_packstream_roundtrip():
    values = [
        None, True, False, 0, 1, -1, -17, 127, 128, -129,
        32767, -32769, 2**31, -(2**31) - 1, 3.5,
        "", "x" * 15, "y" * 16, "z" * 300, "€ñ",
        b"", b"\x00\xff" * 200,
        [1, "two", None], list(range(20)),
        {"k": "v", "n": {"deep": [1, 2]}},
    ]
    for v in values:
        got, pos = ps_decode(ps_encode(v))
        assert got == v and pos == len(ps_encode(v)), v
    sig_fields, _ = ps_decode(ps_struct(MSG_RUN, "RETURN 1", {}, {}))
    assert sig_fields == (MSG_RUN, ["RETURN 1", {}, {}])


def test_to_object_map_reference_semantics():
    cfg = Neo4jCommitterConfig(
        uri="bolt://h:1", optional_parameters=("missing_param",),
    )
    row = {
        "seq": 9, "op": "upsert", "image_id": "doc-1",
        "caption": "hello", "tags": ["a", None, "b"], "w": 48,
        "skipme": None,
    }
    params = to_object_map(row, cfg)
    assert params["id"] == "doc-1"  # nodeIdProperty <- reference
    assert params["content"] == "hello"  # nodeContentProperty
    assert params["tags"] == "a||b"  # multiValuesJoiner "|"
    assert params["missing_param"] is None  # optionalParameters
    assert "seq" not in params and "op" not in params
    assert "skipme" not in params  # null metadata not bound
    assert params["doc"]["id"] == "doc-1" and "doc" not in params["doc"]


def test_to_object_map_reserved_doc_key_raises():
    """A ledger/metadata column literally named 'doc' collides with
    the reserved whole-map parameter — raise instead of silently
    clobbering it before binding."""
    import pytest

    cfg = Neo4jCommitterConfig(uri="bolt://h:1")
    row = {
        "seq": 1, "op": "upsert", "image_id": "d", "caption": "c",
        "doc": "a real column named doc",
    }
    with pytest.raises(ValueError, match="'doc'"):
        to_object_map(row, cfg)


def test_neo4j_midbatch_failure_not_masked(spark, bolt_server):
    """A FAILURE after some ops already sit in the open transaction
    must surface the server's error, not a follow-on IGNORED from a
    doomed tail COMMIT."""
    uri, state = bolt_server
    state["fail_next"] = 1
    ops = spark.createDataFrame(
        [(1, "a", "upsert", "x"), (2, "b", "upsert", "y"),
         (3, "c", "upsert", "z")],
        "seq long, image_id string, op string, caption string",
    ).coalesce(1)
    # batch_size 10 -> nothing commits before the injected failure;
    # the first RUN fails, ops after it raise inside the same task
    with pytest.raises(Exception, match="Neo.ClientError"):
        neo4j_committer(
            ops,
            Neo4jCommitterConfig(
                uri=uri, batch_size=10, num_spark_partitions=1
            ),
        )
    assert state["nodes"] == {}  # nothing half-committed
