"""REST committers against live stub servers: the op log pushed
through es_bulk_committer / solr_committer over real sockets must
leave the server holding exactly resolve_operations' folded state
(last op per id wins, deletes drop), and error responses must be
loud. Reference contracts: ElasticsearchCommitter.java:188-370
(NDJSON /_bulk, "errors":true scan, 512-byte id fix),
SolrCommitter.java:125-215 (add/deleteById batches + commit)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawlspark.sinks.committers import resolve_operations
from crawlspark.sinks.rest import (
    ES_ID_LIMIT,
    RestCommitterConfig,
    es_bulk_committer,
    fix_bad_id,
    solr_committer,
)


@pytest.fixture()
def stub():
    """One server speaking both dialects: /_bulk applies ES NDJSON
    actions to an in-memory index; /update applies Solr JSON update
    commands. state['fail_next'] forces one error response."""
    state = {"index": {}, "requests": [], "fail_next": None}
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive for the pooled conns

        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(
                int(self.headers.get("Content-Length", 0))
            ).decode("utf-8")
            with lock:
                state["requests"].append((self.path, body))
                fail = state["fail_next"]
                if fail:
                    state["fail_next"] = None
                    self._reply(fail["status"], fail["body"])
                    return
                if self.path == "/_bulk":
                    self._apply_es(body)
                    self._reply(200, '{"took":1,"errors":false,"items":[]}')
                elif self.path.startswith("/update"):
                    self._apply_solr(body)
                    self._reply(
                        200, '{"responseHeader":{"status":0,"QTime":1}}'
                    )
                else:
                    self._reply(404, "{}")

        def _apply_es(self, body):
            lines = [ln for ln in body.split("\n") if ln]
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                if "index" in action:
                    state["index"][action["index"]["_id"]] = json.loads(
                        lines[i + 1]
                    )
                    i += 2
                else:
                    state["index"].pop(action["delete"]["_id"], None)
                    i += 1

        def _apply_solr(self, body):
            # Solr's JSON command stream allows repeated keys; parse
            # with a pair hook (applies at every nesting level, so
            # rebuild dicts below the duplicated top level).
            def undo(p):
                return {
                    k: dict(v) if isinstance(v, list)
                    and all(isinstance(x, tuple) for x in v) else v
                    for k, v in p
                }

            pairs = json.loads(body, object_pairs_hook=lambda p: p)
            for key, val in pairs:
                val = undo(val)
                if key == "add":
                    doc = dict(val["doc"]) if isinstance(
                        val["doc"], list
                    ) else val["doc"]
                    state["index"][doc["id"]] = doc
                elif key == "delete":
                    state["index"].pop(val["id"], None)

        def _reply(self, status, text):
            data = text.encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


def _ops_df(spark):
    """An op log with re-upserts and a delete, scattered across
    partitions out of order — the committer must still converge on
    the fold because ids are co-partitioned and seq-sorted."""
    rows = [
        # id "a": upsert, upsert (second wins)
        (1, "a", "upsert", "first"),
        (5, "a", "upsert", "final-a"),
        # id "b": upsert then delete -> gone
        (2, "b", "upsert", "doomed"),
        (6, "b", "delete", None),
        # id "c": delete then (re-crawl) upsert -> present
        (3, "c", "delete", None),
        (7, "c", "upsert", "final-c"),
        (4, "d", "upsert", "final-d"),
    ]
    return spark.createDataFrame(
        rows, "seq long, image_id string, op string, caption string"
    ).repartition(4)  # round-robin scatter before the committer


EXPECTED = {"a": "final-a", "c": "final-c", "d": "final-d"}


def test_es_bulk_matches_resolved_fold(spark, stub):
    base, state = stub
    ops = _ops_df(spark)
    es_bulk_committer(
        ops, RestCommitterConfig(base_url=base, batch_size=2)
    )
    got = {k: v["caption"] for k, v in state["index"].items()}
    assert got == EXPECTED
    # and that equals the file-committer fold of the same log
    folded = {
        r["image_id"]: r["caption"]
        for r in resolve_operations(ops).collect()
    }
    assert folded == EXPECTED
    # batching respected: every /_bulk body holds <= 2 actions
    for path, body in state["requests"]:
        assert path == "/_bulk"
        n_actions = sum(
            1 for ln in body.split("\n")
            if ln.startswith('{"index"') or ln.startswith('{"delete"')
        )
        assert 1 <= n_actions <= 2


def test_solr_matches_resolved_fold(spark, stub):
    base, state = stub
    solr_committer(
        _ops_df(spark),
        RestCommitterConfig(base_url=base, batch_size=3),
    )
    got = {k: v["caption"] for k, v in state["index"].items()}
    assert got == EXPECTED
    assert all(p.startswith("/update") for p, _ in state["requests"])


def test_es_bulk_item_errors_raise(spark, stub):
    base, state = stub
    state["fail_next"] = {
        "status": 200,
        "body": json.dumps({
            "took": 1, "errors": True,
            "items": [{"index": {"_id": "a", "error":
                                 {"type": "mapper_parsing_exception"}}}],
        }),
    }
    with pytest.raises(Exception, match="mapper_parsing_exception"):
        es_bulk_committer(
            _ops_df(spark),
            RestCommitterConfig(
                base_url=base, num_partitions=1, retries=0
            ),
        )


def test_es_bulk_item_errors_ignorable(spark, stub):
    base, state = stub
    state["fail_next"] = {
        "status": 200,
        "body": '{"took":1,"errors":true,"items":[{"index":{"_id":"a",'
                '"error":{"type":"x"}}}]}',
    }
    es_bulk_committer(
        _ops_df(spark),
        RestCommitterConfig(
            base_url=base, num_partitions=1,
            ignore_response_errors=True, retries=0,
        ),
    )
    # the failed batch was skipped but later batches still applied
    assert state["requests"]


def test_http_error_raises(spark, stub):
    base, state = stub
    state["fail_next"] = {"status": 503, "body": "busy"}
    with pytest.raises(Exception, match="HTTP 503"):
        es_bulk_committer(
            _ops_df(spark),
            RestCommitterConfig(
                base_url=base, num_partitions=1, retries=0
            ),
        )


def test_fix_bad_id_truncates_deterministically():
    long_ref = "http://h/" + "x" * 600
    fixed = fix_bad_id(long_ref)
    assert len(fixed.encode()) <= ES_ID_LIMIT
    assert fixed == fix_bad_id(long_ref)  # deterministic
    assert fixed != fix_bad_id(long_ref + "y")  # tail-sensitive
    assert fix_bad_id("short") == "short"


def test_binary_columns_inline_base64(spark, stub):
    base, state = stub
    df = spark.createDataFrame(
        [(1, "img", "upsert", bytearray(b"\x89PNG rawbytes"))],
        "seq long, image_id string, op string, bytes binary",
    )
    es_bulk_committer(df, RestCommitterConfig(base_url=base))
    import base64 as b64

    assert state["index"]["img"]["bytes"] == b64.b64encode(
        b"\x89PNG rawbytes"
    ).decode()


def test_cli_export_to_elasticsearch(spark, stub, tmp_path):
    """`export --format elasticsearch --out <url>` pushes the folded
    doc state to the stub server through the bulk committer."""
    from crawlspark.cli import main
    from crawlspark.plans.ledger import AppendTable
    from crawlspark.plans.superstep import DOCS_SCHEMA

    base, state = stub
    docs = spark.createDataFrame(
        [
            ("img-1", bytearray(b"px"), 2, 2, "png", "cap one", 7, "c1",
             1, 0, "upsert"),
            ("img-1", bytearray(b"px2"), 2, 2, "png", "cap two", 8, "c2",
             3, 0, "upsert"),
            ("img-2", None, None, None, None, None, None, None,
             2, 0, "delete"),
        ],
        DOCS_SCHEMA,
    )
    run = tmp_path / "run"
    AppendTable(
        spark, str(run / "documents"), schema=DOCS_SCHEMA
    ).append(docs, "000001")
    rc = main(
        [
            "export",
            "--workdir", str(run),
            "--out", base,
            "--format", "elasticsearch",
            "--index", "crawl",
        ]
    )
    assert rc == 0
    assert state["index"]["img-1"]["caption"] == "cap two"
    assert "img-2" not in state["index"]
