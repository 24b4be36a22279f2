"""Kafka committer against a live stub broker speaking the v0 wire
protocol over real sockets: the produced, log-compacted topic must
equal resolve_operations' fold (upserts keyed by id, deletes as null
tombstones), CRCs must verify, and broker error codes must raise.
Reference contract: ApacheKafkaCommitter.java:117-176 (key=reference,
JSON value / null tombstone), :208-224 (JSON shape, id first)."""

import json
import socketserver
import struct
import threading
import zlib

import pytest

from crawlspark.sinks.committers import resolve_operations
from crawlspark.sinks.kafka import (
    KafkaCommitterConfig,
    kafka_committer,
    parse_produce_response,
    partition_for,
)


def _parse_produce(frame: bytes):
    """Stub-broker side: parse a v0 produce request frame (no size
    prefix) -> (correlation_id, topic, {partition: [(key, value)]})."""
    api_key, api_version, corr = struct.unpack_from(">hhi", frame, 0)
    assert api_key == 0 and api_version == 0
    pos = 8
    (clen,) = struct.unpack_from(">h", frame, pos)
    pos += 2 + clen
    pos += 2 + 4  # acks, timeout
    (n_topics,) = struct.unpack_from(">i", frame, pos)
    pos += 4
    assert n_topics == 1
    (tlen,) = struct.unpack_from(">h", frame, pos)
    pos += 2
    topic = frame[pos:pos + tlen].decode()
    pos += tlen
    (n_parts,) = struct.unpack_from(">i", frame, pos)
    pos += 4
    parts = {}
    for _ in range(n_parts):
        part, ms_len = struct.unpack_from(">ii", frame, pos)
        pos += 8
        end = pos + ms_len
        msgs = []
        while pos < end:
            _off, msize = struct.unpack_from(">qi", frame, pos)
            pos += 12
            crc, = struct.unpack_from(">I", frame, pos)
            payload = frame[pos + 4:pos + msize]
            assert zlib.crc32(payload) & 0xFFFFFFFF == crc, "bad CRC"
            magic, attrs = struct.unpack_from(">bb", payload, 0)
            assert magic == 0 and attrs == 0
            p = 2
            (klen,) = struct.unpack_from(">i", payload, p)
            p += 4
            key = payload[p:p + klen] if klen >= 0 else None
            p += max(klen, 0)
            (vlen,) = struct.unpack_from(">i", payload, p)
            p += 4
            value = payload[p:p + vlen] if vlen >= 0 else None
            msgs.append((key, value))
            pos += msize
        parts[part] = msgs
    return corr, topic, parts


@pytest.fixture()
def broker():
    """TCP stub broker: applies produce requests to an in-memory log
    per (partition); state['fail_next'] answers one request with a
    non-zero error_code."""
    state = {"log": {}, "requests": 0, "fail_next": 0}
    lock = threading.Lock()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            while True:
                hdr = self._read(4)
                if hdr is None:
                    return
                size = struct.unpack(">i", hdr)[0]
                frame = self._read(size)
                corr, topic, parts = _parse_produce(frame)
                with lock:
                    state["requests"] += 1
                    err = state["fail_next"]
                    state["fail_next"] = 0
                    if not err:
                        for part, msgs in parts.items():
                            state["log"].setdefault(part, []).extend(
                                msgs
                            )
                body = struct.pack(">ii", corr, 1)
                body += struct.pack(">h", len(topic)) + topic.encode()
                body += struct.pack(">i", len(parts))
                for part in sorted(parts):
                    body += struct.pack(">ihq", part, err, 0)
                self.request.sendall(
                    struct.pack(">i", len(body)) + body
                )

        def _read(self, n):
            buf = b""
            while len(buf) < n:
                chunk = self.request.recv(n - len(buf))
                if not chunk:
                    return None
                buf += chunk
            return buf

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", state
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


def _compact(log: dict) -> dict:
    """Kafka log compaction: last record per key wins, null tombstones
    drop the key."""
    out = {}
    for part, msgs in log.items():
        for key, value in msgs:
            k = key.decode()
            if value is None:
                out.pop(k, None)
            else:
                out[k] = json.loads(value)
    return out


def test_kafka_compacted_topic_matches_resolved_fold(spark, broker):
    bootstrap, state = broker
    ops = _ops_df(spark)
    cfg = KafkaCommitterConfig(
        bootstrap=bootstrap, batch_size=2, num_spark_partitions=2
    )
    kafka_committer(ops, cfg)
    got = {
        k: v["content"] for k, v in _compact(state["log"]).items()
    }
    want = {
        r["image_id"]: r["caption"]
        for r in resolve_operations(ops).collect()
    }
    assert got == want == {
        "a": "final-a", "c": "final-c", "d": "final-d",
    }
    # JSON shape: id first, content mapped from the content column
    doc = _compact(state["log"])["a"]
    assert list(doc)[0] == "id" and doc["id"] == "a"
    # every record for a key landed on its deterministic partition
    for part, msgs in state["log"].items():
        for key, _ in msgs:
            assert partition_for(key.decode(), cfg.n_partitions) == part


def test_kafka_broker_error_raises(spark, broker):
    bootstrap, state = broker
    state["fail_next"] = 6  # NOT_LEADER_FOR_PARTITION
    with pytest.raises(Exception, match="error_code=6"):
        kafka_committer(
            _ops_df(spark),
            KafkaCommitterConfig(
                bootstrap=bootstrap, num_spark_partitions=1
            ),
        )


def test_parse_produce_response_roundtrip():
    body = struct.pack(">ii", 9, 1)
    body += struct.pack(">h", 3) + b"top"
    body += struct.pack(">i", 2)
    body += struct.pack(">ihq", 0, 0, 10)
    body += struct.pack(">ihq", 3, 2, 0)
    assert parse_produce_response(body) == [
        ("top", 0, 0), ("top", 3, 2),
    ]
