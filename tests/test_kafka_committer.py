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


def _crc32c_slow(data: bytes) -> int:
    """Independent bit-at-a-time CRC-32C — verifies the library's
    table-driven implementation from a second derivation."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


def _read_uvarint(buf: bytes, pos: int):
    z, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos  # zigzag


def _parse_record_batch_v2(buf: bytes):
    """Stub-broker side: decode ONE record batch (magic 2), verifying
    the CRC32C server-side with the independent implementation."""
    _base_off, _blen, _epoch, magic = struct.unpack_from(">qiib", buf, 0)
    assert magic == 2
    (crc,) = struct.unpack_from(">I", buf, 17)
    payload = buf[21:]
    assert _crc32c_slow(payload) == crc, "bad CRC32C"
    _attrs, last_delta, _bts, _mts, pid, pepoch, bseq, count = (
        struct.unpack_from(">hiqqqhii", payload, 0)
    )
    assert pid == -1 and pepoch == -1 and bseq == -1
    pos = 40  # past the fixed payload head (2+4+8+8+8+2+4+4)
    msgs = []
    for _ in range(count):
        rlen, pos = _read_uvarint(payload, pos)
        end = pos + rlen
        pos += 1  # record attributes
        _tsd, pos = _read_uvarint(payload, pos)
        _offd, pos = _read_uvarint(payload, pos)
        klen, pos = _read_uvarint(payload, pos)
        key = payload[pos:pos + klen] if klen >= 0 else None
        pos += max(klen, 0)
        vlen, pos = _read_uvarint(payload, pos)
        value = payload[pos:pos + vlen] if vlen >= 0 else None
        pos += max(vlen, 0)
        nh, pos = _read_uvarint(payload, pos)
        assert nh == 0 and pos == end
        msgs.append((key, value))
    assert last_delta == count - 1
    return msgs


def _parse_produce_v3(frame: bytes):
    """Stub-broker side: parse a v3 produce request frame ->
    (correlation_id, topic, {partition: [(key, value)]})."""
    api_key, api_version, corr = struct.unpack_from(">hhi", frame, 0)
    assert api_key == 0 and api_version == 3
    pos = 8
    (clen,) = struct.unpack_from(">h", frame, pos)
    pos += 2 + clen
    (txlen,) = struct.unpack_from(">h", frame, pos)  # transactional_id
    pos += 2 + max(txlen, 0)
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
        part, rb_len = struct.unpack_from(">ii", frame, pos)
        pos += 8
        parts[part] = _parse_record_batch_v2(frame[pos:pos + rb_len])
        pos += rb_len
    return corr, topic, parts


def _make_broker(produce_max: int):
    """TCP stub broker speaking ApiVersions + Produce v0/v3: applies
    produce requests to an in-memory log per partition;
    state['fail_next'] answers one produce with a non-zero
    error_code; state['produce_versions'] records the api_version of
    each produce request seen."""
    state = {
        "log": {}, "requests": 0, "fail_next": 0,
        "produce_versions": [],
    }
    lock = threading.Lock()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            while True:
                hdr = self._read(4)
                if hdr is None:
                    return
                size = struct.unpack(">i", hdr)[0]
                frame = self._read(size)
                api_key, api_version, corr = struct.unpack_from(
                    ">hhi", frame, 0
                )
                if api_key == 18:  # ApiVersions v0
                    body = struct.pack(">ihi", corr, 0, 1)
                    body += struct.pack(">hhh", 0, 0, produce_max)
                    self.request.sendall(
                        struct.pack(">i", len(body)) + body
                    )
                    continue
                if api_version == 0:
                    corr, topic, parts = _parse_produce(frame)
                else:
                    corr, topic, parts = _parse_produce_v3(frame)
                with lock:
                    state["requests"] += 1
                    state["produce_versions"].append(api_version)
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
                    if api_version == 0:
                        body += struct.pack(">ihq", part, err, 0)
                    else:
                        body += struct.pack(">ihqq", part, err, 0, -1)
                if api_version >= 1:
                    body += struct.pack(">i", 0)  # throttle_time_ms
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
    return srv, state


@pytest.fixture()
def broker():
    """Legacy-only stub (advertises Produce max v0)."""
    srv, state = _make_broker(produce_max=0)
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()


@pytest.fixture()
def broker_v2():
    """Modern stub (advertises Produce up to v9, like Kafka 4.x)."""
    srv, state = _make_broker(produce_max=9)
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


def test_kafka_v2_compacted_topic_matches_resolved_fold(
    spark, broker_v2
):
    """Forced record-batch v2 (Produce v3, magic 2): the compacted
    topic equals the resolved fold, with CRC32C verified server-side
    by an independent implementation."""
    bootstrap, state = broker_v2
    ops = _ops_df(spark)
    cfg = KafkaCommitterConfig(
        bootstrap=bootstrap, batch_size=2, num_spark_partitions=2,
        protocol="v2",
    )
    kafka_committer(ops, cfg)
    assert set(state["produce_versions"]) == {3}
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


def test_kafka_auto_negotiates_by_broker_capability(
    spark, broker, broker_v2
):
    """protocol='auto' asks ApiVersions: a legacy broker gets Produce
    v0 frames, a modern broker gets v3/magic-2 — same topic content."""
    for (bootstrap, state), want_ver in [
        (broker, 0), (broker_v2, 3),
    ]:
        cfg = KafkaCommitterConfig(
            bootstrap=bootstrap, num_spark_partitions=1,
        )
        kafka_committer(_ops_df(spark), cfg)
        assert set(state["produce_versions"]) == {want_ver}, (
            want_ver, state["produce_versions"]
        )
        assert {
            k: v["content"] for k, v in _compact(state["log"]).items()
        } == {"a": "final-a", "c": "final-c", "d": "final-d"}


def test_kafka_v2_broker_error_raises(spark, broker_v2):
    bootstrap, state = broker_v2
    state["fail_next"] = 6
    with pytest.raises(Exception, match="error_code=6"):
        kafka_committer(
            _ops_df(spark),
            KafkaCommitterConfig(
                bootstrap=bootstrap, num_spark_partitions=1,
                protocol="v2",
            ),
        )


def test_varint_zigzag_roundtrip():
    from crawlspark.sinks.kafka import decode_varint, encode_varint

    for n in [0, 1, -1, 63, 64, -64, -65, 127, 128, 300, -300,
              (1 << 31) - 1, -(1 << 31), (1 << 62), -(1 << 62)]:
        buf = encode_varint(n)
        got, pos = decode_varint(buf, 0)
        assert got == n and pos == len(buf), n


def test_crc32c_against_independent_implementation():
    from crawlspark.sinks.kafka import crc32c

    for data in [b"", b"a", b"123456789", bytes(range(256)) * 3]:
        assert crc32c(data) == _crc32c_slow(data)
    # published check value: crc32c("123456789") == 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283
