"""Kafka committer over the wire protocol — stdlib sockets only.

Re-expresses the reference's Kafka connector from scratch
(committer/apachekafka/.../ApacheKafkaCommitter.java): every upsert
becomes a record keyed by the document reference with a JSON document
value (:208-224 appendUpsertRequest — ``id`` first, then the metadata
fields, multi-values as JSON arrays), every delete becomes a NULL
tombstone on the same key (:144-151) — so a log-compacted topic
converges to exactly ``resolve_operations``' fold, which is the whole
point of the design.

No Kafka client library exists in this container, so the producer
speaks the actual Kafka protocol: Produce v0 requests
(size-prefixed frame | api_key=0 | api_version=0 | correlation_id |
client_id | acks | timeout | topic/partition message sets), message
format v0 (crc32 | magic 0 | attributes | key | value) with the CRC
verified server-side in tests. v0 is the legacy protocol version —
modern brokers speak later versions with the same framing discipline;
swapping the encoder is a local change, and an importable
kafka-python producer can replace the socket path entirely via
``send_fn``.

Spark shape (same partitioned-sink contract as rest/sql): ops are
hash-partitioned on the id column and seq-sorted within partitions,
so each document's records are produced in order from exactly one
sink partition. The Kafka partition for a key is
``int(md5(key)[:8], 16) % n_partitions`` — deterministic and
engine-independent (documented deviation from the Java client's
murmur2 default; any fixed keyed partitioner preserves the
per-key-ordering guarantee compaction needs).
"""

from __future__ import annotations

import base64
import json
import logging
import socket
import struct
import zlib
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class KafkaCommitterConfig:
    """ApacheKafkaCommitterConfig analog (bootstrapServers, topicName,
    partitions) plus the wire/batching knobs."""

    bootstrap: str  # host:port
    topic: str = "crawl-docs"
    n_partitions: int = 4  # must match the (pre-created) topic
    id_col: str = "image_id"
    seq_col: str = "seq"
    op_col: str = "op"
    content_col: str = "caption"  # applyTargetContent's source
    batch_size: int = 200
    acks: int = -1  # "all", like the reference's producer
    timeout_ms: int = 30000
    client_id: str = "crawlspark"
    num_spark_partitions: int = 0
    # override transport: send_fn(cfg, partition_msgs) -> None.
    # Any importable callable; e.g. an adapter over kafka-python.
    send_fn: Optional[Callable] = None


# ---------------------------------------------------------------------------
# wire encoding (Produce v0 / message format v0)
# ---------------------------------------------------------------------------


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def encode_message(key: bytes | None, value: bytes | None) -> bytes:
    """Message v0: crc32(zlib) over magic+attributes+key+value."""
    payload = b"\x00\x00" + _bytes(key) + _bytes(value)
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    return struct.pack(">I", crc) + payload


def encode_message_set(msgs: list[tuple[bytes | None, bytes | None]]
                       ) -> bytes:
    out = []
    for key, value in msgs:
        m = encode_message(key, value)
        out.append(struct.pack(">qi", 0, len(m)) + m)  # offset, size
    return b"".join(out)


def encode_produce_request(
    correlation_id: int,
    cfg: KafkaCommitterConfig,
    partition_msgs: dict[int, list[tuple[bytes | None, bytes | None]]],
) -> bytes:
    body = struct.pack(">hi", cfg.acks, cfg.timeout_ms)
    body += struct.pack(">i", 1)  # one topic
    body += _str(cfg.topic)
    body += struct.pack(">i", len(partition_msgs))
    for part in sorted(partition_msgs):
        ms = encode_message_set(partition_msgs[part])
        body += struct.pack(">ii", part, len(ms)) + ms
    header = struct.pack(">hhi", 0, 0, correlation_id) + _str(
        cfg.client_id
    )
    frame = header + body
    return struct.pack(">i", len(frame)) + frame


def parse_produce_response(frame: bytes) -> list[tuple[str, int, int]]:
    """-> [(topic, partition, error_code)] from a v0 response body
    (the 4-byte size prefix already stripped)."""
    pos = 4  # skip correlation_id
    (n_topics,) = struct.unpack_from(">i", frame, pos)
    pos += 4
    out = []
    for _ in range(n_topics):
        (tlen,) = struct.unpack_from(">h", frame, pos)
        pos += 2
        topic = frame[pos:pos + tlen].decode()
        pos += tlen
        (n_parts,) = struct.unpack_from(">i", frame, pos)
        pos += 4
        for _ in range(n_parts):
            part, err, _off = struct.unpack_from(">ihq", frame, pos)
            pos += 14
            out.append((topic, part, err))
    return out


def partition_for(key: str, n_partitions: int) -> int:
    """Deterministic keyed partitioner (md5-prefix mod n)."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % (
        n_partitions
    )


def _jsonable(value):
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode("ascii")
    return value


def record_value(row_dict: dict, cfg: KafkaCommitterConfig) -> bytes:
    """Upsert JSON: ``id`` first, then the fields
    (appendUpsertRequest's shape); the content column doubles as the
    ``content`` field (CommitterUtil.applyTargetContent analog)."""
    skip = {cfg.op_col, cfg.seq_col}
    doc = {"id": row_dict[cfg.id_col]}
    for k, v in row_dict.items():
        if k in skip or k == cfg.id_col or v is None:
            continue
        doc[k] = _jsonable(v)
    if cfg.content_col in row_dict and "content" not in doc:
        if row_dict[cfg.content_col] is not None:
            doc["content"] = row_dict[cfg.content_col]
    return json.dumps(doc, sort_keys=False).encode()


# ---------------------------------------------------------------------------
# transport
# ---------------------------------------------------------------------------


def _socket_send(cfg: KafkaCommitterConfig, partition_msgs) -> None:
    host, _, port = cfg.bootstrap.partition(":")
    with socket.create_connection(
        (host, int(port)), timeout=cfg.timeout_ms / 1000
    ) as sock:
        req = encode_produce_request(1, cfg, partition_msgs)
        sock.sendall(req)
        if cfg.acks == 0:
            return
        size = struct.unpack(">i", _read_n(sock, 4))[0]
        frame = _read_n(sock, size)
        for topic, part, err in parse_produce_response(frame):
            if err != 0:
                raise RuntimeError(
                    f"kafka committer: produce to {topic}[{part}] "
                    f"failed with error_code={err}"
                )


def _read_n(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise RuntimeError("kafka committer: connection closed")
        buf += chunk
    return buf


# ---------------------------------------------------------------------------
# the committer
# ---------------------------------------------------------------------------


def kafka_committer(ops: DataFrame, cfg: KafkaCommitterConfig) -> None:
    """Produce the op log to the topic; a compacted view of the topic
    equals ``resolve_operations(ops)`` (tombstones drop deleted ids).
    """
    n = cfg.num_spark_partitions or ops.rdd.getNumPartitions() or 1
    routed = ops.repartition(n, F.col(cfg.id_col)).sortWithinPartitions(
        cfg.id_col, cfg.seq_col
    )
    send = cfg.send_fn or _socket_send

    def produce(rows) -> None:
        batch: dict[int, list] = {}
        count = 0

        def flush():
            nonlocal batch, count
            if count:
                send(cfg, batch)
            batch, count = {}, 0

        for row in rows:
            d = row.asDict(recursive=True)
            key = d[cfg.id_col]
            value = (
                None
                if d[cfg.op_col] == "delete"
                else record_value(d, cfg)
            )
            part = partition_for(key, cfg.n_partitions)
            batch.setdefault(part, []).append((key.encode(), value))
            count += 1
            if count >= cfg.batch_size:
                flush()
        flush()

    routed.foreachPartition(produce)
