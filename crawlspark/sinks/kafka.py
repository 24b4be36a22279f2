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
speaks the actual Kafka protocol. Two produce encodings are
implemented, selected per-connection by ApiVersions negotiation
(api_key 18 v0 — the bootstrap handshake every real client does):

* **Produce v3 + record batch v2 (magic 2)** — the modern format:
  varint-delta records, CRC32C over the batch payload, producer-id /
  epoch / base-sequence fields (set to -1: idempotence off). Brokers
  from 0.11 through current 4.x accept it; Kafka 4.x REMOVED all
  pre-2.1 protocol versions (KIP-896), so this is the path real
  brokers take.
* **Produce v0 + message format v0** (crc32 | magic 0 | attributes |
  key | value) — the legacy fallback for ancient brokers.

``protocol="auto"`` (default) negotiates; ``"v2"``/``"v0"`` force an
encoding. An importable kafka-python producer can replace the socket
path entirely via ``send_fn``.

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
import time
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
    # "auto": ApiVersions handshake picks v2 (Produce v3, record
    # batch magic 2) when the broker advertises Produce >= 3, else
    # v0. "v2"/"v0" skip the handshake and force an encoding.
    protocol: str = "auto"
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


# ---------------------------------------------------------------------------
# wire encoding (Produce v3 / record batch v2, magic 2) + ApiVersions
# ---------------------------------------------------------------------------


def _make_crc32c_table() -> list[int]:
    # CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the checksum
    # record batch v2 mandates; not in zlib, so table-driven here
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def encode_varint(n: int) -> bytes:
    """Zigzag + LEB128 varint (record batch v2's integer encoding)."""
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """-> (value, next_pos); inverse of encode_varint."""
    z = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (z >> 1) ^ -(z & 1)
    return n, pos


def _record_v2(offset_delta: int, key: bytes | None,
               value: bytes | None) -> bytes:
    body = b"\x00"  # attributes
    body += encode_varint(0)  # timestampDelta
    body += encode_varint(offset_delta)
    body += encode_varint(-1 if key is None else len(key))
    body += key or b""
    body += encode_varint(-1 if value is None else len(value))
    body += value or b""
    body += encode_varint(0)  # headers
    return encode_varint(len(body)) + body


def encode_record_batch_v2(
    msgs: list[tuple[bytes | None, bytes | None]], base_ts: int = 0
) -> bytes:
    """One record batch, magic 2: baseOffset | batchLength |
    partitionLeaderEpoch | magic | crc32c(payload) | payload.
    Producer id/epoch/sequence are -1 (no idempotence)."""
    records = b"".join(
        _record_v2(i, k, v) for i, (k, v) in enumerate(msgs)
    )
    payload = struct.pack(
        ">hiqqqhii",
        0,              # attributes: no compression, create-time
        len(msgs) - 1,  # lastOffsetDelta
        base_ts,        # baseTimestamp
        base_ts,        # maxTimestamp
        -1,             # producerId
        -1,             # producerEpoch
        -1,             # baseSequence
        len(msgs),
    ) + records
    inner = struct.pack(
        ">iBI", -1, 2, crc32c(payload)
    ) + payload
    return struct.pack(">qi", 0, len(inner)) + inner


def encode_produce_request_v3(
    correlation_id: int,
    cfg: KafkaCommitterConfig,
    partition_msgs: dict[int, list[tuple[bytes | None, bytes | None]]],
    base_ts: int = 0,
) -> bytes:
    body = _str(None)  # transactional_id
    body += struct.pack(">hi", cfg.acks, cfg.timeout_ms)
    body += struct.pack(">i", 1) + _str(cfg.topic)
    body += struct.pack(">i", len(partition_msgs))
    for part in sorted(partition_msgs):
        rb = encode_record_batch_v2(partition_msgs[part], base_ts)
        body += struct.pack(">ii", part, len(rb)) + rb
    header = struct.pack(">hhi", 0, 3, correlation_id) + _str(
        cfg.client_id
    )
    frame = header + body
    return struct.pack(">i", len(frame)) + frame


def parse_produce_response_v3(frame: bytes) -> list[tuple[str, int, int]]:
    """-> [(topic, partition, error_code)] from a v3 response body
    (size prefix stripped; throttle_time_ms trails the array)."""
    pos = 4  # correlation_id
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
            part, err, _off, _ts = struct.unpack_from(
                ">ihqq", frame, pos
            )
            pos += 22
            out.append((topic, part, err))
    return out


def encode_api_versions_request(
    correlation_id: int, client_id: str
) -> bytes:
    header = struct.pack(">hhi", 18, 0, correlation_id) + _str(
        client_id
    )
    return struct.pack(">i", len(header)) + header


def parse_api_versions_response(
    frame: bytes,
) -> tuple[int, dict[int, tuple[int, int]]]:
    """-> (error_code, {api_key: (min_version, max_version)})."""
    pos = 4  # correlation_id
    err, n = struct.unpack_from(">hi", frame, pos)
    pos += 6
    vers = {}
    for _ in range(n):
        k, lo, hi = struct.unpack_from(">hhh", frame, pos)
        pos += 6
        vers[k] = (lo, hi)
    return err, vers


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
        proto = cfg.protocol
        if proto == "auto":
            # the same bootstrap handshake every real client runs:
            # Kafka 4.x rejects Produce < v3 (KIP-896), ancient
            # brokers only speak v0 — ask instead of guessing
            sock.sendall(
                encode_api_versions_request(0, cfg.client_id)
            )
            size = struct.unpack(">i", _read_n(sock, 4))[0]
            err, vers = parse_api_versions_response(
                _read_n(sock, size)
            )
            if err != 0:
                raise RuntimeError(
                    f"kafka committer: ApiVersions failed with "
                    f"error_code={err}"
                )
            _lo, hi = vers.get(0, (0, 0))
            proto = "v2" if hi >= 3 else "v0"
        if proto == "v2":
            req = encode_produce_request_v3(
                1, cfg, partition_msgs,
                base_ts=int(time.time() * 1000),
            )
            parse = parse_produce_response_v3
        elif proto == "v0":
            req = encode_produce_request(1, cfg, partition_msgs)
            parse = parse_produce_response
        else:
            raise ValueError(
                f"kafka committer: unknown protocol {cfg.protocol!r}"
                " (use 'auto', 'v2' or 'v0')"
            )
        sock.sendall(req)
        if cfg.acks == 0:
            return
        size = struct.unpack(">i", _read_n(sock, 4))[0]
        frame = _read_n(sock, size)
        for topic, part, err in parse(frame):
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
