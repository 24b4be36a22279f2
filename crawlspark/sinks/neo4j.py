"""Neo4j committer over the Bolt protocol — stdlib sockets only.

Re-expresses the reference's Neo4j connector from scratch
(committer/neo4j/.../Neo4jClient.java, Neo4jCommitterConfig.java):

* every upsert sets ``nodeIdProperty`` (default ``id``) to the
  document reference and ``nodeContentProperty`` (default
  ``content``) to the content, then runs the configured
  ``upsertCypher`` with the metadata fields as query parameters
  (Neo4jClient.java:115-133 postUpsert);
* every delete sets the id property and runs ``deleteCypher``
  (Neo4jClient.java:135-146 postDelete);
* multi-valued fields join on ``multiValuesJoiner``
  (Neo4jClient.java:148-161 toObjectMap, default ``|`` per
  Neo4jCommitterConfig.java:62-64);
* ``optionalParameters`` missing from a document are bound to null
  so the server never rejects the statement for an absent parameter
  (Neo4jClient.java:158-160, Neo4jCommitterConfig.java:92-96).

No Neo4j driver exists in this container, so the client speaks the
actual public Bolt wire protocol, version 4.4: the 0x6060B017
handshake, PackStream v2 value encoding, chunked message framing,
HELLO with basic-or-none auth, and explicit write transactions
(BEGIN / RUN / PULL / COMMIT) exactly as the reference's
``session.executeWrite(tx -> tx.run(...))`` does. A driver library,
when importable, can replace the socket path entirely via
``session_factory``.

The reference leaves the Cypher entirely to the user; for
out-of-the-box usability this committer ships a default pair with
the semantics every Norconex example config uses — MERGE on the id
property, properties refreshed from the full parameter map (bound
as ``$doc``), and DETACH DELETE on the id:

    MERGE (n:Document {id: $id}) SET n += $doc
    MATCH (n:Document {id: $id}) DETACH DELETE n

so a populated graph converges to exactly ``resolve_operations``'
fold.

Spark shape (same partitioned-sink contract as rest/sql/kafka): ops
are hash-partitioned on the id column and seq-sorted within
partitions, so each document's operations replay in order from
exactly ONE sink partition and MERGE last-write-wins equals the
fold with no global sort and no driver collect. Per-row Python is
unavoidable at a Bolt boundary (the sink IS a Cypher conversation,
as the reference's committer is a driver-session loop); everything
upstream of ``foreachPartition`` stays columnar.
"""

from __future__ import annotations

import logging
import socket
import struct
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Reference defaults (Neo4jCommitterConfig.java:47-50,62-64).
DEFAULT_NODE_ID_PROPERTY = "id"
DEFAULT_NODE_CONTENT_PROPERTY = "content"
DEFAULT_MULTI_VALUES_JOINER = "|"

# Usability defaults the reference leaves to the user (the javadoc's
# "typically, you want to use MERGE and the nodeIdProperty value";
# Neo4jCommitterConfig.java:77-90). ``$doc`` carries the full
# parameter map so SET += refreshes every field in one statement.
DEFAULT_UPSERT_CYPHER = (
    "MERGE (n:Document {id: $id}) SET n += $doc"
)
DEFAULT_DELETE_CYPHER = (
    "MATCH (n:Document {id: $id}) DETACH DELETE n"
)

BOLT_MAGIC = b"\x60\x60\xb0\x17"
BOLT_VERSION = (4, 4)

# message signatures (Bolt 4.4 spec)
MSG_HELLO = 0x01
MSG_RUN = 0x10
MSG_BEGIN = 0x11
MSG_COMMIT = 0x12
MSG_ROLLBACK = 0x13
MSG_RESET = 0x0F
MSG_GOODBYE = 0x02
MSG_PULL = 0x3F
MSG_SUCCESS = 0x70
MSG_RECORD = 0x71
MSG_IGNORED = 0x7E
MSG_FAILURE = 0x7F


@dataclass(frozen=True)
class Neo4jCommitterConfig:
    """Neo4jCommitterConfig analog (uri, database, credentials,
    multiValuesJoiner, nodeIdProperty, nodeContentProperty,
    upsertCypher, deleteCypher, optionalParameters) plus the op-log
    column and batching knobs shared by the other sinks."""

    uri: str  # bolt://host:port (the scheme is informative)
    database: Optional[str] = None
    username: Optional[str] = None
    password: Optional[str] = None
    multi_values_joiner: str = DEFAULT_MULTI_VALUES_JOINER
    node_id_property: str = DEFAULT_NODE_ID_PROPERTY
    node_content_property: str = DEFAULT_NODE_CONTENT_PROPERTY
    # Delivery is AT-LEAST-ONCE: batched transactions mean a
    # mid-batch failure leaves earlier committed batches applied, and
    # a Spark task retry replays them. A custom upsert_cypher must
    # therefore be replay-idempotent — MERGE-on-id (the default), not
    # CREATE — and delete_cypher must tolerate an absent node.
    upsert_cypher: str = DEFAULT_UPSERT_CYPHER
    delete_cypher: str = DEFAULT_DELETE_CYPHER
    optional_parameters: tuple = ()
    id_col: str = "image_id"
    seq_col: str = "seq"
    op_col: str = "op"
    content_col: str = "caption"  # column bound as nodeContentProperty
    batch_size: int = 200  # ops per explicit transaction
    timeout_s: float = 30.0
    user_agent: str = "crawlspark-neo4j/1.0"
    num_spark_partitions: int = 0
    # override transport: session_factory(cfg) -> object with
    # run(cypher, params), begin(), commit(), close(). Any importable
    # callable; e.g. an adapter over the neo4j driver package.
    session_factory: Optional[Callable] = None


# ---------------------------------------------------------------------------
# PackStream v2 (public Bolt spec) — the subset a committer speaks
# ---------------------------------------------------------------------------


def ps_encode(value) -> bytes:
    """Python value -> PackStream bytes."""
    if value is None:
        return b"\xc0"
    if value is True:
        return b"\xc3"
    if value is False:
        return b"\xc2"
    if isinstance(value, int):
        if -16 <= value < 128:
            return struct.pack(">b", value)
        if -128 <= value < 128:
            return b"\xc8" + struct.pack(">b", value)
        if -32768 <= value < 32768:
            return b"\xc9" + struct.pack(">h", value)
        if -2147483648 <= value < 2147483648:
            return b"\xca" + struct.pack(">i", value)
        return b"\xcb" + struct.pack(">q", value)
    if isinstance(value, float):
        return b"\xc1" + struct.pack(">d", value)
    if isinstance(value, str):
        b = value.encode("utf-8")
        n = len(b)
        if n < 16:
            return bytes([0x80 + n]) + b
        if n < 256:
            return b"\xd0" + struct.pack(">B", n) + b
        if n < 65536:
            return b"\xd1" + struct.pack(">H", n) + b
        return b"\xd2" + struct.pack(">I", n) + b
    if isinstance(value, (bytes, bytearray)):
        b = bytes(value)
        n = len(b)
        if n < 256:
            return b"\xcc" + struct.pack(">B", n) + b
        if n < 65536:
            return b"\xcd" + struct.pack(">H", n) + b
        return b"\xce" + struct.pack(">I", n) + b
    if isinstance(value, (list, tuple)):
        n = len(value)
        if n < 16:
            head = bytes([0x90 + n])
        elif n < 256:
            head = b"\xd4" + struct.pack(">B", n)
        elif n < 65536:
            head = b"\xd5" + struct.pack(">H", n)
        else:
            head = b"\xd6" + struct.pack(">I", n)
        return head + b"".join(ps_encode(v) for v in value)
    if isinstance(value, dict):
        n = len(value)
        if n < 16:
            head = bytes([0xA0 + n])
        elif n < 256:
            head = b"\xd8" + struct.pack(">B", n)
        elif n < 65536:
            head = b"\xd9" + struct.pack(">H", n)
        else:
            head = b"\xda" + struct.pack(">I", n)
        return head + b"".join(
            ps_encode(str(k)) + ps_encode(v) for k, v in value.items()
        )
    raise TypeError(f"neo4j committer: unencodable type {type(value)!r}")


def ps_struct(signature: int, *fields_) -> bytes:
    """PackStream structure (tiny struct; Bolt messages have <16
    fields by definition)."""
    return bytes([0xB0 + len(fields_), signature]) + b"".join(
        ps_encode(f) for f in fields_
    )


def ps_decode(buf: bytes, pos: int = 0):
    """PackStream bytes -> (value, next_pos). Structures decode to
    ``(signature, [fields])`` tuples."""
    marker = buf[pos]
    pos += 1
    if marker == 0xC0:
        return None, pos
    if marker == 0xC2:
        return False, pos
    if marker == 0xC3:
        return True, pos
    if marker < 0x80:  # tiny positive int
        return marker, pos
    if marker >= 0xF0:  # tiny negative int
        return marker - 0x100, pos
    if marker == 0xC8:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if marker == 0xC9:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if marker == 0xCA:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if marker == 0xCB:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if marker == 0xC1:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if marker in (0xCC, 0xCD, 0xCE):
        width = {0xCC: "B", 0xCD: "H", 0xCE: "I"}[marker]
        n = struct.unpack_from(">" + width, buf, pos)[0]
        pos += struct.calcsize(width)
        return bytes(buf[pos:pos + n]), pos + n
    if 0x80 <= marker < 0x90 or marker in (0xD0, 0xD1, 0xD2):
        if marker < 0x90:
            n = marker - 0x80
        else:
            width = {0xD0: "B", 0xD1: "H", 0xD2: "I"}[marker]
            n = struct.unpack_from(">" + width, buf, pos)[0]
            pos += struct.calcsize(width)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if 0x90 <= marker < 0xA0 or marker in (0xD4, 0xD5, 0xD6):
        if marker < 0xA0:
            n = marker - 0x90
        else:
            width = {0xD4: "B", 0xD5: "H", 0xD6: "I"}[marker]
            n = struct.unpack_from(">" + width, buf, pos)[0]
            pos += struct.calcsize(width)
        out = []
        for _ in range(n):
            v, pos = ps_decode(buf, pos)
            out.append(v)
        return out, pos
    if 0xA0 <= marker < 0xB0 or marker in (0xD8, 0xD9, 0xDA):
        if marker < 0xB0:
            n = marker - 0xA0
        else:
            width = {0xD8: "B", 0xD9: "H", 0xDA: "I"}[marker]
            n = struct.unpack_from(">" + width, buf, pos)[0]
            pos += struct.calcsize(width)
        out = {}
        for _ in range(n):
            k, pos = ps_decode(buf, pos)
            v, pos = ps_decode(buf, pos)
            out[k] = v
        return out, pos
    if 0xB0 <= marker < 0xC0:
        n = marker - 0xB0
        sig = buf[pos]
        pos += 1
        fields_ = []
        for _ in range(n):
            v, pos = ps_decode(buf, pos)
            fields_.append(v)
        return (sig, fields_), pos
    raise ValueError(
        f"neo4j committer: bad PackStream marker 0x{marker:02x}"
    )


# ---------------------------------------------------------------------------
# Bolt transport (chunked framing + handshake + request/response)
# ---------------------------------------------------------------------------


def chunk(message: bytes) -> bytes:
    """Message -> chunked framing: 2-byte big-endian size headers,
    65535-byte max chunks, 0x0000 end marker."""
    out = []
    for i in range(0, len(message), 0xFFFF):
        part = message[i:i + 0xFFFF]
        out.append(struct.pack(">H", len(part)) + part)
    out.append(b"\x00\x00")
    return b"".join(out)


class _BoltSession:
    """One Bolt 4.4 connection: handshake + HELLO on connect, then
    explicit transactions of autocommit-free RUN/PULL pairs."""

    def __init__(self, cfg: Neo4jCommitterConfig):
        self.cfg = cfg
        host, port = _parse_uri(cfg.uri)
        self.sock = socket.create_connection(
            (host, port), timeout=cfg.timeout_s
        )
        proposal = b"\x00\x00" + bytes(
            [BOLT_VERSION[1], BOLT_VERSION[0]]  # 00 00 04 04
        )
        self.sock.sendall(
            BOLT_MAGIC + proposal + b"\x00\x00\x00\x00" * 3
        )
        chosen = self._read_n(4)
        if chosen[2:] != bytes([BOLT_VERSION[1], BOLT_VERSION[0]]):
            raise RuntimeError(
                f"neo4j committer: server proposed unsupported Bolt "
                f"version {chosen.hex()}"
            )
        extra = {"user_agent": cfg.user_agent}
        if cfg.username is not None:
            extra.update(
                scheme="basic",
                principal=cfg.username,
                credentials=cfg.password or "",
            )
        else:
            extra["scheme"] = "none"
        self._request(ps_struct(MSG_HELLO, extra))

    # --- framing ---------------------------------------------------------

    def _read_n(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            part = self.sock.recv(n - len(buf))
            if not part:
                raise RuntimeError(
                    "neo4j committer: connection closed by server"
                )
            buf += part
        return buf

    def _read_message(self) -> bytes:
        out = b""
        while True:
            size = struct.unpack(">H", self._read_n(2))[0]
            if size == 0:
                if out:
                    return out
                continue  # noop keep-alive chunk
            out += self._read_n(size)

    def _request(self, message: bytes) -> dict:
        """Send one message, consume RECORDs, return the SUCCESS
        metadata; FAILURE raises with the server's code/message."""
        self.sock.sendall(chunk(message))
        while True:
            sig, fields_ = ps_decode(self._read_message())[0]
            if sig == MSG_RECORD:
                continue  # committer statements return no rows we use
            if sig == MSG_SUCCESS:
                return fields_[0] if fields_ else {}
            if sig == MSG_IGNORED:
                raise RuntimeError(
                    "neo4j committer: request ignored (failed tx state)"
                )
            if sig == MSG_FAILURE:
                meta = fields_[0] if fields_ else {}
                raise RuntimeError(
                    "neo4j committer: server failure "
                    f"{meta.get('code')}: {meta.get('message')}"
                )
            raise RuntimeError(
                f"neo4j committer: unexpected response 0x{sig:02x}"
            )

    # --- the session API the committer uses ------------------------------

    def begin(self) -> None:
        extra = {}
        if self.cfg.database:
            extra["db"] = self.cfg.database
        self._request(ps_struct(MSG_BEGIN, extra))

    def run(self, cypher: str, params: dict) -> None:
        self._request(ps_struct(MSG_RUN, cypher, params, {}))
        self._request(ps_struct(MSG_PULL, {"n": -1}))

    def commit(self) -> None:
        self._request(ps_struct(MSG_COMMIT))

    def close(self) -> None:
        try:
            self.sock.sendall(chunk(ps_struct(MSG_GOODBYE)))
        except Exception:  # noqa: BLE001 — goodbye is best-effort
            pass
        self.sock.close()


def _parse_uri(uri: str) -> tuple[str, int]:
    rest = uri.split("://", 1)[-1]
    host, _, port = rest.partition(":")
    return host, int(port or 7687)


# ---------------------------------------------------------------------------
# reference-semantics parameter map
# ---------------------------------------------------------------------------


def to_object_map(row_dict: dict, cfg: Neo4jCommitterConfig) -> dict:
    """Op-log row -> Cypher parameter map (toObjectMap,
    Neo4jClient.java:148-161): multi-values join on the configured
    joiner, the id/content properties are (over)written from the
    reference and content column (postUpsert :115-123), optional
    parameters absent from the document bind to null, and ``$doc``
    carries the whole map for the default ``SET n += $doc``."""
    skip = {cfg.op_col, cfg.seq_col}
    params: dict = {}
    for k, v in row_dict.items():
        if k in skip or v is None:
            continue
        if isinstance(v, (list, tuple)) and cfg.multi_values_joiner:
            v = cfg.multi_values_joiner.join(
                "" if x is None else str(x) for x in v
            )
        params[k] = v
    if cfg.node_id_property:
        params[cfg.node_id_property] = row_dict[cfg.id_col]
    if cfg.node_content_property:
        content = row_dict.get(cfg.content_col)
        if content is not None:
            params[cfg.node_content_property] = content
    for opt in cfg.optional_parameters:
        params.setdefault(opt, None)
    if "doc" in params:
        # 'doc' is the reserved whole-map parameter; silently
        # clobbering a real column of that name would drop data
        raise ValueError(
            "column/metadata key 'doc' collides with the reserved "
            "$doc Cypher parameter (the whole-document map); rename "
            "the column before committing to Neo4j"
        )
    params["doc"] = dict(params)
    return params


# ---------------------------------------------------------------------------
# the committer
# ---------------------------------------------------------------------------


def neo4j_committer(ops: DataFrame, cfg: Neo4jCommitterConfig) -> None:
    """Replay the op log into the graph; with the default Cypher the
    final node set equals ``resolve_operations(ops)``."""
    n = cfg.num_spark_partitions or ops.rdd.getNumPartitions() or 1
    routed = ops.repartition(n, F.col(cfg.id_col)).sortWithinPartitions(
        cfg.id_col, cfg.seq_col
    )
    factory = cfg.session_factory or _BoltSession

    def send(rows) -> None:
        session = None
        pending = 0
        ok = False
        try:
            for row in rows:
                if session is None:
                    session = factory(cfg)
                    session.begin()
                d = row.asDict(recursive=True)
                params = to_object_map(d, cfg)
                if d[cfg.op_col] == "delete":
                    session.run(cfg.delete_cypher, params)
                else:
                    session.run(cfg.upsert_cypher, params)
                pending += 1
                if pending >= cfg.batch_size:
                    session.commit()
                    session.begin()
                    pending = 0
            ok = True
        finally:
            if session is not None:
                # commit the tail only on a clean pass — after a
                # failure the tx is dead server-side and a COMMIT
                # would answer IGNORED, masking the original error
                if ok and pending:
                    session.commit()
                session.close()

    routed.foreachPartition(send)
