"""REST search-engine committers: Elasticsearch bulk + Solr JSON update.

Re-expresses (from scratch, over urllib3) the semantics of the
reference's search connectors:

* ``ElasticsearchCommitter`` (committer/elasticsearch/.../
  ElasticsearchCommitter.java:188-370): batches become NDJSON
  ``POST /_bulk`` bodies — ``{"index":{"_index":...,"_id":...}}`` +
  source line per upsert, ``{"delete":{...}}`` per delete; the
  response is scanned for ``"errors":true`` and per-item errors are
  raised (or logged with ``ignore_response_errors``); non-200 raises;
  ``fix_bad_ids`` truncates ids beyond Elasticsearch's 512-byte limit
  and appends a hash of the truncated tail (fixBadIdValue analog).
* ``SolrCommitter`` (committer/solr/.../SolrCommitter.java:125-215):
  batches become Solr JSON update commands — repeated ``"add"`` /
  ``"delete"`` keys in one object, which Solr's JSON loader accepts —
  POSTed to ``<solr_url>/update?commit=true`` (the reference issues
  UpdateRequest.add/deleteById then commit per pushed batch).

Spark shape (the part the reference cannot have): the op log is
hash-partitioned on the id column and sorted ``(id, seq)`` within
partitions, so every document's operations arrive at exactly ONE sink
partition in seq order — the server's last-write-wins then equals
``resolve_operations``'s fold, with no global sort and no driver
collect. Each partition task streams ``batch_size``-op bulk requests
through a worker-local urllib3 pool (same per-worker pool pattern as
sources/httpfetch). Per-row Python is unavoidable at a REST boundary
(the sink IS a Python protocol conversation, exactly as the
reference's committers are Java HTTP clients); everything upstream of
``foreachPartition`` stays columnar.
"""

from __future__ import annotations

import base64
import hashlib
import json
import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

ES_ID_LIMIT = 512  # bytes — Elasticsearch's hard _id cap


@dataclass(frozen=True)
class RestCommitterConfig:
    """Shared knobs (ElasticsearchCommitterConfig / SolrCommitterConfig
    analogs, trimmed to the protocol-affecting subset)."""

    base_url: str  # http://host:port (ES) or http://host:port/solr/core
    index: str = "docs"  # ES index name (_index in bulk actions)
    id_col: str = "image_id"
    seq_col: str = "seq"
    op_col: str = "op"
    batch_size: int = 200
    timeout_s: float = 30.0
    retries: int = 2
    fix_bad_ids: bool = False
    ignore_response_errors: bool = False
    num_partitions: int | None = None  # default: keep the input's


def fix_bad_id(ref: str, limit: int = ES_ID_LIMIT) -> str:
    """Truncate ids beyond the ES 512-byte cap, appending a hash of
    the full reference so truncated ids stay (practically) unique —
    ElasticsearchCommitter.fixBadIdValue analog, deterministic."""
    raw = ref.encode("utf-8")
    if len(raw) <= limit:
        return ref
    digest = hashlib.sha1(raw).hexdigest()  # 40 ascii bytes
    keep = limit - len(digest) - 1
    # cut on a UTF-8 boundary
    head = raw[:keep].decode("utf-8", errors="ignore")
    return f"{head}!{digest}"


def _jsonable(value):
    """Row value -> JSON-safe value (binary columns inline-base64,
    like the file committers / FeaturedImageResolver STORAGE_INLINE)."""
    if isinstance(value, (bytes, bytearray)):
        return base64.b64encode(bytes(value)).decode("ascii")
    return value


def _row_source(row_dict: dict, cfg: RestCommitterConfig) -> dict:
    skip = {cfg.op_col, cfg.seq_col}
    return {
        k: _jsonable(v) for k, v in row_dict.items() if k not in skip
    }


# ---------------------------------------------------------------------------
# worker-local HTTP plumbing
# ---------------------------------------------------------------------------

_POOLS: dict = {}


def _post(cfg: RestCommitterConfig, path: str, body: bytes,
          content_type: str) -> tuple[int, str]:
    """POST through one PoolManager per worker process (the
    per-fetcher pool analog in sources/httpfetch)."""
    import urllib3

    pool = _POOLS.get("pm")
    if pool is None:
        pool = urllib3.PoolManager(
            maxsize=20, retries=False,
            timeout=urllib3.Timeout(connect=10.0, read=30.0),
        )
        _POOLS["pm"] = pool
    last_exc = None
    for _attempt in range(cfg.retries + 1):
        try:
            r = pool.request(
                "POST", cfg.base_url.rstrip("/") + path, body=body,
                headers={"Content-Type": content_type},
                timeout=urllib3.Timeout(
                    connect=10.0, read=cfg.timeout_s
                ),
            )
            return r.status, r.data.decode("utf-8", errors="replace")
        except Exception as exc:  # noqa: BLE001 — retried, then raised
            last_exc = exc
    raise RuntimeError(
        f"rest committer: POST {path} failed after "
        f"{cfg.retries + 1} attempts: {last_exc}"
    ) from last_exc


def _partition_ops(ops: DataFrame, cfg: RestCommitterConfig) -> DataFrame:
    """Route every id's ops to one partition, in seq order inside it."""
    n = cfg.num_partitions or ops.rdd.getNumPartitions() or 1
    return ops.repartition(n, F.col(cfg.id_col)).sortWithinPartitions(
        cfg.id_col, cfg.seq_col
    )


def _batched(rows, size: int):
    buf = []
    for r in rows:
        buf.append(r)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


# ---------------------------------------------------------------------------
# Elasticsearch
# ---------------------------------------------------------------------------


def _es_handle_response(status: int, text: str,
                        cfg: RestCommitterConfig) -> None:
    """handleResponse analog: non-200 raises; a bulk body with
    ``"errors":true`` has its per-item errors extracted and raised
    (or logged when ignore_response_errors)."""
    if status != 200:
        raise RuntimeError(
            f"es committer: HTTP {status} from /_bulk: {text[:500]}"
        )
    if '"errors":true' not in text[:100].replace(" ", ""):
        return
    errors = []
    try:
        for item in json.loads(text).get("items", []):
            action = item.get("index") or item.get("delete") or {}
            if "error" in action:
                errors.append(action["error"])
    except ValueError:
        errors.append(text[:500])
    msg = f"es committer: bulk returned {len(errors)} errors: {errors[:5]}"
    if cfg.ignore_response_errors:
        log.error(msg)
    else:
        raise RuntimeError(msg)


def es_bulk_committer(ops: DataFrame, cfg: RestCommitterConfig) -> None:
    """ElasticsearchCommitter analog: the op log -> NDJSON /_bulk
    batches, id-partitioned so last-op-per-id wins server-side."""

    def send(rows) -> None:
        for batch in _batched(rows, cfg.batch_size):
            lines = []
            for row in batch:
                d = row.asDict()
                rid = str(d[cfg.id_col])
                if cfg.fix_bad_ids:
                    rid = fix_bad_id(rid)
                if d[cfg.op_col] == "delete":
                    lines.append(json.dumps({
                        "delete": {"_index": cfg.index, "_id": rid}
                    }, separators=(",", ":")))
                else:
                    lines.append(json.dumps({
                        "index": {"_index": cfg.index, "_id": rid}
                    }, separators=(",", ":")))
                    lines.append(json.dumps(
                        _row_source(d, cfg), separators=(",", ":"),
                        default=str,
                    ))
            body = ("\n".join(lines) + "\n").encode("utf-8")
            status, text = _post(
                cfg, "/_bulk", body, "application/x-ndjson"
            )
            _es_handle_response(status, text, cfg)

    _partition_ops(ops, cfg).foreachPartition(send)


# ---------------------------------------------------------------------------
# Solr
# ---------------------------------------------------------------------------


def solr_committer(ops: DataFrame, cfg: RestCommitterConfig) -> None:
    """SolrCommitter analog: batches of JSON update commands (repeated
    add/delete keys — Solr's JSON command stream accepts duplicates)
    POSTed to /update?commit=true, one commit per pushed batch like the
    reference's UpdateRequest.commit."""

    def send(rows) -> None:
        for batch in _batched(rows, cfg.batch_size):
            parts = []
            for row in batch:
                d = row.asDict()
                rid = str(d[cfg.id_col])
                if d[cfg.op_col] == "delete":
                    parts.append(
                        '"delete":' + json.dumps(
                            {"id": rid}, separators=(",", ":")
                        )
                    )
                else:
                    doc = _row_source(d, cfg)
                    doc["id"] = rid
                    parts.append(
                        '"add":' + json.dumps(
                            {"doc": doc}, separators=(",", ":"),
                            default=str,
                        )
                    )
            body = ("{" + ",".join(parts) + "}").encode("utf-8")
            status, text = _post(
                cfg, "/update?commit=true", body, "application/json"
            )
            if status != 200:
                raise RuntimeError(
                    f"solr committer: HTTP {status}: {text[:500]}"
                )
            try:
                hdr = json.loads(text).get("responseHeader", {})
            except ValueError:
                hdr = {}
            if hdr.get("status", 0) != 0:
                msg = f"solr committer: update failed: {text[:500]}"
                if cfg.ignore_response_errors:
                    log.error(msg)
                else:
                    raise RuntimeError(msg)

    _partition_ops(ops, cfg).foreachPartition(send)
