"""Metadata checksummers shared by the engine and the oracle.

From-scratch analogs of the reference's metadata checksum operators
(crawler/web/.../checksum/impl/LastModifiedMetadataChecksummer.java:34-46
— the web crawler's DEFAULT metadata checksummer,
WebCrawlerConfig.java:557 — and
core/.../checksum/impl/GenericMetadataChecksummer.java): a checksum
computed from response HEADERS only, so an incremental recrawl can
decide UNMODIFIED from a HEAD request (or a column-pruned scan of the
fetch table — the dataflow equivalent) without downloading or parsing
the body.

Kinds:

* ``last_modified`` — the exact Last-Modified header value, null when
  absent (LastModifiedMetadataChecksummer.doCreateMetaChecksum);
* ``etag`` — the exact ETag header value;
* ``generic`` — md5 over the configured header fields joined as
  ``k=v`` pairs (GenericMetadataChecksummer's sourceFields combine),
  null when every field is absent.

Both implementations (python dict-in, Spark Column-in) are kept in
this one module so engine/oracle parity is structural.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

HEADER_FIELDS = ("last_modified", "etag")

# ledger outcomes whose cached checksums (content + metadata) carry
# into the next run's baseline: rows that reached their checksum stage
# (UNMODIFIED/DUPLICATE are rejected *after* the checksum is stored on
# the entry), PREMATURE rows (prior cached state kept), FILTERED and
# graced spoiled rows (the committed doc still exists; the ledger
# writes null when it was actually deleted). NONCANONICAL/NOINDEX stay
# excluded — they reject before any checksum stage.
CACHED_OUTCOMES = (
    "NEW",
    "MODIFIED",
    "UNMODIFIED",
    "DUPLICATE",
    "PREMATURE",
    "FILTERED",
    "NOT_FOUND",
    "BAD_STATUS",
)

# ProcessingOutcome.isGoodState (core/.../ledger/ProcessingOutcome
# .java:110-112): outcomes that leave the entry in a good state — a
# redirect pointing at such a target is never re-queued
GOOD_OUTCOMES = ("NEW", "MODIFIED", "UNMODIFIED", "PREMATURE")


def meta_checksum(
    headers: dict, kind: str, fields: tuple[str, ...] = HEADER_FIELDS
) -> str | None:
    """Python-side metadata checksum over a headers dict."""
    if kind == "last_modified":
        v = headers.get("last_modified")
        return v if v else None
    if kind == "etag":
        v = headers.get("etag")
        return v if v else None
    if kind == "generic":
        parts = [
            f"{f}={headers.get(f)}" for f in fields if headers.get(f)
        ]
        if not parts:
            return None
        return hashlib.md5(";".join(parts).encode()).hexdigest()
    raise ValueError(f"unknown metadata checksummer: {kind}")


def meta_checksum_col(kind: str, fields: tuple[str, ...] = HEADER_FIELDS):
    """Spark Column with semantics identical to ``meta_checksum``
    (assumes the header columns exist on the input frame)."""
    if kind == "last_modified":
        return F.when(F.col("last_modified") != "", F.col("last_modified"))
    if kind == "etag":
        return F.when(F.col("etag") != "", F.col("etag"))
    if kind == "generic":
        parts = [
            F.when(
                F.col(f).isNotNull() & (F.col(f) != ""),
                F.concat(F.lit(f + "="), F.col(f)),
            )
            for f in fields
        ]
        joined = F.concat_ws(";", *parts)
        # concat_ws skips nulls; empty string means every field absent
        return F.when(joined != "", F.md5(joined))
    raise ValueError(f"unknown metadata checksummer: {kind}")
