"""Committer sinks — the downstream half of the reference's committer
stack re-expressed as DataFrame writes.

Reference surface (SURVEY.md §2.12): the ``Committer`` interface
(committer/core/.../Committer.java:22-70 — init/accept/upsert/delete/
clean/close), ``AbstractBatchCommitter`` batching (native to Spark
writes), ``MemoryCommitter`` (the test oracle,
committer/core/.../impl/MemoryCommitter.java), and the file committers
(CsvFileCommitter / JsonFileCommitter / XmlFileCommitter under
committer/core/.../fs/impl/). Search/DB connectors (Solr, Elastic,
Kafka, SQL, Neo4j, ...) are connector slots: each is ``resolve() ->
df.write.format(...)`` with the same resolved-state input contract.

The engine emits an *operation log* (the ``documents`` table: one row
per upsert/delete in ``seq`` order). ``resolve_operations`` folds that
log into final state — last op per key wins, deletes drop the key —
which is exactly Iceberg's MERGE INTO ... WHEN MATCHED UPDATE/DELETE
semantics expressed over parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_operations(
    ops: DataFrame, key: str = "image_id", order: str = "seq"
) -> DataFrame:
    """Fold the upsert/delete op log into final committed state.

    Last operation per key (by ``order``) wins; keys whose last op is
    a delete are dropped. On Iceberg this is the MERGE INTO the engine
    would issue per superstep; over an op log it is one window.
    """
    w = Window.partitionBy(key).orderBy(F.desc(order))
    return (
        ops.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == "upsert"))
        .drop("__rn", "op")
    )


class MemoryCommitter:
    """Test-oracle sink (MemoryCommitter.java analog): captures the
    resolved upserts/deletes in memory as pandas frames."""

    def __init__(self):
        self.upserts = None
        self.deletes = None

    def commit(self, ops: DataFrame) -> "MemoryCommitter":
        self.upserts = resolve_operations(ops).toPandas()
        self.deletes = (
            ops.filter(F.col("op") == "delete").select("image_id").toPandas()
        )
        return self

    def requests(self) -> list[dict]:
        out = [
            {"op": "upsert", **r}
            for r in self.upserts.to_dict("records")
        ]
        out += [
            {"op": "delete", "image_id": r["image_id"]}
            for r in self.deletes.to_dict("records")
        ]
        return out


def csv_committer(ops: DataFrame, path: str) -> None:
    """CsvFileCommitter analog: resolved state as CSV (binary columns
    are not CSV-representable; store their sizes like the reference's
    field-truncation option)."""
    resolved = resolve_operations(ops).withColumn(
        "bytes_len", F.length(F.col("bytes"))
    ).drop("bytes")
    resolved.write.mode("overwrite").option("header", True).csv(path)


def json_committer(ops: DataFrame, path: str) -> None:
    """JsonFileCommitter analog: resolved state as JSON lines (binary
    base64-encoded, matching the reference's inline-base64 storage of
    image content — FeaturedImageResolver STORAGE_INLINE)."""
    resolved = resolve_operations(ops).withColumn(
        "bytes_b64", F.base64(F.col("bytes"))
    ).drop("bytes")
    resolved.write.mode("overwrite").json(path)


def xml_committer(ops: DataFrame, path: str) -> None:
    """XmlFileCommitter analog (committer/core/.../fs/impl/
    XmlFileCommitter.java): resolved state as XML documents via
    Spark's native XML writer (one well-formed ``<docs>`` file per
    partition — the reference likewise splits batches across numbered
    files). Binary inline-base64 like the JSON committer."""
    resolved = resolve_operations(ops).withColumn(
        "bytes_b64", F.base64(F.col("bytes"))
    ).drop("bytes")
    resolved.write.mode("overwrite").format("xml").option(
        "rootTag", "docs"
    ).option("rowTag", "doc").save(path)


def parquet_committer(ops: DataFrame, path: str) -> None:
    """Columnar sink: resolved state as parquet (the Iceberg table
    slot — swap for ``resolved.writeTo(table)`` with a catalog)."""
    resolve_operations(ops).write.mode("overwrite").parquet(path)


def orc_committer(ops: DataFrame, path: str) -> None:
    """Columnar sink #2 (Spark-builtin ORC) — same resolved-state
    contract as the parquet committer for ORC-native warehouses."""
    resolve_operations(ops).write.mode("overwrite").orc(path)


def warc_committer(
    ops: DataFrame,
    path: str,
    warc_date: str = "2026-01-01T00:00:00Z",
) -> None:
    """WARC sink: resolved documents as ISO-28500 ``resource`` records
    (the corpus-interchange format web-scale pipelines consume).

    One ``part-<partition>.warc`` file per sink partition, records in
    (image_id) order within each; every record carries the document id
    as WARC-Target-URI, a deterministic md5-derived record id, the
    payload media type from ``fmt``, and X-Crawl-* headers for the
    caption/checksum sidecar fields. ``warc_date`` is a config value,
    not a wall-clock read, so committed bytes are reproducible.
    Re-parsed by functions/warc.warc_records (round-trip tested).
    """
    import hashlib
    import os

    from ..functions.warc import build_record

    resolved = (
        resolve_operations(ops)
        .repartition(F.col("image_id"))
        .sortWithinPartitions("image_id")
    )
    os.makedirs(path, exist_ok=True)

    def write(it) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = []
        for row in it:
            d = row.asDict(recursive=True)
            body = bytes(d.get("bytes") or b"")
            digest = hashlib.md5(
                (d["image_id"] + ":" + warc_date).encode()
            ).hexdigest()
            fmt = (d.get("fmt") or "bin").lower()
            headers = {
                "WARC-Type": "resource",
                "WARC-Record-ID": f"<urn:md5:{digest}>",
                "WARC-Date": warc_date,
                "WARC-Target-URI": d["image_id"],
                "Content-Type": f"image/{fmt}",
                "X-Crawl-Caption": (d.get("caption") or "").replace(
                    "\r", " "
                ).replace("\n", " "),
                "X-Crawl-Checksum": d.get("checksum") or "",
            }
            chunks.append(build_record(headers, body))
        if chunks:
            with open(
                os.path.join(path, f"part-{pid:05d}.warc"), "wb"
            ) as f:
                f.write(b"".join(chunks))

    resolved.foreachPartition(write)
