"""SQL (relational-database) committer over the Python DB-API.

Re-expresses the reference's SQL connector from scratch:

* ``SqlClient`` (committer/sql/.../SqlClient.java:123-148 ensureTable,
  :150-176 lazy field metadata, :208-244 dbUpsert delete-then-insert,
  :245-247 dbDelete, :320-330 fixFieldName, :332-340 ``{var}``
  interpolation, :362-397 ensureFields/createField, :399-412
  fixFieldValue size truncation) and ``SqlCommitterConfig``
  (committer/sql/.../SqlCommitterConfig.java: tableName, primaryKey,
  createTableSQL, createFieldSQL, fixFieldNames, fixFieldValues,
  multiValuesJoiner default ``|``, targetContentField default
  ``content``).

JDBC becomes the DB-API: any importable ``connect_factory(url)``
(psycopg2.connect, pymysql.connect, ...) slots in; the in-container
default is stdlib ``sqlite3`` with WAL + busy-timeout so several Spark
worker processes can commit into one database file concurrently.

Spark shape (same partitioned-sink contract as ``sinks/rest``): the op
log is hash-partitioned on the primary-key column and sorted
``(id, seq)`` within partitions, so each document's operations reach
exactly ONE sink partition in seq order — the database's
delete-then-insert last-write-wins then equals the
``resolve_operations`` fold with no global sort and no driver collect.
Table creation runs ONCE driver-side before the fan-out (the
reference's init-time ensureTable); per-field ALTERs happen lazily on
workers with the duplicate-column race between partitions swallowed by
re-probing. Per-row Python is unavoidable at a DB-API boundary (the
sink IS a SQL conversation, exactly as the reference's committer is a
QueryRunner loop); everything upstream of ``foreachPartition`` stays
columnar.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Reference defaults (SqlCommitterConfig.java:40-42,108,119).
DEFAULT_MULTI_VALUES_JOINER = "|"
DEFAULT_TARGET_CONTENT_FIELD = "content"

# Usability defaults the reference leaves to the user: a minimal
# portable create-table + add-column pair so the committer works out
# of the box against an empty database (override for typed schemas).
DEFAULT_CREATE_TABLE_SQL = (
    "CREATE TABLE {tableName} ({primaryKey} VARCHAR(2048) PRIMARY KEY)"
)
DEFAULT_CREATE_FIELD_SQL = (
    "ALTER TABLE {tableName} ADD COLUMN {fieldName} TEXT"
)


def sqlite_connect(url: str):
    """Default connect factory: stdlib sqlite3 on a file path/URI.

    WAL + a 30s busy timeout let concurrent sink partitions (separate
    worker processes) interleave their write transactions on one
    database file instead of failing on the writer lock.
    """
    import sqlite3

    con = sqlite3.connect(url, timeout=30.0, isolation_level=None)
    try:
        con.execute("PRAGMA busy_timeout=30000")
        con.execute("PRAGMA journal_mode=WAL")
    except Exception:  # noqa: BLE001 — pragmas are best-effort
        pass
    return con


@dataclass(frozen=True)
class SqlCommitterConfig:
    """SqlCommitterConfig analog, trimmed to the behavior-affecting
    subset (driver jars/credentials are the caller's connect factory)."""

    connection_url: str  # factory arg: sqlite path, DSN, ...
    table_name: str = "docs"
    primary_key: str = "image_id"  # also the op-log id column
    seq_col: str = "seq"
    op_col: str = "op"
    create_table_sql: Optional[str] = DEFAULT_CREATE_TABLE_SQL
    create_field_sql: Optional[str] = DEFAULT_CREATE_FIELD_SQL
    fix_field_names: bool = False
    fix_field_values: bool = False
    multi_values_joiner: str = DEFAULT_MULTI_VALUES_JOINER
    target_content_field: str = DEFAULT_TARGET_CONTENT_FIELD
    content_col: str = "content"  # op-log column mapped to the target
    batch_size: int = 200  # ops per transaction commit
    paramstyle: str = "qmark"  # or "format" (%s) for pg/mysql APIs
    num_partitions: int = 0  # 0 = keep the op log's parallelism
    # Any importable module-level callable; pickled by reference to
    # the workers. None -> sqlite_connect.
    connect_factory: Optional[Callable] = None


# ---------------------------------------------------------------------------
# reference-semantics helpers (pure, unit-testable)
# ---------------------------------------------------------------------------


def fix_field_name(name: str) -> str:
    """fixFieldName (SqlClient.java:320-330): non-word runs -> ``_``,
    then strip leading digits/underscores."""
    new = re.sub(r"\W+", "_", name)
    return re.sub(r"^[\d_]+", "", new)


def interpolate(sql: str, cfg: SqlCommitterConfig,
                field_name: str | None = None) -> str:
    """``{tableName}`` / ``{primaryKey}`` / ``{fieldName}``
    substitution (SqlClient.java:332-340)."""
    out = sql.replace("{tableName}", cfg.table_name).replace(
        "{primaryKey}", _pk_field(cfg)
    )
    if field_name is not None:
        out = out.replace("{fieldName}", field_name)
    return out


def _pk_field(cfg: SqlCommitterConfig) -> str:
    return (
        fix_field_name(cfg.primary_key)
        if cfg.fix_field_names
        else cfg.primary_key
    )


def _ph(cfg: SqlCommitterConfig) -> str:
    return "?" if cfg.paramstyle == "qmark" else "%s"


def _sql_value(value, cfg: SqlCommitterConfig):
    """Row value -> DB-API bind value. Multi-valued (array) columns
    join on the configured joiner (CommitterUtil multi-value handling
    via multiValuesJoiner); bytes pass through as BLOBs."""
    if isinstance(value, (list, tuple)):
        return cfg.multi_values_joiner.join(
            "" if v is None else str(v) for v in value
        )
    return value


# ---------------------------------------------------------------------------
# client (one per partition task; also used driver-side for DDL)
# ---------------------------------------------------------------------------


class _SqlSink:
    """The per-connection half of SqlClient: DDL probes, lazy field
    creation, delete-then-insert upserts."""

    def __init__(self, cfg: SqlCommitterConfig):
        self.cfg = cfg
        factory = cfg.connect_factory or sqlite_connect
        self.con = factory(cfg.connection_url)
        self.cur = self.con.cursor()
        # lowercased field name -> reported size (None = unbounded)
        self.fields: dict[str, int | None] = {}

    # --- DDL ---------------------------------------------------------------

    def table_exists(self) -> bool:
        # Existence by probe, not catalog (SqlClient.java:150-158:
        # "we cannot rely enough on return value so we rely on
        # exception").
        try:
            self.cur.execute(f"SELECT 1 FROM {self.cfg.table_name}")
            self.cur.fetchall()
            return True
        except Exception:  # noqa: BLE001 — the probe IS the check
            return False

    def ensure_table(self) -> None:
        if not self.cfg.create_table_sql:
            return
        if not self.table_exists():
            self.cur.execute(
                interpolate(self.cfg.create_table_sql, self.cfg)
            )
            self.con.commit()
            log.info("sql committer: created table %s",
                     self.cfg.table_name)
        self.load_fields()

    def load_fields(self) -> None:
        """loadFieldsMetadata analog: column names + display sizes
        from a SELECT's cursor description."""
        self.cur.execute(f"SELECT * FROM {self.cfg.table_name} LIMIT 0")
        self.cur.fetchall()
        self.fields = {
            d[0].lower(): (d[3] if len(d) > 3 else None)
            for d in (self.cur.description or [])
        }

    def ensure_fields(self, names: list[str]) -> None:
        if not self.cfg.create_field_sql:
            return  # no DDL -> assume they all exist (ensureFields)
        missing = [n for n in names if n.lower() not in self.fields]
        for name in missing:
            try:
                self.cur.execute(
                    interpolate(self.cfg.create_field_sql, self.cfg, name)
                )
                self.con.commit()
            except Exception:  # noqa: BLE001
                # Another partition may have just added it — re-probe
                # and only re-raise if it is genuinely still absent.
                pass
        if missing:
            self.load_fields()
            still = [n for n in missing if n.lower() not in self.fields]
            if still:
                raise RuntimeError(
                    f"sql committer: could not create fields {still} "
                    f"on {self.cfg.table_name}"
                )

    # --- DML ---------------------------------------------------------------

    def _fix_value(self, field: str, value):
        if not self.cfg.fix_field_values or not isinstance(value, str):
            return value
        size = self.fields.get(field.lower())
        return value[:size] if size else value

    def upsert(self, fields: list[str], values: list) -> None:
        """dbUpsert: delete the existing row for the pk (if any), then
        insert — the reference's last-write-wins primitive."""
        pk = _pk_field(self.cfg)
        ph = _ph(self.cfg)
        self.ensure_fields(fields)
        pk_value = values[fields.index(pk)]
        self.cur.execute(
            f"DELETE FROM {self.cfg.table_name} WHERE {pk} = {ph}",
            (pk_value,),
        )
        cols = ",".join(fields)
        phs = ", ".join([ph] * len(fields))
        self.cur.execute(
            f"INSERT INTO {self.cfg.table_name}({cols}) VALUES ({phs})",
            [self._fix_value(f, v) for f, v in zip(fields, values)],
        )

    def delete(self, pk_value) -> None:
        pk = _pk_field(self.cfg)
        self.cur.execute(
            f"DELETE FROM {self.cfg.table_name} WHERE {pk} = {_ph(self.cfg)}",
            (pk_value,),
        )

    def commit(self) -> None:
        self.con.commit()

    def close(self) -> None:
        try:
            self.con.commit()
        finally:
            self.con.close()


def _row_fields(row_dict: dict, cfg: SqlCommitterConfig
                ) -> tuple[list[str], list]:
    """Op-log row -> (field names, bind values).

    The content column maps to ``target_content_field`` unless a
    column of that name is already present (dbUpsert's
    isTargetFieldAlreadySet precedence); op/seq bookkeeping is
    dropped; null values are skipped (the reference only inserts the
    metadata entries a request carries).
    """
    skip = {cfg.op_col, cfg.seq_col}
    fields: list[str] = []
    values: list = []
    has_target = any(
        c == cfg.target_content_field and row_dict.get(c) is not None
        for c in row_dict
    )
    for col, val in row_dict.items():
        if col in skip or val is None:
            continue
        name = col
        if col == cfg.content_col and not has_target:
            name = cfg.target_content_field
        if cfg.fix_field_names:
            name = fix_field_name(name)
        fields.append(name)
        values.append(_sql_value(val, cfg))
    return fields, values


# ---------------------------------------------------------------------------
# the committer
# ---------------------------------------------------------------------------


def sql_committer(ops: DataFrame, cfg: SqlCommitterConfig) -> None:
    """Push the op log into the configured table; the final table
    contents equal ``resolve_operations(ops)``."""
    # DDL once, driver-side — workers never race CREATE TABLE.
    driver_sink = _SqlSink(cfg)
    try:
        driver_sink.ensure_table()
    finally:
        driver_sink.close()

    n = cfg.num_partitions or ops.rdd.getNumPartitions() or 1
    routed = ops.repartition(n, F.col(cfg.primary_key)).sortWithinPartitions(
        cfg.primary_key, cfg.seq_col
    )

    def send(rows) -> None:
        sink = None
        pending = 0
        try:
            for row in rows:
                if sink is None:
                    sink = _SqlSink(cfg)
                    sink.load_fields()
                d = row.asDict(recursive=True)
                if d[cfg.op_col] == "delete":
                    sink.delete(d[cfg.primary_key])
                else:
                    fields, values = _row_fields(d, cfg)
                    sink.upsert(fields, values)
                pending += 1
                if pending >= cfg.batch_size:
                    sink.commit()
                    pending = 0
        finally:
            if sink is not None:
                sink.close()

    routed.foreachPartition(send)
