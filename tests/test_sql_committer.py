"""SQL committer against a live sqlite database: the op log pushed
through sql_committer must leave the table holding exactly
resolve_operations' folded state, with the table and fields created
on demand. Reference contracts: SqlClient.java:123-148 (ensureTable),
:208-244 (delete-then-insert upsert), :320-330 (fixFieldName),
:362-397 (lazy field creation), SqlCommitterConfig.java (defaults)."""

import sqlite3

import pytest

from crawlspark.sinks.committers import resolve_operations
from crawlspark.sinks.sql import (
    SqlCommitterConfig,
    _SqlSink,
    fix_field_name,
    interpolate,
    sql_committer,
)


def _ops_df(spark):
    """Same convergence fixture as the REST committer tests: re-upserts
    and deletes scattered across partitions out of order."""
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


EXPECTED = {"a": "final-a", "c": "final-c", "d": "final-d"}


def test_sql_committer_matches_resolved_fold(spark, tmp_path):
    db = str(tmp_path / "docs.db")
    ops = _ops_df(spark)
    sql_committer(
        ops,
        SqlCommitterConfig(
            connection_url=db, batch_size=2, num_partitions=2
        ),
    )
    con = sqlite3.connect(db)
    got = dict(
        con.execute("SELECT image_id, caption FROM docs").fetchall()
    )
    con.close()
    assert got == EXPECTED
    folded = {
        r["image_id"]: r["caption"]
        for r in resolve_operations(ops).collect()
    }
    assert folded == EXPECTED


def test_sql_committer_reupsert_overwrites(spark, tmp_path):
    """Delete-then-insert: a second run over a later op log replaces
    rows in place (the reference's recordExists -> delete path)."""
    db = str(tmp_path / "docs.db")
    cfg = SqlCommitterConfig(connection_url=db, num_partitions=1)
    sql_committer(_ops_df(spark), cfg)
    later = spark.createDataFrame(
        [(10, "a", "upsert", "newer-a"), (11, "d", "delete", None)],
        "seq long, image_id string, op string, caption string",
    )
    sql_committer(later, cfg)
    con = sqlite3.connect(db)
    got = dict(
        con.execute("SELECT image_id, caption FROM docs").fetchall()
    )
    con.close()
    assert got == {"a": "newer-a", "c": "final-c"}


def test_sql_committer_multivalue_and_content_mapping(spark, tmp_path):
    """Array columns join on multiValuesJoiner ('|'); the content
    column lands in targetContentField under its configured name."""
    db = str(tmp_path / "docs.db")
    ops = spark.createDataFrame(
        [(1, "x", "upsert", "the body", ["t1", "t2"])],
        "seq long, image_id string, op string, content string, "
        "tags array<string>",
    )
    sql_committer(
        ops,
        SqlCommitterConfig(
            connection_url=db,
            num_partitions=1,
            target_content_field="body",
        ),
    )
    con = sqlite3.connect(db)
    row = con.execute("SELECT body, tags FROM docs").fetchone()
    con.close()
    assert row == ("the body", "t1|t2")


def test_fix_field_name_reference_cases():
    # replaceAll("\\W+","_") then strip leading [\d_]+
    assert fix_field_name("my field!") == "my_field_"
    assert fix_field_name("123abc") == "abc"
    assert fix_field_name("_x.y") == "x_y"
    assert fix_field_name("ok_name") == "ok_name"


def test_interpolate_and_value_truncation(tmp_path):
    cfg = SqlCommitterConfig(
        connection_url=str(tmp_path / "t.db"),
        table_name="tbl",
        primary_key="pk",
        fix_field_values=True,
    )
    assert (
        interpolate("CREATE TABLE {tableName} ({primaryKey} TEXT)", cfg)
        == "CREATE TABLE tbl (pk TEXT)"
    )
    sink = _SqlSink(cfg)
    try:
        # fixFieldValue truncates to the reported column size only
        # when the backend reports one (sqlite reports none).
        sink.fields = {"caption": 4}
        assert sink._fix_value("caption", "truncate-me") == "trun"
        sink.fields = {"caption": None}
        assert sink._fix_value("caption", "truncate-me") == "truncate-me"
    finally:
        sink.close()


def test_missing_field_without_ddl_raises(spark, tmp_path):
    """No createFieldSQL -> fields must pre-exist; a novel column on a
    frozen schema is a loud failure, not a silent drop."""
    db = str(tmp_path / "docs.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE docs (image_id TEXT PRIMARY KEY)")
    con.commit()
    con.close()
    ops = _ops_df(spark)
    with pytest.raises(Exception):
        sql_committer(
            ops,
            SqlCommitterConfig(
                connection_url=db,
                num_partitions=1,
                create_table_sql=None,
                create_field_sql=None,
            ),
        )
