"""SQL facade over TxTable: every statement routes to the already-
tested operation; unparseable statements raise, never half-run."""

from __future__ import annotations

import pytest

from sandbox_data_pipeline_spark.sinks.txsql import TxSql, TxSqlError


@pytest.fixture()
def tx(spark, tmp_path):
    spark.range(0, 10).selectExpr(
        "id", "id * 10 AS qty", "CAST(id % 2 AS STRING) AS tag"
    ).createOrReplaceTempView("src10")
    return TxSql(spark, str(tmp_path))


def test_create_insert_select_roundtrip(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10 WHERE id < 5")
    tx.sql("INSERT INTO t SELECT * FROM src10 WHERE id >= 5")
    assert tx.sql("SELECT * FROM t").count() == 10
    # time travel reads the pre-insert snapshot
    assert tx.sql("SELECT * FROM t VERSION AS OF 0").count() == 5


def test_delete_and_history(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10")
    res = tx.sql("DELETE FROM t WHERE qty BETWEEN 20 AND 40")
    assert res["files_rewritten"] >= 1
    assert tx.sql("SELECT * FROM t").count() == 7
    h = tx.sql("DESCRIBE HISTORY t")
    ops = [r["operation"] for r in h.collect()]
    assert ops == ["create", "delete"]


def test_merge_with_evolution(tx, spark):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10 WHERE id < 3")
    spark.range(2, 5).selectExpr(
        "id", "id * 100 AS qty", "CAST('x' AS STRING) AS tag",
        "CAST('eu' AS STRING) AS region",
    ).createOrReplaceTempView("delta_src")
    tx.sql("MERGE INTO t USING (SELECT * FROM delta_src) ON KEY id EVOLVE SCHEMA")
    got = {(r["id"], r["qty"], r["region"]) for r in tx.sql("SELECT * FROM t").collect()}
    assert (2, 200, "eu") in got and (0, 0, None) in got and len(got) == 5


def test_alter_statements(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10")
    tx.sql("ALTER TABLE t RENAME COLUMN qty TO quantity")
    assert "quantity" in tx.sql("SELECT * FROM t").columns
    tx.sql("ALTER TABLE t DROP COLUMN tag")
    assert "tag" not in tx.sql("SELECT * FROM t").columns
    tx.sql("ALTER TABLE t ADD COLUMNS (score double, note string)")
    cols = tx.sql("SELECT * FROM t").columns
    assert "score" in cols and "note" in cols
    tx.sql("ALTER TABLE t ADD CONSTRAINT q_pos CHECK (quantity >= 0)")
    with pytest.raises(ValueError, match="CHECK"):
        tx.sql("INSERT INTO t SELECT CAST(-1 AS BIGINT) AS id, CAST(-5 AS BIGINT) AS quantity, "
               "CAST(NULL AS DOUBLE) AS score, CAST(NULL AS STRING) AS note")


def test_restore_optimize_vacuum(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10 WHERE id < 5")
    tx.sql("INSERT INTO t SELECT * FROM src10 WHERE id >= 5")
    tx.sql("RESTORE TABLE t TO VERSION AS OF 0")
    assert tx.sql("SELECT * FROM t").count() == 5
    stats = tx.sql("OPTIMIZE t")
    assert isinstance(stats, dict)
    deleted = tx.sql("VACUUM t RETAIN 1 VERSIONS")
    assert isinstance(deleted, list)


def test_update_statement(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10")
    res = tx.sql("UPDATE t SET qty = qty * 2 WHERE id BETWEEN 3 AND 5")
    assert res["files_rewritten"] >= 1
    got = {r["id"]: r["qty"] for r in tx.sql("SELECT * FROM t").collect()}
    assert got[3] == 60 and got[4] == 80 and got[5] == 100
    assert got[2] == 20 and got[6] == 60  # out of range untouched


def test_unsupported_statement_raises(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10")
    with pytest.raises(TxSqlError, match="unsupported"):
        tx.sql("TRUNCATE TABLE t")  # not in the surface
    with pytest.raises(TxSqlError, match="unsupported"):
        tx.sql("DELETE FROM t WHERE qty > 5")  # only BETWEEN form
    with pytest.raises(TxSqlError):
        tx.sql("DELETE FROM t WHERE qty BETWEEN abc AND def")


def test_describe_detail(tx):
    tx.sql("CREATE TABLE t AS SELECT * FROM src10")
    tx.sql("ALTER TABLE t RENAME COLUMN qty TO quantity")
    tx.sql("ALTER TABLE t ADD CONSTRAINT pos CHECK (quantity >= 0)")
    d = tx.sql("DESCRIBE DETAIL t").collect()[0]
    assert d["n_rows"] == 10 and d["n_files"] >= 1
    assert "quantity" in d["columns"]
    assert d["constraints"] == "pos"
    assert "quantity" in (d["column_mapping"] or "")


def test_run_script_sequences_and_fails_fast(tx):
    from sandbox_data_pipeline_spark.sinks.txsql import (
        run_script,
        split_statements,
    )

    results = run_script(
        tx,
        """
        -- build and mutate in one scripted sequence
        CREATE TABLE s AS SELECT * FROM src10 WHERE id < 6;
        INSERT INTO s SELECT * FROM src10 WHERE id >= 6;
        UPDATE s SET qty = qty + 1 WHERE id BETWEEN 0 AND 1;
        """,
    )
    assert len(results) == 3
    got = {r["id"]: r["qty"] for r in tx.sql("SELECT * FROM s").collect()}
    assert got[0] == 1 and got[1] == 11 and got[9] == 90
    # quoted semicolons don't split
    stmts = split_statements("CREATE TABLE z AS SELECT ';' AS c; VACUUM z")
    assert len(stmts) == 2 and "';'" in stmts[0]
    # fail-fast: bad third statement leaves the first two applied
    import pytest as _p

    with _p.raises(TxSqlError):
        run_script(
            tx,
            "DELETE FROM s WHERE qty BETWEEN 50 AND 60; TRUNCATE TABLE s",
        )
    assert tx.sql("SELECT * FROM s").count() == 8  # delete (qty 50,60) landed, no more


def test_bare_vacuum_keeps_safe_retention(tx):
    """Bare VACUUM uses vacuum()'s own defaults — the 7-day age floor
    protects freshly-written (possibly uncommitted-concurrent) files
    and history stays time-travelable; only an explicit RETAIN clause
    reclaims immediately."""
    tx.sql("CREATE TABLE vt AS SELECT * FROM src10 WHERE id < 5")
    tx.sql("INSERT INTO vt SELECT * FROM src10 WHERE id >= 5")
    assert tx.sql("VACUUM vt") == []  # age floor spares young files
    assert tx.sql("SELECT * FROM vt VERSION AS OF 0").count() == 5
    deleted = tx.sql("VACUUM vt RETAIN 2 VERSIONS")
    assert deleted == []  # both versions retained explicitly
    assert tx.sql("SELECT * FROM vt").count() == 10


def test_drop_constraint_statement(tx):
    tx.sql("CREATE TABLE ct AS SELECT * FROM src10")
    tx.sql("ALTER TABLE ct ADD CONSTRAINT qcap CHECK (qty <= 1000)")
    with pytest.raises(ValueError, match="constraint"):
        tx.sql("ALTER TABLE ct RENAME COLUMN qty TO quantity")
    tx.sql("ALTER TABLE ct DROP CONSTRAINT qcap")
    tx.sql("ALTER TABLE ct RENAME COLUMN qty TO quantity")
    assert "quantity" in tx.sql("SELECT * FROM ct").columns
