"""Table-level CHECK constraints (≡ Delta ALTER TABLE ADD CONSTRAINT):
commit-time enforcement over staged files only, atomic reject, SQL 3VL.
"""

from __future__ import annotations

import pytest

from airbyte_spark.lake.format import (
    ConstraintViolation,
    LakeTable,
    PartitionSpec,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], "id long, v long, s string").schema,
        PartitionSpec(),
    )
    t.append(spark.createDataFrame([(1, 10, "a"), (2, 20, None)], "id long, v long, s string"))
    return t


def test_add_enforce_and_drop(table, spark):
    table.add_constraint("v_positive", "v > 0")
    assert table.constraints() == {"v_positive": "v > 0"}
    v_before = table.current_version()
    files_before = {e.path for e in table.files()}

    # violating append rejected atomically: version, files, data unchanged
    with pytest.raises(ConstraintViolation, match="v_positive"):
        table.append(spark.createDataFrame([(3, -5, "x")], "id long, v long, s string"))
    assert table.current_version() == v_before
    assert {e.path for e in table.files()} == files_before

    # conforming append passes
    table.append(spark.createDataFrame([(3, 5, "x")], "id long, v long, s string"))
    assert table.read().count() == 3

    # dropping the constraint re-admits previously-rejected data
    table.drop_constraint("v_positive")
    assert table.constraints() == {}
    table.append(spark.createDataFrame([(4, -1, "y")], "id long, v long, s string"))
    assert table.read().count() == 4


def test_add_constraint_validates_existing_rows(table, spark):
    with pytest.raises(ConstraintViolation, match="existing rows"):
        table.add_constraint("v_big", "v >= 15")  # row (1, 10) violates
    assert table.constraints() == {}


def test_null_passes_three_valued_logic(table, spark):
    # SQL standard: CHECK fails only on FALSE; NULL passes (row 2 has s NULL)
    table.add_constraint("s_short", "length(s) < 10")
    table.append(
        spark.createDataFrame([(5, 1, None)], "id long, v long, s string")
    )
    assert table.read().count() == 3
    with pytest.raises(ConstraintViolation):
        table.append(
            spark.createDataFrame(
                [(6, 1, "definitely-way-too-long")], "id long, v long, s string"
            )
        )


def test_multiple_constraints_all_reported(table, spark):
    table.add_constraint("v_positive", "v > 0")
    table.add_constraint("id_positive", "id > 0")
    with pytest.raises(ConstraintViolation) as exc:
        table.append(
            spark.createDataFrame([(-1, -1, "x")], "id long, v long, s string")
        )
    assert "v_positive" in str(exc.value) and "id_positive" in str(exc.value)


def test_no_orphans_after_reject(table, spark, tmp_path):
    table.add_constraint("v_positive", "v > 0")
    with pytest.raises(ConstraintViolation):
        table.append(spark.createDataFrame([(9, -9, "z")], "id long, v long, s string"))
    # staged files of the rejected commit were reclaimed (no orphans)
    orphans = [i for i in table.fsck() if i["kind"] == "orphan-file"]
    assert orphans == []


def test_redelivered_committed_key_noop_despite_constraint(table, spark):
    # segment committed BEFORE the constraint existed; an at-least-once
    # redelivery of the same key must stay a silent no-op, not a violation
    batch = spark.createDataFrame([(7, -7, "n")], "id long, v long, s string")
    table.append(batch, checkpoint_key="seg-1")
    table.add_constraint("v_pos", "v > -100")  # existing -7 passes
    v = table.current_version()
    table.append(
        spark.createDataFrame([(7, -7000, "n")], "id long, v long, s string"),
        checkpoint_key="seg-1",
    )
    assert table.current_version() == v  # idempotent no-op, no violation


def test_concurrently_added_constraint_enforced_on_commit(table, spark):
    # staged entries validate against the manifest read inside the CAS
    # loop, so a constraint added between staging and commit is enforced
    entries = table._stage_write(
        spark.createDataFrame([(8, -8, "x")], "id long, v long, s string"),
        [], one_file_per_partition=True,
    )
    table.add_constraint("v_pos", "v > 0")
    from airbyte_spark.lake.format import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        table.commit(entries, operation="append")


def test_gate_sees_rows_masked_by_live_equality_delete(table, spark):
    """Regression: the commit-time gate must scan the rows the commit will
    make VISIBLE. Staged entries carry seq=None; without a prospective-seq
    stamp they read as era 0 and every live equality delete anti-joins the
    staged rows away — a violating row whose key matches a live equality
    delete would pass the gate, then surface post-commit with
    seq=new_version > delete seq."""
    from airbyte_spark.lake.dml import delete_equality

    table.add_constraint("v_positive", "v > 0")
    # equality-delete id=1 (its row is live, predating the delete)
    delete_equality(table, keys=[1], cols=["id"])
    assert table.read().filter("id = 1").count() == 0

    # re-insert id=1 with a VIOLATING value: the new row postdates the
    # delete, so if committed it would be visible — the gate must reject
    with pytest.raises(ConstraintViolation, match="v_positive"):
        table.append(
            spark.createDataFrame([(1, -7, "bad")], "id long, v long, s string")
        )
    # and a conforming re-insert of the same key still passes + is visible
    table.append(spark.createDataFrame([(1, 99, "ok")], "id long, v long, s string"))
    assert [r.v for r in table.read().filter("id = 1").collect()] == [99]
