"""Destination acceptance harness: one parametrized contract suite every
destination surface must pass (≡ the reference's
DestinationAcceptanceTest: testSync write-then-read-back record
equality, testSecondSync full-refresh replaces, testIncrementalSync
append accumulates, testSyncWithNormalization identifier handling —
re-expressed for this engine's sinks). Each case provides
(write, read_back) closures over a tmp target; the harness owns the
assertions so every destination meets the same bar."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _src(spark, sf_dir, n=200):
    # awkward column names on purpose: normalization is part of the bar
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("event_id").alias("Event ID"),
            F.col("event_type").alias("event-type"),
            F.col("value").alias("value"),
        )
        .limit(n)
    )


def _mk_local(fmt):
    def make(spark, tmp):
        from airbyte_spark.destinations import read_local, write_local

        dest = str(tmp / f"local_{fmt}")

        def write(df, mode):
            write_local(df, dest, "My Stream", fmt=fmt, mode=mode)

        def read_back(spark):
            df = read_local(spark, dest, "My Stream", fmt)
            return df.select(
                F.col("event_id").cast("long"),
                F.col("event_type").cast("string").alias("event_type"),
                F.col("value").cast("double"),
            )

        return write, read_back

    return make


def _mk_lake(spark, tmp):
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    state = {"t": None, "n_writes": 0}

    def write(df, mode):
        from airbyte_spark.functions.names import normalize_identifier

        out = df.select(
            *[df[c].alias(normalize_identifier(c)) for c in df.columns]
        )
        if state["t"] is None:
            state["t"] = LakeTable.create(
                spark, str(tmp / "lake"), out.schema, PartitionSpec()
            )
        if mode == "overwrite":
            state["t"].overwrite(out)
        else:
            state["n_writes"] += 1
            state["t"].append(out, checkpoint_key=f"a-{state['n_writes']}")

    def read_back(spark):
        return state["t"].read()

    return write, read_back


def _mk_copy_into(spark, tmp):
    from airbyte_spark.functions.names import normalize_identifier
    from airbyte_spark.lake.copy_into import copy_into, stage_objects
    from airbyte_spark.lake.format import LakeTable, PartitionSpec

    state = {"t": None, "n": 0}

    def write(df, mode):
        out = df.select(
            *[df[c].alias(normalize_identifier(c)) for c in df.columns]
        )
        if state["t"] is None:
            state["t"] = LakeTable.create(
                spark, str(tmp / "cp"), out.schema, PartitionSpec()
            )
        if mode == "overwrite":
            state["t"].truncate()
        state["n"] += 1
        stage = str(tmp / f"stage{state['n']}")
        stage_objects(out, stage)
        copy_into(state["t"], stage, checkpoint_key=f"c-{state['n']}")

    def read_back(spark):
        return state["t"].read()

    return write, read_back


def _mk_warehouse_sql(spark, tmp):
    import json

    import duckdb

    from airbyte_spark.destinations_sql import write_warehouse_sync

    con = duckdb.connect(str(tmp / "wh.duckdb"))
    state = {"n": 0}

    def write(df, mode):
        state["n"] += 1
        path = write_warehouse_sync(
            df, str(tmp / f"wh{state['n']}"), "public", "My Stream",
            dialect="postgres", mode=mode, n_shards=2,
        )
        con.execute(open(path).read().replace(" JSONB", " JSON"))

    def read_back(spark):
        rows = [
            json.loads(j)
            for (j,) in con.sql(
                'SELECT _airbyte_data FROM "public"."_airbyte_raw_my_stream"'
            ).fetchall()
        ]
        return spark.createDataFrame(
            [(d["Event ID"], d["event-type"], d["value"]) for d in rows],
            "event_id long, event_type string, value double",
        )

    # deterministic content-hash ab_ids + anti-join promote give SET
    # append semantics: re-delivering an identical record is a no-op
    # (the engine's exactly-once idiom), unlike DAT's multiset append
    return write, read_back, "set"


CASES = {
    "local_csv": _mk_local("csv"),
    "local_json": _mk_local("json"),
    "local_parquet": _mk_local("parquet"),
    "lake_table": _mk_lake,
    "copy_into": _mk_copy_into,
    "warehouse_sql": _mk_warehouse_sql,
}


@pytest.fixture(params=sorted(CASES), ids=sorted(CASES))
def dest(request, spark, tmp_path):
    made = CASES[request.param](spark, tmp_path)
    # cases may declare append semantics: "multiset" (DAT default) or
    # "set" (deterministic-id destinations dedup identical re-deliveries)
    return made if len(made) == 3 else (*made, "multiset")


def _vals(df):
    # tolerate either the source's awkward names or their normalized forms
    norm = {c.lower().replace(" ", "_").replace("-", "_"): c for c in df.columns}
    cols = [norm["event_id"], norm["event_type"], norm["value"]]
    return sorted((r[0], r[1], r[2]) for r in df.select(*cols).collect())


def test_sync_roundtrip_and_second_sync_semantics(spark, sf_dir, dest):
    """≡ DAT testSync + testSecondSync + incremental append: first sync
    reads back exactly; a second overwrite sync REPLACES (no residue from
    sync 1); appends accumulate both batches."""
    write, read_back, append_sem = dest
    first = _src(spark, sf_dir, 200)
    write(first, "overwrite")
    assert _vals(read_back(spark)) == _vals(first)

    second = _src(spark, sf_dir, 300).filter(F.col("Event ID") % 2 == 0)
    write(second, "overwrite")
    assert _vals(read_back(spark)) == _vals(second), "overwrite left residue"

    write(first, "append")
    got = _vals(read_back(spark))
    if append_sem == "set":
        want = sorted(set(_vals(second)) | set(_vals(first)))
    else:
        want = sorted(_vals(second) + _vals(first))
    assert got == want, "append lost/duped rows"
