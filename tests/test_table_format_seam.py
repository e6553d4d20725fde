"""The table-format seam: merge/pipeline depend on the TableFormat
protocol only, the default implementation satisfies it, and an injected
adapter class flows through CdcPipeline untouched."""

from __future__ import annotations

from airbyte_spark.lake.format import LakeTable, PartitionSpec
from airbyte_spark.lake.table_format import DEFAULT_FORMAT, TableFormat


def test_laketable_satisfies_protocol(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], "id bigint").schema,
        PartitionSpec(),
    )
    assert isinstance(t, TableFormat)  # runtime_checkable member presence
    assert DEFAULT_FORMAT is LakeTable


def test_merge_and_pipeline_import_only_the_protocol():
    """Source-level seam: neither merge.py nor pipeline.py names the
    concrete implementation — swapping the binding touches only
    table_format.py (and callers that opt into a custom adapter)."""
    import inspect

    import airbyte_spark.lake.merge as merge
    import airbyte_spark.streaming.pipeline as pipeline

    for mod in (merge, pipeline):
        src = inspect.getsource(mod)
        assert "LakeTable" not in src, mod.__name__
        assert "lake.format" not in src, mod.__name__


def test_pipeline_accepts_injected_adapter(spark, tmp_path, sf_dir):
    """A custom adapter class passed via table_format= is what the
    pipeline constructs and commits through (here a thin subclass that
    counts commits — a real deployment passes an Iceberg-backed one)."""
    import pyspark.sql.functions as F

    from airbyte_spark.sources.changelog import derive_changelog
    from airbyte_spark.streaming.pipeline import CdcPipeline

    commits = {"n": 0}

    class CountingAdapter(LakeTable):
        def commit(self, *a, **kw):
            commits["n"] += 1
            return super().commit(*a, **kw)

    pipe = CdcPipeline.create_target(
        spark,
        str(tmp_path / "t"),
        n_buckets=4,
        table_format=CountingAdapter,
    )
    assert isinstance(pipe.table, CountingAdapter)
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    ch = derive_changelog(events, batch_span=1000)
    pipe.apply_batch(ch.filter(F.col("checkpoint_id") == 0), "ck-0")
    assert commits["n"] >= 1
    assert pipe.final_state().count() > 0
