"""Record-validity filter: invalid rows dropped, counts observed
(≡ BufferedStreamConsumer isValidData + ignored-record counters)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import StructField, StructType

from airbyte_spark.operators.dedup import valid_records
from airbyte_spark.protocol import StreamConfig
from airbyte_spark.schema import CHANGE_SCHEMA

T0 = dt.datetime(2024, 1, 1)


def test_valid_records_filter_and_counts(spark):
    nullable = StructType([StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields])
    rows = [
        ("u1", T0, None, "ok", "en", T0, None, 1, T0, 0),
        (None, T0, None, "no-key", "en", T0, None, 2, T0, 0),
        ("u3", None, None, "no-order", "en", None, None, None, None, 0),
        ("u4", None, None, "lsn-only", "en", None, None, 4, None, 0),
    ]
    df = spark.createDataFrame(rows, nullable)
    cfg = StreamConfig(name="pages", schema=nullable)
    valid, obs = valid_records(df, cfg)
    kept = {r["url"] for r in valid.collect()}
    assert kept == {"u1", "u4"}  # lsn counts as usable order key
    assert obs.get == {"n_invalid": 2, "n_total": 4}
