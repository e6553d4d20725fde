import os
import sys

sys.path.insert(0, "/root/repo")
import duckdb

from airbyte_spark.session import get_spark
from airbyte_spark.sources.changelog import read_changelog
from airbyte_spark.streaming.pipeline import CdcPipeline
from tests.test_e2e_replay import FINAL_STATE_SQL

sf = "/root/testdata/sf0.001"
spark = get_spark("dbg", master="local[4]", shuffle_partitions=8)
import tempfile

path = tempfile.mkdtemp() + "/pages"
pipe = CdcPipeline.create_target(spark, path, n_buckets=8)
pipe.replay(read_changelog(spark, sf))
got = [
    (r["url"], r["warc_ts"], r["text"], r["lang"], r["_ab_cdc_lsn"])
    for r in pipe.final_state()
    .select("url", "warc_ts", "text", "lang", "_ab_cdc_lsn")
    .orderBy("url")
    .collect()
]
con = duckdb.connect()
con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
want = con.sql(FINAL_STATE_SQL).fetchall()
print("got", len(got), "want", len(want))
gd = {g[0]: g for g in got}
wd = {w[0]: w for w in want}
only_g = set(gd) - set(wd)
only_w = set(wd) - set(gd)
print("only in got:", list(only_g)[:5])
print("only in want:", list(only_w)[:5])
ndiff = 0
for k in set(gd) & set(wd):
    if gd[k] != wd[k]:
        ndiff += 1
        if ndiff <= 5:
            print("DIFF", k)
            print("  got ", gd[k])
            print("  want", wd[k])
print("ndiff", ndiff)
