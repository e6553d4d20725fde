#!/usr/bin/env bash
# End-to-end spark-submit --py-files run (the deployment shape from the
# north rule): package the engine as a zip, materialize a changelog from
# the sf0.001 events table, run a bounded sync via the CLI, resume it
# (no-op), and print metrics.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

cd "$REPO" && zip -qr "$WORK/airbyte_spark.zip" airbyte_spark

cat > "$WORK/driver.py" <<'EOF'
import sys
from airbyte_spark.session import get_spark
from airbyte_spark.sources.changelog import write_changelog_dir
from airbyte_spark.cli import run
import argparse

work = sys.argv[1]
spark = get_spark("submit-e2e", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
n = write_changelog_dir(spark, "/root/testdata/sf0.001", f"{work}/changelog", batch_span=250)
ns = argparse.Namespace(cmd="read", source=f"{work}/changelog", target=f"{work}/pages",
                        from_checkpoint=None, n_buckets=8)
r1 = run(spark, ns)
r2 = run(spark, ns)  # resume: all segments already committed
ns_m = argparse.Namespace(cmd="metrics", target=f"{work}/pages")
m = run(spark, ns_m)
assert r1["applied"] == n and r1["skipped"] == 0, r1
assert r2["applied"] == 0 and r2["skipped"] == n, r2
assert len(m["rows"]) == n
print("SPARK_SUBMIT_E2E_OK", r1["committed"])
EOF

spark-submit --master 'local[4]' --py-files "$WORK/airbyte_spark.zip" \
  "$WORK/driver.py" "$WORK" 2>/dev/null | tail -1
