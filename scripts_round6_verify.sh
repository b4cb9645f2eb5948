#!/bin/bash
# Round-6 end-of-round verification chain (run from /root/repo)
set -u
echo "=== [1/5] full pytest ==="
python -m pytest tests/ -q 2>&1 | tail -4
echo "PYTEST_RC=${PIPESTATUS[0]}"
echo "=== [2/5] full oracle sweep sf0.01 ==="
python scripts_oracle_sweep.py /root/testdata/sf0.01 2>&1 | tail -2
echo "SWEEP001_RC=${PIPESTATUS[0]}"
echo "=== [3/5] adversarial-partitioning sweep local[5]/7 sf0.01 ==="
python - <<'PY'
import sys; sys.path.insert(0, "tests")
from oracle import compare
from cdc_pipeline_spark import workload
from cdc_pipeline_spark.session import create_spark_session
spark = create_spark_session(app_name="odd", master="local[5]", shuffle_partitions=7)
spark.sparkContext.setLogLevel("ERROR")
bad = []
for n in workload.QUERIES:
    p = compare(spark, workload.QUERIES[n], workload.ORACLE_SQL[n], "/root/testdata/sf0.01")
    if p:
        bad.append((n, p))
        print("MISMATCH", n, p)
print("odd-layout failures:", bad)
assert not bad
PY
echo "ODD_RC=$?"
echo "=== [4/5] full oracle sweep sf0.1 ==="
python scripts_oracle_sweep.py /root/testdata/sf0.1 2>&1 | tail -2
echo "SWEEP01_RC=${PIPESTATUS[0]}"
echo "=== [5/5] bench sf0.1 --check ==="
SPARK_GRAFT_ROUND=06 python bench.py --check 2>/root/repo/bench_r6.err | tail -1 > /root/repo/bench_r6.out
echo "BENCH_RC=${PIPESTATUS[0]}"
tail -6 /root/repo/bench_r6.err
echo "=== CHAIN COMPLETE ==="
