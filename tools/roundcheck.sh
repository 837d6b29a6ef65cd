#!/usr/bin/env bash
# One-command round closer: every gate the verify skill describes, in
# dependency order, failing fast. Usage: bash tools/roundcheck.sh
# Knobs: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/6 pytest"
python -m pytest tests/ -q

echo "== 2/6 driver contract (vanilla session)"
python - <<'PY'
from pyspark.sql import SparkSession
import __spark_entry__ as m
spark = SparkSession.builder.master("local[4]").getOrCreate()
assert len(m.entry(spark).collect()) > 0
q, o = m.queries(), m.oracle_sql()
print(f"entry ok; {len(q)} queries, {len(o)} oracles")
PY

echo "== 3/6 oracle differential (sf0.01, committed artifact)"
SPARK_GRAFT_SELFCHECK_JSON="${SPARK_GRAFT_SELFCHECK_JSON:-/tmp/selfcheck_round.json}" \
    python tools/selfcheck.py /root/testdata/sf0.01

echo "== 4/6 plan audit -> PLANS.md"
python tools/plan_audit.py > PLANS.md

echo "== 5/6 catalog index -> CATALOG.md"
python tools/catalog_doc.py > CATALOG.md

echo "== 6/6 bench (one line)"
python bench.py 2>/dev/null | tr '\r' '\n' | grep '"metric"' | tail -1

echo "roundcheck: ALL GREEN"
