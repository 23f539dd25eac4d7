#!/bin/sh
# Full verification battery: unit/integration suites, the Spark-vs-DuckDB
# oracle sweep over every registered query, the physical-plan audit, and
# every runnable tour in examples/ executed headless (so the tours can't
# rot). Any failure exits nonzero. ~30 min on 32 cores.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_correctness.py
python tools/audit_plans.py
for ex in examples/*.py; do
    echo "== $ex"
    python "$ex" > /dev/null
done
