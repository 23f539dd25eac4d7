#!/bin/sh
# Full verification battery: unit/integration suites, the Spark-vs-DuckDB
# oracle sweep over every registered query, and the physical-plan audit.
# Any failure exits nonzero. ~25 min on 32 cores.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_correctness.py
python tools/audit_plans.py
