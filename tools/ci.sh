#!/bin/sh
# Full verification battery: unit/integration suites, the physical-plan
# audit, every runnable tour in examples/ executed headless (so the tours
# can't rot), then — MANDATORY LAST — regeneration of this round's full
# Spark-vs-DuckDB oracle artifact and the freshness gate over both
# committed full artifacts (CORRECTNESS_full must cover every registered
# query, BENCH_full must time every headline query). Registering a query
# after the artifact refresh now fails CI instead of silently shipping a
# stale record. Any failure exits nonzero. ~30 min on 32 cores.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/audit_plans.py
for ex in examples/*.py; do
    echo "== $ex"
    python "$ex" > /dev/null
done
# round = next after the highest driver-recorded CORRECTNESS_r{N}.json
# (overridable via SPARK_GRAFT_ROUND to refresh an existing artifact)
RND="${SPARK_GRAFT_ROUND:-$(python - <<'PY'
import glob, re
rs = [int(m.group(1)) for p in glob.glob("CORRECTNESS_r*.json")
      if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
print(max(rs, default=0) + 1)
PY
)}"
RND=$(printf "%02d" "$RND")
python tools/check_correctness.py --json "CORRECTNESS_full_r${RND}.json"
python tools/check_artifact_freshness.py
