"""Single source of truth for the build-round number.

Both bench.py (BENCH_full_r{N}.json) and tools/ci.sh (CORRECTNESS_full_
r{N}.json) derive N here, so the paired full artifacts of a round always
carry the SAME number — previously bench.py counted only BENCH_r*.json and
ci.sh only CORRECTNESS_r*.json, which could drift whenever one driver
record lagged the other.

Round = max over BOTH families of driver-written records + 1 (the driver
writes CORRECTNESS_r{N}/BENCH_r{N} when round N ends, so during round N the
highest record is N-1). Override with SPARK_GRAFT_ROUND to refresh an
existing round's artifacts.

    python tools/roundno.py   # prints the round number
"""

from __future__ import annotations

import glob
import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    recorded = [
        int(m.group(1))
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in glob.glob(os.path.join(HERE, pat))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(recorded, default=0) + 1


if __name__ == "__main__":
    print(current_round())
