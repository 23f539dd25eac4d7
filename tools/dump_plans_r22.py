"""Dump per-headline-query plans to plans/r22/.

Usage:
    python tools/dump_plans_r22.py before          # <query>_before.txt (static)
    python tools/dump_plans_r22.py after           # <query>_after.txt  (static)
    python tools/dump_plans_r22.py final [q1,q2]   # <query>_final.txt  (executed)

``before``/``after`` write the STATIC ``.explain("formatted")`` plan, like
round 21's tool. ``final`` additionally EXECUTES each query (noop sink) and
writes the post-execution adaptive plan (``executedPlan`` after
``getFinalPhysicalPlan`` — ReusedExchange / AQEShuffleRead visible,
``isFinalPlan=true``) plus a per-stage evidence table from the Spark event
log: stage name, task count, input bytes, shuffle read/write bytes. The
stage table is the committed proof for single-pass claims that a
``localCheckpoint`` hides from the static plan (the checkpointed subtree
prints as ``Scan ExistingRDD``, but its stages still run inside the query's
jobs and each shows up in the event log with its parquet input bytes — a
selector that ran twice would show two stages reading the corpus).

Runs at the bench scale factor (sf0.1 by default) with the same session
config the bench uses (plus an event log for ``final``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session(final: bool):
    if not final:
        from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import (
            get_spark,
        )

        return get_spark("plan-dump-r22"), None
    # mirror session.get_spark but with an event log so the stage table can
    # be harvested (the bench session keeps the UI/event log off)
    from pyspark.sql import SparkSession

    evdir = tempfile.mkdtemp(prefix="dump_plans_r22_ev_")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-dump-r22-final")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .getOrCreate()
    )
    return spark, evdir


def _stage_table(evdir: str, first_job_id: int) -> list[str]:
    """Per-stage rows (from SparkListenerStageCompleted events) for every
    stage submitted at/after ``first_job_id``'s submission."""
    rows = []
    stage_jobs: dict[int, int] = {}
    # Spark 4 rolling logs are a directory (eventlog_v2_<app>) holding
    # events_* part files; single-file logs are also accepted.
    files: list[str] = []
    for f in sorted(os.listdir(evdir)):
        p = os.path.join(evdir, f)
        if f.startswith("."):
            continue
        if os.path.isdir(p):
            files += [
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events")
            ]
        else:
            files.append(p)
    if not files:
        return ["(no event log found)"]

    def _lines():
        for p in files:
            with open(p) as fh:
                yield from fh

    for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                for sid in ev.get("Stage IDs", []):
                    stage_jobs[sid] = ev["Job ID"]
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            job = stage_jobs.get(si["Stage ID"], -1)
            if job < first_job_id:
                continue
            acc = {
                a["Name"]: a.get("Value")
                for a in si.get("Accumulables", [])
                if isinstance(a, dict)
            }

            def _n(name):
                try:
                    return int(acc.get(name) or 0)
                except (TypeError, ValueError):
                    return 0

            rows.append(
                "job=%d stage=%d tasks=%d input=%s shuffle_read=%s "
                "shuffle_write=%s name=%s"
                % (
                    job,
                    si["Stage ID"],
                    si.get("Number of Tasks", 0),
                    _n("internal.metrics.input.bytesRead"),
                    _n("internal.metrics.shuffle.read.remoteBytesRead")
                    + _n("internal.metrics.shuffle.read.localBytesRead"),
                    _n("internal.metrics.shuffle.write.bytesWritten"),
                    si.get("Stage Name", "?").split("\n")[0],
                )
            )
    return rows or ["(no completed stages recorded)"]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
        registry,
    )

    final = suffix == "final"
    spark, evdir = _session(final)
    spark.sparkContext.setLogLevel("ERROR")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r22")
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for name, spec in registry.QUERIES.items():
        if not spec.headline or (only and name not in only):
            continue
        df = spec.fn(spark, SF_DIR)
        if not final:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            body = plan.rstrip() + "\n"
        else:
            tracker = spark.sparkContext.statusTracker()
            prior = tracker.getJobIdsForGroup(None) or []
            first_job = (max(prior) + 1) if prior else 0
            # warm once so codegen/JIT noise doesn't blur the stage table,
            # then the measured execution
            df.write.format("noop").mode("overwrite").save()
            prior = tracker.getJobIdsForGroup(None) or []
            first_job = (max(prior) + 1) if prior else 0
            spec.fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            # the executed adaptive plan of the LAST execution: rebuild the
            # frame and read its executedPlan after forcing execution
            df2 = spec.fn(spark, SF_DIR)
            df2.write.format("noop").mode("overwrite").save()
            plan = df2._jdf.queryExecution().executedPlan().toString()
            # flush the event log so the stage table sees this query
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            stages = _stage_table(evdir, first_job)
            body = (
                "== Executed adaptive plan (post-execution) ==\n"
                + plan.rstrip()
                + "\n\n== Stages executed (event log; jobs >= %d: the warm"
                " run is excluded, the dumped run and the plan-rebuild run"
                " are included — the table shows TWO identical executions)"
                " ==\n"
                "== NB: 'input' counts BlockManager reads too, so stages"
                " consuming a localCheckpoint's blocks report their"
                " deserialized size as input; the real parquet scan is the"
                " stage with input>0 and shuffle_read=0 at the start of an"
                " execution's job window. One such scan per execution ="
                " the corpus pass runs once. ==\n" % first_job
                + "\n".join(stages)
                + "\n"
            )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(body)
        n += 1
    print(f"wrote {n} plans to {outdir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
