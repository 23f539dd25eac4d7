"""O4: exactly-once streaming discovery, manifest ledger, replay semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
    fixtures,
    frames_source,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
    pipeline as sp,
)


def test_manifest_last_writer_wins(spark, tmp_path):
    m = str(tmp_path / "manifest")
    sp.append_status(spark, m, ["k1", "k2"], "in progress")
    sp.append_status(spark, m, ["k1"], "complete")
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k1": "complete", "k2": "in progress"}
    sp.clear_status(spark, m, ["k1"])
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got["k1"] is None
    sp.compact_manifest(spark, m)
    # the snapshot commit holds one row per key
    log = spark.read.parquet(sp.commit_data_path(m, sp._versions(m)[-1]))
    assert log.count() == 2
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k1": None, "k2": "in progress"}


def test_compaction_never_breaks_open_readers(spark, tmp_path):
    """Compaction is a new snapshot COMMIT: a reader plan opened before it
    still resolves afterwards (its data dirs are never touched), the live
    view reads snapshot + later appends, and vacuum reclaims commits below
    the snapshot."""
    m = str(tmp_path / "manifest")
    sp.append_status(spark, m, ["k1", "k2"], "in progress")  # v0
    sp.append_status(spark, m, ["k1"], "complete")  # v1

    reader = sp.current_manifest(spark, m)  # lazy plan over v0+v1
    sp.compact_manifest(spark, m)  # v2 = snapshot
    sp.append_status(spark, m, ["k3"], "in progress")  # v3

    # pre-compaction reader: v0/v1 data dirs are untouched
    assert {r.key: r.status for r in reader.collect()} == {
        "k1": "complete",
        "k2": "in progress",
    }
    # live view: snapshot + post-compaction append
    want = {"k1": "complete", "k2": "in progress", "k3": "in progress"}
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == want

    sp.vacuum_manifest(m, keep=1)
    assert sp._versions(m) == [2, 3]  # pre-snapshot commits reclaimed
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == want


def test_manifest_commit_is_atomic_log_rename(spark, tmp_path):
    """A commit is visible iff its log entry exists: an orphan data dir
    (crash between data write and log rename) is invisible to readers and
    clobbered by the next commit at that version."""
    import os

    m = str(tmp_path / "manifest")
    sp.append_status(spark, m, ["k1"], "in progress")  # v0
    # simulate a crashed commit: data dir for v1 written, log entry never
    # renamed into place
    spark.createDataFrame(
        [("ghost", "complete", None)], sp.MANIFEST_LOG_SCHEMA
    ).write.parquet(sp._data_path(m, 1))
    assert sp._versions(m) == [0]
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k1": "in progress"}  # ghost invisible
    sp.append_status(spark, m, ["k2"], "in progress")  # commits as v1
    assert sp._versions(m) == [0, 1]
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k1": "in progress", "k2": "in progress"}  # orphan gone
    assert not os.path.exists(
        os.path.join(sp._log_dir(m), ".tmp-00000001.json")
    )


def test_streaming_exactly_once_and_failure_marking(spark, tmp_path):
    src = str(tmp_path / "bags")
    ck = str(tmp_path / "ck")
    m = str(tmp_path / "manifest")
    out = str(tmp_path / "out")
    fixtures.write_bag_dir(src, n_bags=2, tar_gz=())

    processed: list[str] = []

    def process(batch):
        keys = [r.path for r in batch.select("path").collect()]
        processed.extend(keys)
        # quarantine contract: report failed keys, process the rest
        failed = [k for k in keys if "bag0002" in k]  # injected failure
        good = [k for k in keys if k not in failed]
        if not good:
            return failed
        # real work: decode + append to a landing table
        pdf = batch.select("path", "content").toPandas()
        import pandas as pd

        from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.sources import (
            fixtures as fx,
            rosbag_format,
        )

        frames = [
            rosbag_format.rosbag_decoder(
                r["path"], r["content"], list(fx._TOPIC_RATES)
            )
            for _, r in pdf.iterrows()
            if r["path"] in good
        ]
        sdf = spark.createDataFrame(pd.concat(frames), sp_schema())
        sdf.write.mode("append").parquet(out)
        return failed

    def sp_schema():
        return frames_source.TOPIC_MESSAGES_DDL

    # tick 1: both bags processed, marked complete
    sp.run_available_now(spark, src, ck, m, process)
    got = {r.key.split("/")[-1]: r.status for r in sp.current_manifest(spark, m).collect()}
    assert all(v == "complete" for v in got.values()) and len(got) == 2
    n_first = len(processed)
    assert n_first == 2

    # tick 2 with no new files: nothing re-processed (checkpoint exactly-once)
    sp.run_available_now(spark, src, ck, m, process)
    assert len(processed) == n_first

    # drop a new (failing) bag; only it is processed, and it's marked failure
    fixtures.write_bag_dir(src, n_bags=3, tar_gz=())  # adds bag0002
    sp.run_available_now(spark, src, ck, m, process)
    got = {r.key.split("/")[-1]: r.status for r in sp.current_manifest(spark, m).collect()}
    assert len(processed) == n_first + 1 and "bag0002" in processed[-1]
    assert [v for k, v in got.items() if "bag0002" in k] == ["failure"]
    assert sorted(v for k, v in got.items() if "bag0002" not in k) == ["complete", "complete"]

    # decoded landing table holds exactly the two good bags' messages
    landed = spark.read.parquet(out)
    want = fixtures.topic_messages(spark, n_bags=2).count()
    assert landed.count() == want


def test_replay_by_clearing_status(spark, tmp_path):
    src = str(tmp_path / "bags")
    m = str(tmp_path / "manifest")
    fixtures.write_bag_dir(src, n_bags=2, tar_gz=(1,))

    runs: list[str] = []

    def process(batch):
        runs.extend(r.path for r in batch.select("path").collect())

    first = sp.process_pending(spark, src, m, process)
    assert sorted(first.values()) == ["complete", "complete"] and len(runs) == 2

    # nothing pending on a second tick
    assert sp.process_pending(spark, src, m, process) == {}

    # clearing one key re-enqueues exactly that key (reference README replay)
    target = sorted(first)[0]
    sp.clear_status(spark, m, [target])
    replayed = sp.process_pending(spark, src, m, process)
    assert replayed == {target: "complete"}
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got[target] == "complete"


def test_manifest_time_travel(spark, tmp_path):
    import datetime as dt
    import time

    m = str(tmp_path / "manifest")
    sp.append_status(spark, m, ["k1"], "in progress")
    time.sleep(0.05)
    t_mid = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    time.sleep(0.05)
    sp.append_status(spark, m, ["k1"], "complete")
    sp.append_status(spark, m, ["k2"], "in progress")

    # as-of timestamp: k1 still in progress, k2 absent
    past = {r.key: r.status for r in sp.manifest_at(spark, m, as_of=t_mid).collect()}
    assert past == {"k1": "in progress"}

    # version travel: every append is a commit — v2 (pre-compaction head)
    # and v0 (the very first append) both stay readable after compaction
    sp.compact_manifest(spark, m)  # v3 = snapshot
    sp.append_status(spark, m, ["k1"], None)  # v4
    v2 = {r.key: r.status for r in sp.manifest_at(spark, m, version=2).collect()}
    assert v2 == {"k1": "complete", "k2": "in progress"}
    v0 = {r.key: r.status for r in sp.manifest_at(spark, m, version=0).collect()}
    assert v0 == {"k1": "in progress"}
    head = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert head["k1"] is None  # the head moved on

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not on disk"):
        sp.manifest_at(spark, m, version=99)


def test_streaming_cms_two_ticks_equal_batch(spark, tmp_path):
    """Two streaming folds of the CMS == one batch build over all data."""
    import json as _json

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    import os

    src = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    skp = str(tmp_path / "sketch")
    os.makedirs(src)

    def _write(name, types):
        with open(os.path.join(src, name), "w") as f:
            for t in types:
                f.write(_json.dumps({"event_type": t}) + "\n")

    def _tick():
        stream = spark.readStream.schema("event_type string").json(src)
        q = sp.streaming_cms(stream, skp, ck, width=32).start()
        q.awaitTermination(120)

    _write("b1.json", ["a", "a", "b"])
    _tick()
    _write("b2.json", ["a", "c", "c", "c"])
    _tick()

    streamed = {
        (r.d, r.bucket): r.c for r in spark.read.parquet(skp).collect()
    }
    batch_df = spark.createDataFrame(
        [(t,) for t in ["a", "a", "b", "a", "c", "c", "c"]], "event_type string"
    )
    direct = {
        (r.d, r.bucket): r.c
        for r in sketches.cms_build(batch_df, "event_type", width=32).collect()
    }
    assert streamed == direct
    est = {
        r.event_type: r.est_count
        for r in sketches.cms_estimate(
            spark.read.parquet(skp),
            spark.createDataFrame([("a",), ("c",), ("z",)], "event_type string"),
            "event_type",
            width=32,
        ).collect()
    }
    assert est["a"] >= 3 and est["c"] >= 3  # never underestimates


def test_cms_fold_replay_and_rollforward(spark, tmp_path):
    """The folded-epoch set commits atomically with the sketch swap: a
    replayed epoch no-ops, and an interrupted swap (sketch dir absent,
    staging complete) rolls forward without double-counting."""
    import os

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        sketches,
    )

    skp = str(tmp_path / "sketch")
    b1 = spark.createDataFrame([("a",), ("a",), ("b",)], "event_type string")
    b2 = spark.createDataFrame([("c",), ("c",)], "event_type string")

    assert sp.cms_fold_batch(b1, 0, skp, width=32) is True
    # at-least-once replay of the same epoch: committed marker wins
    assert sp.cms_fold_batch(b1, 0, skp, width=32) is False

    # simulate a crash between the two swap renames: sketch gone, staging
    # holds the complete committed fold of epoch 1
    assert sp.cms_fold_batch(b2, 1, skp, width=32) is True
    os.rename(skp, skp + "__staging")
    # replayed epoch 1 after the "crash": roll-forward then no-op
    assert sp.cms_fold_batch(b2, 1, skp, width=32) is False

    streamed = {(r.d, r.bucket): r.c for r in spark.read.parquet(skp).collect()}
    direct = {
        (r.d, r.bucket): r.c
        for r in sketches.cms_build(
            spark.createDataFrame(
                [(t,) for t in ["a", "a", "b", "c", "c"]], "event_type string"
            ),
            "event_type",
            width=32,
        ).collect()
    }
    assert streamed == direct


def test_streaming_gram_two_ticks_equals_batch(spark, tmp_path):
    """Two folded micro-batches reproduce the batch Gram matrix (decimal
    cells: exact up to the float partials' batch grouping); a replayed
    epoch no-ops."""
    import json
    import os

    import numpy as np

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.linalg import (
        gram_matrix,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming.pipeline import (
        gram_fold_batch,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 4)).round(3)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gram_path = str(tmp_path / "gram")

    b1 = df.filter("vec_id < 30")
    b2 = df.filter("vec_id >= 30")
    assert gram_fold_batch(b1, 0, gram_path, dim=4)
    assert gram_fold_batch(b2, 1, gram_path, dim=4)
    # replay of epoch 1 must no-op
    assert not gram_fold_batch(b2, 1, gram_path, dim=4)

    streamed = {
        (r.i, r.j): float(r.v)
        for r in spark.read.parquet(gram_path).collect()
    }
    batch = {
        (r.i, r.j): float(r.v) for r in gram_matrix(df, dim=4).collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        assert abs(streamed[k] - batch[k]) < 1e-6


# --- concurrent-writer torture (module-level workers for mp spawn) --------

import os as _os

# repo root derived from this file, not hardcoded — the spawn-context
# workers must import the package from THIS checkout wherever it lives
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def _torture_appender(mdir: str, tag: str, n: int) -> None:
    import sys

    sys.path.insert(0, _REPO_ROOT)
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline as sp2,
    )

    for i in range(n):
        # shared keys k0..k6 force real last-writer-wins contention
        sp2.append_status(None, mdir, [f"k{i % 7}", f"own-{tag}"], f"{tag}:{i}")


def _torture_compactor(mdir: str, rounds: int) -> None:
    import sys
    import time as _time

    sys.path.insert(0, _REPO_ROOT)
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline as sp2,
    )

    for _ in range(rounds):
        sp2.compact_manifest(None, mdir)
        _time.sleep(0.02)


def test_manifest_concurrent_writers_torture(spark, tmp_path):
    """Two OS processes appending + one compactor racing them: every
    commit gets a unique contiguous version, every committed version is
    readable, no append is lost to a racing snapshot, and last-writer-wins
    holds against a ground truth rebuilt from ALL append commits."""
    import json
    import multiprocessing as mp
    import os

    m = str(tmp_path / "manifest")
    n = 30
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_torture_appender, args=(m, "A", n)),
        ctx.Process(target=_torture_appender, args=(m, "B", n)),
        ctx.Process(target=_torture_compactor, args=(m, 6)),
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
        assert p.exitcode == 0

    versions = sp._versions(m)
    # contiguous, no double-claimed or skipped numbers
    assert versions == list(range(len(versions)))
    entries = {v: sp._read_entry(m, v) for v in versions}
    appends = [v for v, e in entries.items() if e["action"] == "append"]
    assert len(appends) == 2 * n  # no append commit lost

    # every committed version resolves to complete, readable data
    for v in versions:
        assert sp._read_log_arrow(sp._log_paths(m, v)).num_rows > 0
    # and the Spark reader agrees at a sample of versions incl. head
    for v in {0, versions[len(versions) // 2], versions[-1]}:
        sp.manifest_at(spark, m, version=v).collect()

    # ground truth: LWW over the union of ALL append commits
    rows = []
    for v in appends:
        t = sp._read_log_arrow([sp.commit_data_path(m, v)]).to_pandas()
        rows.extend(
            (r.key, r.status, r.updated_at) for r in t.itertuples()
        )
    best: dict = {}
    for k, s, ts in rows:
        best.setdefault(k, []).append((ts, s))
    got = {
        r.key: (r.status, r.updated_at)
        for r in sp.current_manifest(spark, m).collect()
    }
    assert set(got) == set(best)
    for k, cands in best.items():
        t_max = max(ts for ts, _ in cands)
        winners = {s for ts, s in cands if ts == t_max}
        status, ts_got = got[k]
        assert status in winners
        assert ts_got == t_max.to_pydatetime().replace(tzinfo=None)

    # a final compaction + vacuum keeps exactly the live state readable
    sp.compact_manifest(spark, m)
    sp.vacuum_manifest(m, keep=1)
    after = {
        r.key: r.status for r in sp.current_manifest(spark, m).collect()
    }
    assert after == {k: got[k][0] for k in got}

def test_manifest_mixed_writer_compaction(spark, tmp_path):
    """A log that mixes Spark-written and pyarrow-staged commits must be
    readable and compactable by BOTH engines: Spark parquet timestamps
    read back as naive ns, the driver-side staging writes tz-aware us —
    _read_log_arrow normalizes before the concat (regression: the
    driver-side compactor crashed with ArrowTypeError on exactly the
    deployment the spark=None API exists for)."""
    m = str(tmp_path / "manifest")
    sp.append_status(spark, m, ["k1", "k2"], "started")  # Spark writer
    sp.append_status(None, m, ["k2"], "done")  # non-Spark orchestrator

    # driver-side (no-JVM) compaction over the mixed log
    sp.compact_manifest(None, m)
    want = {"k1": "started", "k2": "done"}
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == want

    # keep mixing after the snapshot; Spark-side compaction of the mix
    sp.append_status(spark, m, ["k3"], "started")
    sp.compact_manifest(spark, m)
    sp.append_status(None, m, ["k1"], "done")
    want = {"k1": "done", "k2": "done", "k3": "started"}
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == want
    # arrow reader agrees at head (mixed snapshot + arrow append)
    t = sp._read_log_arrow(
        sp._log_paths(m, sp._versions(m)[-1])
    ).to_pandas()
    arrow_lww = (
        t.sort_values("updated_at", kind="mergesort")
        .drop_duplicates("key", keep="last")
    )
    assert {
        r.key: (None if r.status != r.status else r.status)
        for r in arrow_lww.itertuples()
    } == want


def test_vacuum_reclaims_orphans(tmp_path):
    """Crashed commits (staged data dir / claim temp, never linked) are
    reclaimed by vacuum once older than the TTL; fresh orphans and every
    referenced commit dir survive."""
    import os
    import time

    m = str(tmp_path / "manifest")
    sp.append_status(None, m, ["k1"], "started")
    sp.append_status(None, m, ["k1"], "done")

    old_orphan = os.path.join(m, "data", "c-deadbeefdeadbeef")
    os.makedirs(old_orphan)
    new_orphan = os.path.join(m, "data", "c-cafebabecafebabe")
    os.makedirs(new_orphan)
    old_tmp = os.path.join(sp._log_dir(m), ".tmp-crashed.json")
    with open(old_tmp, "w") as f:
        f.write("{}")
    past = time.time() - 7 * 24 * 3600
    os.utime(old_orphan, (past, past))
    os.utime(old_tmp, (past, past))

    sp.vacuum_manifest(m, keep=2)  # default 24h TTL
    assert not os.path.exists(old_orphan)
    assert not os.path.exists(old_tmp)
    assert os.path.exists(new_orphan)  # inside TTL: could be in-flight
    # both committed versions still fully readable
    for v in sp._versions(m):
        assert sp._read_log_arrow(sp._log_paths(m, v)).num_rows > 0
    # ttl=0 reclaims the rest
    sp.vacuum_manifest(m, keep=2, orphan_ttl_s=0.0)
    assert not os.path.exists(new_orphan)
    for v in sp._versions(m):
        assert sp._read_log_arrow(sp._log_paths(m, v)).num_rows > 0


def test_lww_equal_timestamps_resolve_by_commit_order(spark, tmp_path):
    """Two appends carrying the SAME updated_at must resolve to the later
    COMMIT deterministically, in both the Spark reader and the driver-side
    arrow compactor (regression: row_number over updated_at alone picked
    an arbitrary winner)."""
    import datetime as dt

    m = str(tmp_path / "manifest")
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    rel = sp._stage_rows(None, m, [("k", "first", ts)])
    sp._claim_commit(m, "append", rel)
    rel = sp._stage_rows(None, m, [("k", "second", ts)])
    sp._claim_commit(m, "append", rel)

    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k": "second"}

    sp.compact_manifest(None, m)  # arrow compactor must agree
    got = {r.key: r.status for r in sp.current_manifest(spark, m).collect()}
    assert got == {"k": "second"}


def test_streaming_chunk_store_uploads_only_the_delta(spark, tmp_path):
    """Two availableNow ticks through the content-addressed chunk store:
    tick 1 ingests the v1 corpus, tick 2 the preamble-edited v2 snapshot.
    The store must (a) equal the batch-computed distinct chunk set after
    each tick (streaming == batch), (b) grow by exactly v2's anti-join
    delta — the cdc_delta_sync bill, realized continuously — and (c) stay
    duplicate-free even when a batch is REPLAYED (foreachBatch
    at-least-once), because the anti-join makes the append idempotent."""
    import json
    import os

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        curation,
    )
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline,
    )

    v1 = [
        (1, "the quick brown fox jumps over the lazy dog and runs far "
            "away into the night while seven silent owls watch"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    v2 = [(i, "inserted preamble tokens " + t) for i, t in v1]

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    def _w(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    def _tick():
        stream = spark.readStream.schema("doc_id long, text string").json(src)
        pipeline.run_chunk_store_stream(
            spark, stream, store, ck, min_tokens=2, max_tokens=8
        )

    def _batch_hashes(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            (r.h, r.n_tokens)
            for r in curation.cdc_chunks(
                df, avg_tokens=8, min_tokens=2, max_tokens=8
            ).select(F.md5("chunk").alias("h"), "n_tokens").distinct()
            .collect()
        }

    _w("t1.json", v1)
    _tick()
    got1 = {(r.h, r.n_tokens) for r in spark.read.parquet(store).collect()}
    assert got1 == _batch_hashes(v1)

    _w("t2.json", v2)
    _tick()
    stored = spark.read.parquet(store)
    got2 = {(r.h, r.n_tokens) for r in stored.collect()}
    assert got2 == _batch_hashes(v1) | _batch_hashes(v2)
    # duplicate-free store: one row per content hash
    assert stored.count() == stored.select("h").distinct().count()
    # the tick-2 upload bill is exactly the anti-join delta, and the
    # content-defined boundaries keep it well under a full re-upload
    delta = len(got2) - len(got1)
    assert delta == len(_batch_hashes(v2) - _batch_hashes(v1))
    assert 0 < delta < len(_batch_hashes(v2))

    # replayed batch (at-least-once) appends nothing: chunk-level idempotence
    n_before = stored.count()
    v2_df = spark.createDataFrame(v2, "doc_id long, text string")
    pipeline.chunk_store_sink(
        spark, store, min_tokens=2, max_tokens=8
    )(v2_df, 0)
    assert spark.read.parquet(store).count() == n_before


def test_chunk_store_existence_probe_is_storage_agnostic(spark, tmp_path):
    """The 'does the store exist yet' probe must go through Spark's own
    reader (try spark.read.parquet / catch AnalysisException), never a
    driver-local os.listdir — an object-store path (s3a://…) is invisible
    to os.path, and treating a populated store as absent would skip the
    anti-join and re-append the whole corpus. Exercised here: (a) a
    nonexistent path takes the except branch and the first append
    succeeds; (b) an existing-but-parquet-less directory is likewise
    treated as absent; (c) a pre-populated store takes the read branch —
    replaying the identical batch appends zero rows even though the
    directory was created by a different writer than this sink call."""
    import os

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    sink = pipeline.chunk_store_sink(spark, str(tmp_path / "s1"),
                                     min_tokens=2, max_tokens=8)
    sink(docs, 0)  # (a) nonexistent path: except-branch, append succeeds
    n = spark.read.parquet(str(tmp_path / "s1")).count()
    assert n > 0

    empty = tmp_path / "s2"
    os.makedirs(empty)  # (b) exists but holds no parquet: still "absent"
    pipeline.chunk_store_sink(spark, str(empty),
                              min_tokens=2, max_tokens=8)(docs, 0)
    assert spark.read.parquet(str(empty)).count() == n

    # (c) pre-populated by a PRIOR sink instance: a fresh sink closure
    # must discover the existing rows via the try-read and append nothing
    pipeline.chunk_store_sink(spark, str(tmp_path / "s1"),
                              min_tokens=2, max_tokens=8)(docs, 1)
    assert spark.read.parquet(str(tmp_path / "s1")).count() == n


def test_chunk_store_probe_reraises_non_absence_failures(spark, tmp_path):
    """The existence-probe catch is narrowed to PATH_NOT_FOUND /
    UNABLE_TO_INFER_SCHEMA — the two conditions that mean 'store absent'.
    Any OTHER analysis failure (here: the path holds parquet with a
    foreign schema, i.e. not a chunk store at all) must re-raise:
    swallowing it would treat a damaged store as absent, skip the
    anti-join, and re-append the whole corpus."""
    from pyspark.errors import AnalysisException

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.streaming import (
        pipeline,
    )

    bad = str(tmp_path / "not_a_store")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(bad)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    with pytest.raises(AnalysisException):
        pipeline.chunk_store_sink(spark, bad, min_tokens=2, max_tokens=8)(
            docs, 0
        )
    # and the damaged path was NOT appended to
    assert set(spark.read.parquet(bad).columns) == {"a", "b"}
