"""Property-based tests (hypothesis) for the flatten/n-gram/audit invariants
promised in SURVEY §5. Each example batches many generated docs into ONE
Spark job to keep runtime sane.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
    hashing as H,
    text as T,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    frames as fr,
)

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(DOC, min_size=1, max_size=30))
def test_word_ngrams_invariants(spark, docs):
    """|ngrams| == max(0, n_tokens - n + 1); every n-gram has n tokens and
    appears verbatim in the source."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    rows = df.select(
        "i", T.word_ngrams(F.col("text"), 3).alias("g"), T.tokens(F.lower(F.col("text"))).alias("t")
    ).collect()
    for r in rows:
        toks = docs[r.i].lower().split() if docs[r.i].strip() else [docs[r.i].lower()]
        n_toks = len(r.t)
        assert len(r.g) == max(0, n_toks - 2)
        for g in r.g:
            assert len(g.split(" ")) == 3
            assert g in " ".join(r.t)


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 40)),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_gap_audit_reconstructs_missing_indices(spark, items):
    """Sum of `missed` per camera == (max-min+1) - n_present."""
    df = spark.createDataFrame(
        [("bag", cam, idx) for cam, idx in items], "bag_id string, camera string, frame_index int"
    )
    audited = fr.gap_audit(df).groupBy("camera").agg(F.sum("missed").alias("m"))
    got = {r.camera: r.m for r in audited.collect()}
    per_cam: dict[str, list[int]] = {}
    for cam, idx in items:
        per_cam.setdefault(cam, []).append(idx)
    for cam, idxs in per_cam.items():
        want = (max(idxs) - min(idxs) + 1) - len(idxs)
        assert got.get(cam, 0) == want


@SLOW
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=50))
def test_quantize_half_up(spark, xs):
    """quantize matches Python floor(x*10^4+0.5)/10^4 on identical doubles."""
    import math

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {r.i: r.q for r in df.select("i", H.quantize(F.col("x"), 4).alias("q")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == pytest.approx(math.floor(x * 10000 + 0.5) / 10000, abs=0, rel=None)


@SLOW
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=25),
)
def test_asof_join_matches_bisect(spark, lefts, rights):
    """asof_join == python bisect of the latest right ts <= left ts per key."""
    import bisect
    import datetime as dt

    t0 = dt.datetime(2021, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(k, ts(s), i) for i, (k, s) in enumerate(lefts)], "k long, lts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(k, ts(s), f"v{k}:{s}") for k, s in set(rights)], "k long, rts timestamp, val string"
    )
    got = {
        r.lid: r.val
        for r in asof_join(left, right, "k", "lts", "rts", ["val"]).collect()
    }
    by_key: dict[int, list[tuple[int, str]]] = {}
    for k, s in set(rights):
        by_key.setdefault(k, []).append((s, f"v{k}:{s}"))
    for v in by_key.values():
        v.sort()
    for i, (k, s) in enumerate(lefts):
        cands = by_key.get(k, [])
        pos = bisect.bisect_right([c[0] for c in cands], s)
        want = cands[pos - 1][1] if pos else None
        assert got[i] == want, (i, k, s)


@SLOW
@given(st.lists(DOC, min_size=2, max_size=20))
def test_fingerprint_iff_normalized_equal(spark, docs):
    """Two docs share fp_exact iff their normalized forms are equal."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    rows = df.select("i", T.fingerprint(F.col("text")).alias("fp")).collect()

    def norm(s: str) -> str:
        return " ".join(s.lower().split())

    fps = {r.i: r.fp for r in rows}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            assert (fps[i] == fps[j]) == (norm(docs[i]) == norm(docs[j]))


@SLOW
@given(
    st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=40),
    st.integers(min_value=8, max_value=64),
)
def test_pack_exact_firstfit_property(spark, lens, capacity):
    """First-fit packing invariants for arbitrary token lengths/capacities:
    per-shard bins are dense from 0, no bin over capacity unless singleton,
    and the assignment equals a sequential replay of the recurrence."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        curation,
    )

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = curation.pack_sequences_exact(df, capacity=capacity, n_shards=3).collect()
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        ref, fill, cur = [], 0, 0
        for r in members:
            if fill > 0 and fill + r.n_tokens > capacity:
                cur, fill = cur + 1, 0
            ref.append(cur)
            fill += r.n_tokens
        assert [r.bin_id for r in members] == ref
        fills: dict[int, list] = {}
        for r, b in zip(members, ref):
            fills.setdefault(b, []).append(r.n_tokens)
        assert sorted(fills) == list(range(len(fills)))
        for ns in fills.values():
            assert sum(ns) <= capacity or len(ns) == 1


@SLOW
@given(
    st.lists(DOC, min_size=1, max_size=20),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=1, max_value=10),
)
def test_chunk_documents_property(spark, docs, size, stride):
    """Chunk invariants for arbitrary size/stride: concatenating stride
    offsets reconstructs the token sequence, chunk_ids are dense, lengths
    are min(size, remaining)."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        curation,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = curation.chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, d in enumerate(docs):
        toks = d.split()
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c.chunk_id * stride
            want = toks[start : start + size]
            # empty doc tokenizes to [''] (split convention shared with the
            # oracle); its single chunk is the empty string
            if not toks:
                assert c.chunk == ""
                continue
            assert want, "no chunk may start past the last token"
            assert c.chunk.split() == want
            assert c.n_tokens == len(want)


@SLOW
@given(
    st.lists(DOC, min_size=1, max_size=20),
    st.sampled_from([3, 5, 8]),
    st.integers(1, 4),
    st.integers(0, 8),
)
def test_cdc_chunks_bounded_matches_sequential_fold(
    spark, docs, avg, mint, extra
):
    """cdc_chunks == the sequential reference fold for arbitrary docs and
    (avg, min, max) parameter draws: same chunks, same order, same token
    counts; every chunk <= max and every non-final chunk >= min."""
    import hashlib

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        curation,
    )

    maxt = mint + extra

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(text: str) -> list[tuple[str, int]]:
        toks = text.strip().lower().split()
        if text.strip() == "":
            toks = [""]  # split-on-\\s+ convention shared with the engine
        done, cur, cnt = [], [], 0
        for t in toks:
            cur.append(t)
            cnt += 1
            hit = md5_long(t) % avg == 0 and cnt >= mint
            if hit or cnt >= maxt:
                done.append((" ".join(cur), cnt))
                cur, cnt = [], 0
        if cnt > 0:
            done.append((" ".join(cur), cnt))
        return done

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = curation.cdc_chunks(
        df, avg_tokens=avg, min_tokens=mint, max_tokens=maxt
    ).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, d in enumerate(docs):
        want = ref(d)
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert [(c.chunk, c.n_tokens) for c in chunks] == want
        for c in chunks:
            assert c.n_tokens <= maxt
        for c in chunks[:-1]:
            assert c.n_tokens >= mint


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 3600), st.floats(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_resample_ffill_matches_brute_force(spark, events):
    """Every grid value equals the value of the latest event at or before
    the grid point (computed brute-force in Python); grid is step-aligned
    and spans floor(min)..max per key."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.resample import (
        resample_ffill,
    )

    t0 = dt.datetime(2022, 1, 1)
    step = 300
    rows = [
        (k, t0 + dt.timedelta(seconds=s), v, i)
        for i, (k, s, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, eid long")
    got = resample_ffill(df, "k", "ts", "v", step, tie_col="eid").collect()

    by_key: dict = {}
    for k, ts, v, eid in rows:
        by_key.setdefault(k, []).append((ts, eid, v))
    for r in got:
        evs = sorted(by_key[r.k])
        sec = (r.grid_ts - t0).total_seconds()
        assert sec % step == 0  # aligned
        prior = [v for ts, _eid, v in evs if ts <= r.grid_ts]
        assert r.v == (prior[-1] if prior else None)
    # row-count check: per key, floor(min)..max inclusive
    import math

    for k, evs in by_key.items():
        lo = math.floor((min(e[0] for e in evs) - t0).total_seconds() / step)
        hi = math.floor((max(e[0] for e in evs) - t0).total_seconds() / step)
        assert sum(1 for r in got if r.k == k) == hi - lo + 1


@SLOW
@given(st.lists(DOC, min_size=1, max_size=25))
def test_repetition_scores_bounds_and_unique_case(spark, docs):
    """Fractions live in [0,1]; a doc whose bigrams are all distinct scores
    dup_gram_frac == 0; n_grams == max(0, n_tokens-1) for nonempty docs."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
        textstats,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textstats.repetition_scores(df).collect()}
    for i, d in enumerate(docs):
        toks = d.lower().split()
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if not grams:
            assert i not in out
            continue
        r = out[i]
        assert r.n_grams == len(grams)
        assert 0.0 <= r.dup_gram_frac <= 1.0
        assert 0.0 <= r.top_gram_share <= 1.0
        if len(set(grams)) == len(grams):
            assert r.dup_gram_frac == 0.0


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),   # start offset (s)
            st.integers(min_value=0, max_value=120),   # duration (s)
        ),
        min_size=1,
        max_size=16,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_interval_overlap_join_matches_brute_force(spark, lefts, rights):
    """Bucketed interval-overlap join == the O(n·m) python reference, for
    ANY bucket width (exactly-once anchor rule, closed intervals)."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.range_join import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2021, 1, 1)

    def mk(rows):
        return [
            (i, t0 + dt.timedelta(seconds=s), t0 + dt.timedelta(seconds=s + d))
            for i, (s, d) in enumerate(rows)
        ]

    lr, rr = mk(lefts), mk(rights)
    ldf = spark.createDataFrame(lr, "lid long, s_ts timestamp, e_ts timestamp")
    rdf = spark.createDataFrame(rr, "rid long, s_ts timestamp, e_ts timestamp")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, "s_ts", "e_ts", "s_ts", "e_ts", bucket_ms=37_000
        ).collect()
    )
    want = sorted(
        (li, ri)
        for (li, ls, le) in lr
        for (ri, rs, re) in rr
        if ls <= re and rs <= le
    )
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=1000),   # ts offset
            st.sampled_from(["a", "b", "c"]),           # attr
        ),
        min_size=1,
        max_size=24,
    )
)
def test_change_intervals_tiles_timeline(spark, rows):
    """SCD2 invariants: per key, intervals are disjoint, ordered, tile the
    observed range (each valid_to == next valid_from), exactly one open
    (current) interval, and adjacent intervals carry different values."""
    import datetime as dt

    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.scd import (
        change_intervals,
    )

    t0 = dt.datetime(2021, 1, 1)
    data = [
        (u, t0 + dt.timedelta(seconds=s), i, a)
        for i, (u, s, a) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = change_intervals(df, "user_id", "ts", "event_type", "event_id")
    by_key: dict = {}
    for r in out.collect():
        by_key.setdefault(r.user_id, []).append(r)
    for key, ivs in by_key.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and opens[0] is ivs[-1]
        assert opens[0].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # tiling, no gaps/overlap
            assert a.event_type != b.event_type  # runs collapsed
