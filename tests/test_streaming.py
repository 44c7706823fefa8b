"""Structured Streaming tests: idempotent foreachBatch upsert across
redelivered files, watermarked windowed aggregation parity with the batch
engine, and session windows."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.streaming import (
    sessionize_events,
    stream_upsert_ingest,
    windowed_event_counts,
)
from mrf_etl_spark.streaming.ingest import read_event_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    # events.ts has shipped both as INT64 nanos (read as long) and as
    # timestamp[us] (read as TIMESTAMP_NTZ); normalize like plans/parity.t
    from pyspark.sql import types as T

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        conv = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        conv = F.col("ts").cast("timestamp_ltz")
    return df.withColumn("ts", conv)


def test_stream_upsert_idempotent(spark, events, tmp_path):
    drop_dir = str(tmp_path / "drop")
    lake = str(tmp_path / "lake/events")

    # first drop: 2 files
    events.filter(F.col("event_id") < 600).write.parquet(drop_dir)
    stream = read_event_stream(spark, drop_dir)
    q = stream_upsert_ingest(
        stream, lake, keys=["event_id"], checkpoint_dir=str(tmp_path / "ckpt1")
    )
    assert q.awaitTermination(120)
    n1 = spark.read.parquet(lake).count()
    assert n1 == 600

    # second drop OVERLAPS the first (redelivery) + brings new rows; fresh
    # checkpoint simulates a replayed source — the uid upsert dedups anyway
    events.filter(F.col("event_id") >= 400).write.mode("append").parquet(drop_dir)
    shutil.rmtree(str(tmp_path / "ckpt1"))
    q2 = stream_upsert_ingest(
        read_event_stream(spark, drop_dir), lake, keys=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert q2.awaitTermination(120)
    out = spark.read.parquet(lake)
    assert out.count() == 1000  # overlap inserted once
    assert out.select("event_id").distinct().count() == 1000


def test_windowed_counts_stream_matches_batch(spark, events, tmp_path):
    drop_dir = str(tmp_path / "drop")
    out_dir = str(tmp_path / "agg_out")
    events.write.parquet(drop_dir)

    agg_stream = windowed_event_counts(read_event_stream(spark, drop_dir))
    q = (
        agg_stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = spark.read.parquet(out_dir)

    batch = windowed_event_counts(events)
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch computation exactly
    assert streamed.count() > 0
    mismatches = streamed.join(
        batch,
        on=["window_start", "window_end", "event_type", "n_events", "total_value"],
        how="left_anti",
    ).count()
    assert mismatches == 0


def test_sessionize_events_batch_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 5.0),
        (2, "2024-01-01 10:10:00", 5.0),   # same session (gap < 30m)
        (3, "2024-01-01 11:30:00", 2.0),   # new session (80m gap)
        (4, "2024-01-01 10:05:00", 1.0),   # user 2
    ]
    events = spark.createDataFrame(
        [(i, ts, 1 if i < 4 else 2, "click", v, "{}") for (i, ts, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sess = sessionize_events(events, gap="30 minutes").collect()
    u1 = sorted([s for s in sess if s.user_id == 1], key=lambda s: s.session_start)
    assert len(u1) == 2
    assert u1[0].n_events == 2 and u1[0].session_value == 10.0
    assert u1[1].n_events == 1
    # session end = last event + gap
    assert (u1[0].session_end - u1[0].session_start).total_seconds() == 10 * 60 + 30 * 60


def test_stateful_running_totals_across_batches(spark, events, tmp_path):
    """applyInPandasWithState: state (count / seen-users / integer cents)
    must accumulate across micro-batches — two files forced into separate
    triggers, final update per key == the one-shot batch aggregate."""
    from pyspark.sql.window import Window

    from mrf_etl_spark.streaming import stateful_running_totals
    from mrf_etl_spark.streaming.ingest import EVENTS_SCHEMA

    drop_dir = str(tmp_path / "drop")
    half = events.filter(F.col("event_id") < 500).coalesce(1)
    rest = events.filter(F.col("event_id") >= 500).coalesce(1)
    half.write.parquet(drop_dir)
    rest.write.mode("append").parquet(drop_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_st4")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    mem = spark.table("t_st4")
    # >1 batch for at least one key => updates were emitted more than once
    assert mem.count() > mem.select("event_type").distinct().count()
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    final = (
        mem.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    expected = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
    )
    got = {r.event_type: (r.n_events, r.n_users, r.total_cents) for r in final.collect()}
    want = {r.event_type: (r.n_events, r.n_users, r.total_cents) for r in expected.collect()}
    assert got == want


def test_interval_join_streams_batch_twin(spark):
    """The watermarked interval join runs unchanged on batch frames; known
    pairs: a click at t joins same-user views in [t - lookback, t]."""
    from datetime import datetime

    from mrf_etl_spark.streaming import interval_join_streams

    def ts(h):
        return datetime(2024, 1, 1, h)

    clicks = spark.createDataFrame(
        [(1, 100, ts(10)), (2, 101, ts(10))],
        "user_id long, click_id long, click_ts timestamp",
    )
    views = spark.createDataFrame(
        [
            (1, 200, ts(9)),   # in window
            (1, 201, ts(7)),   # outside 2h lookback
            (1, 202, ts(11)),  # after the click
            (2, 203, ts(10)),  # equal ts: included
        ],
        "user_id long, view_id long, view_ts timestamp",
    )
    out = interval_join_streams(
        clicks, views, on="user_id",
        left_ts="click_ts", right_ts="view_ts", lookback="2 hours",
    )
    got = {(r.click_id, r.view_id) for r in out.collect()}
    assert got == {(100, 200), (101, 203)}

    import pytest

    with pytest.raises(ValueError):
        interval_join_streams(clicks, views, on="user_id")


def test_stream_dedup_ingest_redelivery_inserts_nothing(spark, sf_dir, tmp_path):
    """A redelivered micro-batch (batch 3 == batch 2) must insert zero
    docs: every doc matches its own identical signature in the index."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from mrf_etl_spark.streaming import stream_dedup_ingest

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    staging = str(tmp_path / "staging")
    os.makedirs(staging, exist_ok=True)

    def stage(df, name, mtime):
        tmp = str(tmp_path / f"{name}_tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = f"{staging}/{name}.parquet"
        shutil.copy(f"{tmp}/{part}", dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    stage(corpus, "b1", now - 120)
    stage(batch, "b2", now - 60)
    stage(batch, "b3", now)  # exact redelivery of b2
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    lake = str(tmp_path / "lake")
    q = stream_dedup_ingest(
        stream, lake, str(tmp_path / "index"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300)
    got = {r.doc_id for r in spark.read.parquet(lake).select("doc_id").collect()}
    # natural near-dups between odd/even docs may drop some batch docs,
    # but the redelivered batch contributes NOTHING new
    assert got <= {r.doc_id for r in d.collect()}
    n_rows = spark.read.parquet(lake).count()
    assert n_rows == len(got)  # no doc ingested twice


def test_incremental_mv_batch_boundary_independent(spark, events, tmp_path):
    """stream_incremental_rollup: the MV after draining equals the batch
    GROUP BY whether the stream arrived as ONE micro-batch or as two —
    the algebraic-delta merge is associative by construction. Also pins
    that means are NOT merged (only count/sum columns exist in the MV)."""
    from pyspark.sql import types as T

    from mrf_etl_spark.streaming import stream_incremental_rollup

    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    agg_exprs = {
        "n_events": "count(*)",
        "cents": "sum(cast(round(value * 100) as bigint))",
    }
    expected = {
        r["event_type"]: (r["n"], r["c"])
        for r in raw.groupBy("event_type")
        .agg(F.expr(agg_exprs["n_events"]).alias("n"), F.expr(agg_exprs["cents"]).alias("c"))
        .collect()
    }

    def drain(n_files: int) -> dict:
        staging = str(tmp_path / f"staging{n_files}")
        if n_files == 1:
            raw.write.parquet(f"{staging}/all")
        else:
            raw.filter(F.col("event_id") % 2 == 0).write.parquet(f"{staging}/a")
            raw.filter(F.col("event_id") % 2 == 1).write.parquet(f"{staging}/b")
        stream = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{staging}/*")
        )
        mv = str(tmp_path / f"mv{n_files}")
        q = stream_incremental_rollup(
            stream, mv, str(tmp_path / f"ckpt{n_files}"),
            keys=["event_type"], agg_exprs=agg_exprs,
        )
        assert q.awaitTermination(300)
        out = spark.read.parquet(mv)
        assert set(out.columns) == {"event_type", "n_events", "cents"}
        return {r["event_type"]: (r["n_events"], r["cents"]) for r in out.collect()}

    assert drain(1) == expected
    assert drain(2) == expected


def test_incremental_mv_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the MV swap but before
    the checkpoint commit re-delivers the same batch_id. Re-invoking the
    batch writer with an already-applied batch_id must be a no-op (the
    _applied_batch_id sidecar gates the additive merge), while the NEXT
    batch_id still merges."""
    from mrf_etl_spark.streaming.ingest import incremental_rollup_batch_writer

    mv = str(tmp_path / "mv_replay")
    write_batch = incremental_rollup_batch_writer(
        mv, keys=["event_type"], agg_exprs={"n": "count(*)", "v": "sum(cast(value as bigint))"}
    )
    b0 = spark.createDataFrame(
        [("view", 1), ("view", 2), ("click", 5)], "event_type string, value long"
    )
    b1 = spark.createDataFrame([("view", 10)], "event_type string, value long")

    def snap():
        return {
            r["event_type"]: (r["n"], r["v"])
            for r in spark.read.parquet(mv).collect()
        }

    write_batch(b0, 0)
    after_b0 = snap()
    assert after_b0 == {"view": (2, 3), "click": (1, 5)}
    write_batch(b0, 0)  # replayed batch: must NOT double-count
    assert snap() == after_b0
    write_batch(b1, 1)  # next batch still applies
    assert snap() == {"view": (3, 13), "click": (1, 5)}
    write_batch(b1, 1)  # replay of the new head is a no-op too
    assert snap() == {"view": (3, 13), "click": (1, 5)}


def test_incremental_mv_legacy_sidecar_still_guards_replay(spark, tmp_path):
    """Upgrade path: an MV written by the pre-lineage code has a
    single-line sidecar (batch id only, stream_id None). A lineage-aware
    writer replaying the SAME batch over it must still skip — a legacy
    marker belongs to the current lineage by definition, and bypassing
    the guard would double-count, the one corruption the watermark
    exists to prevent. The next batch then applies and upgrades the
    sidecar to the two-line form."""
    import os

    from mrf_etl_spark.streaming.ingest import (
        _BATCH_ID_SIDECAR,
        incremental_rollup_batch_writer,
    )

    mv = str(tmp_path / "mv_legacy")
    b0 = spark.createDataFrame(
        [("view", 1), ("click", 5)], "event_type string, value long"
    )
    # legacy writer: no stream_id -> single-line sidecar
    legacy = incremental_rollup_batch_writer(
        mv, keys=["event_type"], agg_exprs={"n": "count(*)"}
    )
    legacy(b0, 7)
    assert open(os.path.join(mv, _BATCH_ID_SIDECAR)).read().strip() == "7"

    def snap():
        return {
            r["event_type"]: r["n"] for r in spark.read.parquet(mv).collect()
        }

    after = snap()
    upgraded = incremental_rollup_batch_writer(
        mv,
        keys=["event_type"],
        agg_exprs={"n": "count(*)"},
        stream_id="ckpt-dir-A",
    )
    upgraded(b0, 7)  # at-least-once replay across the upgrade: no-op
    assert snap() == after
    upgraded(b0, 8)  # next batch applies and stamps the lineage
    assert snap() == {"view": after["view"] * 2, "click": after["click"] * 2}
    marker = open(os.path.join(mv, _BATCH_ID_SIDECAR)).read().splitlines()
    assert marker == ["ckpt-dir-A", "8"]


def test_incremental_mv_corrupt_sidecar_fails_with_diagnostic(spark, tmp_path):
    """ADVICE r7: an empty or non-numeric sidecar (crash between create
    and write, manual edit) must raise a descriptive error naming the
    expected format — not an IndexError/ValueError deep in int() — and
    must NOT silently disarm the replay guard (that risks double-apply,
    the corruption the sidecar exists to prevent)."""
    import os

    import pytest

    from mrf_etl_spark.streaming.ingest import (
        _BATCH_ID_SIDECAR,
        incremental_rollup_batch_writer,
    )

    mv = str(tmp_path / "mv_corrupt")
    b0 = spark.createDataFrame([("view", 1)], "event_type string, value long")
    write_batch = incremental_rollup_batch_writer(
        mv, keys=["event_type"], agg_exprs={"n": "count(*)"}
    )
    write_batch(b0, 0)
    marker = os.path.join(mv, _BATCH_ID_SIDECAR)
    for bad in ("", "not-a-number", "sid-only\nnot-a-number"):
        with open(marker, "w") as fh:
            fh.write(bad)
        with pytest.raises(ValueError, match="sidecar"):
            write_batch(b0, 1)
    # MV content untouched by the failed attempts
    assert spark.read.parquet(mv).collect()[0]["n"] == 1


def test_watermark_drops_late_data(spark, tmp_path):
    """The watermark CONTRACT, not just parity: once a window has been
    finalized and EVICTED (the watermark passed its end in an earlier
    micro-batch), a late event for it is dropped from the aggregation.
    Nuance pinned here: eviction happens at batch END, after that
    batch's input merges — so a late row arriving in the same batch
    that closes its window still lands (deterministic, and kinder than
    dropping data the sink has not yet seen). Batch 1 carries hours
    0-5; batch 2's hour-12 event advances the watermark and evicts
    them; batch 3 redelivers an hour-0 event -> dropped. The sink must
    show exactly one event in the hour-0 window."""
    import os
    import time

    from mrf_etl_spark.streaming import windowed_event_counts

    base = 1_700_000_000_000_000  # µs epoch, arbitrary
    hour = 3_600_000_000

    def mk(rows, name, mtime):
        df = spark.createDataFrame(rows, "event_id long, ts_us long, event_type string, value double")
        tmp = str(tmp_path / f"_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        staging = str(tmp_path / "staging")
        os.makedirs(staging, exist_ok=True)
        dst = f"{staging}/{name}.parquet"
        os.rename(f"{tmp}/{part}", dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    mk([(i, base + i * hour, "view", 1.0) for i in range(6)], "batch1", now - 60)
    mk([(101, base + 12 * hour, "view", 1.0)], "batch2", now - 30)  # advances watermark, evicts hours 0-5
    mk(
        [(100, base, "view", 1.0),                 # LATE: hour-0 window evicted
         (102, base + 13 * hour, "view", 1.0)],    # keeps the stream moving
        "batch3", now,
    )
    stream = (
        spark.readStream.schema("event_id long, ts_us long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "staging"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = windowed_event_counts(stream, window_duration="1 hour", watermark="1 hour")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, dropped
    got = {
        r["window_start"].timestamp(): r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    hour0 = (base // hour) * hour / 1_000_000  # window starts floor to the hour
    # the late redelivery did NOT land in the evicted hour-0 window
    assert got[hour0] == 1, got
    # batch-1 windows all flushed once the watermark passed them
    assert all(got[hour0 + 3600 * i] == 1 for i in range(6)), got


def test_stream_scd2_incremental_and_replay(spark, tmp_path):
    """stream_scd2_ingest: (a) incremental merge across micro-batches with
    interleaved (out-of-order between batches) timestamps equals the
    one-shot batch SCD2; (b) a FULL replay (fresh checkpoint, same
    staging — every file redelivered) leaves the history unchanged,
    because the merge is state-based; (c) only affected buckets are
    rewritten (the untouched key's partition files keep their mtime)."""
    import os

    from mrf_etl_spark.io.writers import scd2_history
    from mrf_etl_spark.streaming import stream_scd2_ingest

    rows = [
        # key 1: versions land in DIFFERENT half-files out of order
        (1, 300, 1, 30.0), (1, 100, 2, 10.0), (1, 200, 3, 20.0),
        # key 2: single version, first half only
        (2, 150, 4, 15.0),
        # key 7: chosen to land in a different hash bucket than 1/2
        (7, 500, 5, 50.0), (7, 600, 6, 60.0),
    ]
    upd = spark.createDataFrame(rows, "key long, ts long, uid long, v double")
    staging = str(tmp_path / "staging")
    upd.filter("uid % 2 = 0").write.parquet(f"{staging}/half=a")
    upd.filter("uid % 2 = 1").write.parquet(f"{staging}/half=b")
    schema = upd.schema
    hist = str(tmp_path / "hist")

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{staging}/half=*")
        )
        q = stream_scd2_ingest(
            stream, hist, str(tmp_path / ckpt),
            keys=["key"], order_col="ts", tiebreak=["uid"], attrs=["v"],
            n_buckets=4,
        )
        assert q.awaitTermination(300)

    def snap():
        return sorted(
            map(tuple, spark.read.parquet(hist)
                .select("key", "version", "valid_from", "valid_to", "is_current", "v")
                .collect())
        )

    drain("ckpt1")
    expected = sorted(
        map(tuple, scd2_history(upd, ["key"], "ts", ["uid"], ["v"])
            .select("key", "version", "valid_from", "valid_to", "is_current", "v")
            .collect())
    )
    assert snap() == expected

    # (c) bucket pruning: replay only the file containing key 7's updates
    # and check the OTHER keys' bucket partitions are not rewritten
    def bucket_dirs():
        return {
            d: max(
                os.path.getmtime(os.path.join(hist, d, f))
                for f in os.listdir(os.path.join(hist, d))
                if f.endswith(".parquet")
            )
            for d in os.listdir(hist)
            if d.startswith("_bucket=")
        }

    before = bucket_dirs()
    only7 = spark.createDataFrame([(7, 700, 8, 70.0)], schema)
    staging2 = str(tmp_path / "staging2")
    only7.write.parquet(f"{staging2}/half=a")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{staging2}/half=*")
    )
    q2 = stream_scd2_ingest(
        stream2, hist, str(tmp_path / "ckpt2"),
        keys=["key"], order_col="ts", tiebreak=["uid"], attrs=["v"], n_buckets=4,
    )
    assert q2.awaitTermination(300)
    after = bucket_dirs()
    k7_bucket = spark.sql(
        "SELECT concat('_bucket=', pmod(xxhash64(7L), 4)) AS b"
    ).collect()[0]["b"]
    assert after[k7_bucket] > before[k7_bucket]  # affected bucket rebuilt
    for b, mt in before.items():
        if b != k7_bucket:
            assert after[b] == mt, f"untouched bucket {b} was rewritten"
    # key 7 now has 3 versions; others unchanged
    got = {(r[0], r[1]): r for r in snap()}
    assert (7, 3) in got and got[(7, 3)][4] is True

    # (b) full replay of the ORIGINAL staging with a fresh checkpoint:
    # every original file redelivered; history must not change
    final_before = snap()
    drain("ckpt3")
    assert snap() == final_before


def test_incremental_mv_fresh_checkpoint_is_not_mistaken_for_replay(spark, tmp_path):
    """batch_id is only monotone within ONE checkpoint lineage: a fresh
    checkpoint restarts numbering at 0. The sidecar records the stream_id
    (checkpoint dir) next to the batch id, so batch 0 of a NEW lineage is
    applied (visible double-count — the honest failure mode), not
    silently skipped as a 'replay' (ADVICE r6)."""
    from mrf_etl_spark.streaming.ingest import incremental_rollup_batch_writer

    mv = str(tmp_path / "mv_lineage")
    b0 = spark.createDataFrame([("view", 1)], "event_type string, value long")

    def snap():
        return {
            r["event_type"]: (r["n"], r["v"])
            for r in spark.read.parquet(mv).collect()
        }

    w_ckpt_a = incremental_rollup_batch_writer(
        mv, keys=["event_type"],
        agg_exprs={"n": "count(*)", "v": "sum(cast(value as bigint))"},
        stream_id="ckpt-A",
    )
    w_ckpt_a(b0, 0)
    assert snap() == {"view": (1, 1)}
    w_ckpt_a(b0, 0)  # same lineage, same id: true replay — skipped
    assert snap() == {"view": (1, 1)}

    w_ckpt_b = incremental_rollup_batch_writer(
        mv, keys=["event_type"],
        agg_exprs={"n": "count(*)", "v": "sum(cast(value as bigint))"},
        stream_id="ckpt-B",
    )
    w_ckpt_b(b0, 0)  # NEW lineage, batch 0: must apply, not skip
    assert snap() == {"view": (2, 2)}
    w_ckpt_b(b0, 0)  # and replay within the new lineage is again a no-op
    assert snap() == {"view": (2, 2)}


def test_scd2_stream_does_not_mutate_session_overwrite_mode(spark, tmp_path):
    """stream_scd2_ingest's dynamic partition overwrite is writer-scoped:
    the shared session's partitionOverwriteMode must be untouched after a
    drain, so later partitioned overwrites keep full-replace semantics
    (ADVICE r6)."""
    from mrf_etl_spark.streaming.ingest import stream_scd2_ingest

    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    src = str(tmp_path / "scd2_src")
    spark.createDataFrame(
        [(1, 100, 1, "a")], "user_id long, ts long, uid long, val string"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts long, uid long, val string"
    ).parquet(src)
    q = stream_scd2_ingest(
        stream,
        history_path=str(tmp_path / "scd2_hist"),
        checkpoint_dir=str(tmp_path / "scd2_ckpt"),
        keys=["user_id"], order_col="ts", tiebreak=["uid"], attrs=["val"],
    )
    q.awaitTermination()
    assert spark.conf.get(key) == before


def test_incremental_mv_sidless_writer_over_stamped_mv_still_guards(spark, tmp_path):
    """The symmetric direction of the legacy-sidecar fix: a writer built
    WITHOUT stream_id replaying a batch over a lineage-STAMPED MV (mixed
    call sites, or a rollback to pre-lineage code) must still skip the
    replay — and its own write must preserve the existing lineage stamp
    rather than downgrading the sidecar to the one-line legacy form."""
    import os

    from mrf_etl_spark.streaming.ingest import (
        _BATCH_ID_SIDECAR,
        incremental_rollup_batch_writer,
    )

    mv = str(tmp_path / "mv_sidless")
    b0 = spark.createDataFrame(
        [("view", 1), ("click", 5)], "event_type string, value long"
    )
    stamped = incremental_rollup_batch_writer(
        mv, keys=["event_type"], agg_exprs={"n": "count(*)"}, stream_id="ckpt-B"
    )
    stamped(b0, 3)

    def snap():
        return {r["event_type"]: r["n"] for r in spark.read.parquet(mv).collect()}

    after = snap()
    sidless = incremental_rollup_batch_writer(
        mv, keys=["event_type"], agg_exprs={"n": "count(*)"}
    )
    sidless(b0, 3)  # replay of an applied batch: must be a no-op
    assert snap() == after
    sidless(b0, 4)  # a NEW batch applies and keeps the lineage stamp
    assert snap() == {k: v * 2 for k, v in after.items()}
    marker = open(os.path.join(mv, _BATCH_ID_SIDECAR)).read().splitlines()
    assert marker == ["ckpt-B", "4"]


def test_st22_stream_fertility_equals_batch_rollup(spark):
    """st22's drained lake must serve exactly the one-shot t24 rollup
    by source — the frozen merge table is a per-word function and doc
    counts are additive, so micro-batch boundaries are invisible."""
    from pyspark.sql import functions as F

    import mrf_etl_spark.plans.parity_streaming  # noqa: F401  (registers st22)
    from mrf_etl_spark.operators.textops import bpe_encode_fertility
    from mrf_etl_spark.plans.parity_llm import T23_MERGES
    from mrf_etl_spark.plans.parity import REGISTRY

    sf = "/root/testdata/sf0.001"
    served = {
        r.source: (r.n_docs, r.n_words, r.n_chars, r.n_tokens)
        for r in REGISTRY["st22_stream_fertility"].spark_fn(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    batch = {
        r.source: (r.n_docs, r.n_words, r.n_chars, r.n_tokens)
        for r in bpe_encode_fertility(docs, "text", "doc_id", T23_MERGES)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    assert served == batch


def test_st23_stream_cluster_map_equals_batch_report(spark):
    """st23's drained lake must serve exactly q10's one-shot report —
    the frozen trained codebook makes per-row assignment a pure
    function, and (cid, label) counts are additive."""
    import mrf_etl_spark.plans.parity_streaming  # noqa: F401
    from mrf_etl_spark.plans.parity import REGISTRY

    sf = "/root/testdata/sf0.001"
    served = sorted(
        map(
            tuple,
            REGISTRY["st23_stream_cluster_map"].spark_fn(spark, sf).collect(),
        )
    )
    batch = sorted(
        map(tuple, REGISTRY["q10_cluster_map"].spark_fn(spark, sf).collect())
    )
    assert served == batch


def test_st19b_serve_equals_ingest_lifecycle_and_n7(spark):
    """st19b (serve-only reads from the resident streamed index) must
    return exactly st19's post-drain query AND n7's one-shot cascade —
    the stream/batch/persisted triple identity. Also pins the memo: a
    second st19b call reuses the resident index (no new drain) and is
    bit-identical."""
    import mrf_etl_spark.plans.parity_streaming  # noqa: F401
    from mrf_etl_spark.plans.parity import REGISTRY

    sf = "/root/testdata/sf0.001"
    serve = sorted(
        map(
            tuple,
            REGISTRY["st19b_stream_index_serve"].spark_fn(spark, sf).collect(),
        )
    )
    again = sorted(
        map(
            tuple,
            REGISTRY["st19b_stream_index_serve"].spark_fn(spark, sf).collect(),
        )
    )
    lifecycle = sorted(
        map(
            tuple,
            REGISTRY["st19_stream_ivfpq_ingest"].spark_fn(spark, sf).collect(),
        )
    )
    batch = sorted(
        map(tuple, REGISTRY["n7_ann_ivf_pq"].spark_fn(spark, sf).collect())
    )
    assert serve == again == lifecycle == batch


def test_st24_streamed_zipf_equals_one_shot(spark):
    """st24's served report must equal the one-shot t26 bit for bit:
    the (domain, word) count lake is additive, so micro-batch
    boundaries are invisible and the merged counts feed the identical
    bit-class regression (same IEEE expression tree over the same
    integer sums)."""
    from pyspark.sql import functions as F  # noqa: F811

    import mrf_etl_spark.plans.parity_fused  # noqa: F401 (registers st24)
    from mrf_etl_spark.operators import textops as tx
    from mrf_etl_spark.plans.parity import REGISTRY, t as _t

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in REGISTRY["st24_stream_zipf_monitor"].spark_fn(spark, sf).collect()
    )
    want = sorted(
        tuple(r) for r in tx.zipf_fit(_t(spark, sf, "documents")).collect()
    )
    assert got == want and len(got) > 0


def test_st25_streamed_excision_equals_one_shot(spark):
    """st25's drained lake must equal the one-shot d21 run row for row:
    the excision is a pure per-document function of (text, frozen eval
    universe), so micro-batch boundaries are invisible."""
    import mrf_etl_spark.plans.parity_fused  # noqa: F401 (registers st25)
    from pyspark.sql import functions as F  # noqa: F811

    from mrf_etl_spark.operators import textops as tx
    from mrf_etl_spark.plans.parity import REGISTRY, t as _t

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in REGISTRY["st25_stream_excision"].spark_fn(spark, sf).collect()
    )
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    want = sorted(
        tuple(r)
        for r in tx.eval_span_excision(
            docs, F.col("doc_id") % 101 == 0, "text", "doc_id", k=3
        ).collect()
    )
    assert got == want and len(got) > 0


def test_staged_halves_memoized(spark):
    """r11 §13 pin: the staged arrival fixture is ingest-time state —
    the second call with the same key must return the SAME directory
    without re-running the staging write (st19's `built` doctrine
    extended to the whole staged family). Different keys still stage
    independently."""
    import mrf_etl_spark.plans.parity_streaming as ps

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    calls = {"n": 0}
    real = ps._stage_halves

    def counting(d, staging, expr):
        calls["n"] += 1
        return real(d, staging, expr)

    orig = ps._stage_halves
    ps._stage_halves = counting
    try:
        key = "test_memo/unit"
        p1 = ps._staged_halves(df, key, F.col("doc_id") % 2 == 0)
        p2 = ps._staged_halves(df, key, F.col("doc_id") % 2 == 0)
        assert p1 == p2
        assert calls["n"] == 1, "second call must not re-stage"
        p3 = ps._staged_halves(df, "test_memo/other", F.col("doc_id") % 2 == 0)
        assert p3 != p1
        assert calls["n"] == 2
    finally:
        ps._stage_halves = orig
        ps._STAGED.pop("test_memo/unit", None)
        ps._STAGED.pop("test_memo/other", None)


def test_staged_halves_rejects_key_reuse_with_new_expr(spark):
    """r12 (ADVICE r11): reusing a staged key with a DIFFERENT split
    expression must raise — the memo would otherwise silently serve the
    first expression's halves to the second caller."""
    import pytest

    import mrf_etl_spark.plans.parity_streaming as ps

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    key = "test_memo_guard/unit"
    try:
        p1 = ps._staged_halves(df, key, F.col("doc_id") % 2 == 0)
        # same expression again: fine, same directory
        assert ps._staged_halves(df, key, F.col("doc_id") % 2 == 0) == p1
        with pytest.raises(ValueError, match="different .*expression"):
            ps._staged_halves(df, key, F.col("doc_id") % 3 == 0)
    finally:
        ps._STAGED.pop(key, None)
