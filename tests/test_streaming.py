"""Streaming runtime tests: the streaming windowed aggregations must
equal their batch twins on the same (finite) data, and foreachBatch must
drive an ordinary batch sink."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming import (
    read_events_stream,
    run_foreach_batch_append,
    run_to_memory,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Static events (micro-ts, post-conversion) as a 4-file parquet
    directory — the stream sees 4 micro-batch candidates."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch_twin(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_to_memory(tumbling_counts(stream), "tumbling_mem")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "5 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    assert _rows(spark.table("tumbling_mem")) == _rows(batch)


def test_session_stream_equals_batch_twin(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(session_counts(stream), "session_mem")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    assert _rows(spark.table("session_mem")) == _rows(batch)


@pytest.mark.parametrize(
    "provider",
    [
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    ],
    ids=["hdfs-backed", "rocksdb"],
)
def test_stateful_running_totals_converge_to_batch(spark, events_dir, provider):
    """applyInPandasWithState: state persists across micro-batches, and
    each user's LAST emitted update equals the batch group-by result.
    Parametrized over BOTH state-store providers — CLUSTER_PROFILE
    deploys RocksDB for 100 TB state (heap-free, changelog
    checkpointing), so the stateful operator must behave identically
    under it, not just under the default heap-backed store."""
    from etl_pipeline_orchestration_spark.streaming.stateful import (
        running_user_totals,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, provider)
    try:
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName(f"stateful_mem_{provider.rsplit('.', 1)[-1]}")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.table(
            f"stateful_mem_{provider.rsplit('.', 1)[-1]}"
        ).collect()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    # update mode appends one row per (user, batch-with-activity); the
    # final state per user is the row with the max running count
    final = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    assert len(final) == len(batch)
    for r in batch:
        n, t = final[r["user_id"]]
        assert n == r["n"]
        assert abs(t - r["t"]) < 1e-6


def test_foreach_batch_drives_warehouse_sink(spark, events_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    # raw passthrough (no agg) in append mode: every event reaches the sink
    # exactly once across micro-batches
    raw = stream.select("event_id", "ts", "event_type", "value")

    def sink(batch_df, batch_id):
        loader.load(batch_df, "stream_events", if_exists="append")

    run_foreach_batch_append(
        raw, sink, str(tmp_path / "ckpt"), output_mode="append"
    )
    n_src = spark.read.parquet(events_dir).count()
    assert loader.table_count("stream_events") == n_src


def test_streaming_dedup_within_watermark(spark, events_dir):
    """Duplicate the input files → the deduped stream must equal the
    distinct batch twin (every event appears exactly twice across the
    directory, so state-based dedup has real work to do)."""
    import tempfile

    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        dedup_within_watermark,
    )

    with tempfile.TemporaryDirectory() as dup_dir:
        ev = spark.read.parquet(events_dir)
        ev.write.mode("overwrite").parquet(dup_dir)
        ev.write.mode("append").parquet(dup_dir)

        stream = read_events_stream(spark, dup_dir)
        deduped = dedup_within_watermark(stream)
        run_to_memory(
            deduped.select("event_id", "user_id", "value"),
            "dedup_mem",
            output_mode="append",
        )
        got = _rows(spark.table("dedup_mem"))
        want = _rows(
            spark.read.parquet(dup_dir)
            .select("event_id", "user_id", "value")
            .distinct()
        )
        assert got == want


def test_stream_static_join_equals_batch(spark, events_dir):
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        enrich_stream_static,
    )

    dim = spark.createDataFrame(
        [(i, f"tier_{i % 3}") for i in range(200)], ["user_id", "tier"]
    )
    stream = read_events_stream(spark, events_dir)
    run_to_memory(
        enrich_stream_static(stream, dim, "user_id").select(
            "event_id", "user_id", "tier"
        ),
        "enrich_mem",
        output_mode="append",
    )
    want = _rows(
        spark.read.parquet(events_dir)
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "tier")
    )
    assert _rows(spark.table("enrich_mem")) == want


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Attribution join (clicks x purchases within 5 min, same user):
    the streaming result over the file backlog must equal the same
    join on the static frames — interval-bounded state eviction must
    not drop any pair that the batch semantics include."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        stream_stream_interval_join,
    )

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purch = split(read_events_stream(spark, events_dir))
    joined = stream_stream_interval_join(s_clicks, s_purch)
    run_to_memory(joined, "ssj_mem", output_mode="append")
    got = _rows(spark.table("ssj_mem"))

    b_clicks, b_purch = split(spark.read.parquet(events_dir))
    want = _rows(stream_stream_interval_join(b_clicks, b_purch))
    assert len(want) > 0, "vacuous: no click->purchase pairs in fixture"
    assert got == want


def test_checkpoint_recovery_no_duplicates(spark, events_dir, tmp_path):
    """Restartability: run the checkpointed foreachBatch sink over a
    backlog, then ADD files and run again with the SAME checkpoint —
    the second run must process only the new files (offsets persisted),
    so the sink sees each source row exactly once across restarts."""
    import tempfile

    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    with tempfile.TemporaryDirectory() as src:
        ev = spark.read.parquet(events_dir)
        first = ev.limit(300)
        first.write.mode("overwrite").parquet(src)

        ckpt = str(tmp_path / "ckpt")
        seen: list[int] = []

        def sink(batch_df, batch_id):
            seen.append(batch_df.count())

        def run():
            run_foreach_batch_append(
                read_events_stream(spark, src).select("event_id"),
                sink,
                ckpt,
                output_mode="append",
            )

        run()
        n_first = sum(seen)
        assert n_first == 300

        ev.write.mode("append").parquet(src)  # full set lands on top
        run()
        total_rows = spark.read.parquet(src).count()
        # second run processed exactly the delta, not the old files again
        assert sum(seen) == total_rows


def test_watermark_drops_late_rows(spark, tmp_path):
    """Real late-data semantics: with maxFilesPerTrigger=1 the first
    file advances the watermark far ahead; the second file's rows are
    older than (max event time - delay) and must be DROPPED from the
    aggregate — the state-eviction behavior that bounds memory on an
    unbounded stream. (The batch twin would count them; streaming
    correctly does not.)"""
    from datetime import datetime

    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        EVENTS_STREAM_SCHEMA,
        tumbling_counts,
    )

    src = str(tmp_path / "late_src")

    def write_file(rows, mode):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            mode
        ).parquet(src)

    def ev(i, ts, typ="click"):
        return (i, ts, 1, typ, 1.0, "{}")

    # file 1: one early row + one far-future row (advances watermark)
    write_file(
        [ev(1, datetime(2026, 1, 1, 0, 0)), ev(2, datetime(2026, 1, 1, 12, 0))],
        "overwrite",
    )
    # file 2: a row 12h older than max event time, beyond the 10-min delay
    write_file([ev(3, datetime(2026, 1, 1, 0, 1))], "append")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = sum(r["n_events"] for r in spark.table("late_mem").collect())
    batch_total = spark.read.parquet(src).count()
    assert batch_total == 3
    assert total == 2, f"late row should be dropped, counted {total}"


def test_rate_source_smoke(spark):
    """The built-in rate source (self-generating benchmark stream):
    rows carry monotone (timestamp, value) — the standard way to
    load-test a streaming topology with zero external dependencies."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_mem")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_mem").count() >= 10:
                break
            time.sleep(0.5)
        rows = spark.table("rate_mem").collect()
        assert len(rows) >= 10
        vals = sorted(r["value"] for r in rows)
        assert vals == list(range(vals[0], vals[0] + len(vals)))
    finally:
        q.stop()


def test_transform_with_state_converges_to_batch(spark, events_dir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor): running
    totals under the new typed-state API must converge to the batch
    group-by, same contract as the applyInPandasWithState twin. Runs
    against the real protobuf when installed, else the vendored mini
    runtime (ensure_protobuf_runtime) — no longer skips."""
    from etl_pipeline_orchestration_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_mem")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = spark.table("tws_mem").collect()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)

    final = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    assert len(final) == len(batch)
    for r in batch:
        n, t = final[r["user_id"]]
        assert n == r["n"]
        assert abs(t - r["t"]) < 1e-6


def test_streaming_quality_funnel_equals_batch(spark, tmp_path):
    """The curation funnel over a document stream must equal the batch
    funnel on the same finite corpus — same flags, same counters, fed
    through micro-batches (2 files per trigger forces the complete-mode
    aggregate to merge state across batches, not see one batch)."""
    from etl_pipeline_orchestration_spark.plans.corpus_ops import (
        funnel_counters,
        funnel_report,
        gate_flags,
    )
    from etl_pipeline_orchestration_spark.streaming.curation import (
        read_documents_stream,
        run_funnel_to_memory,
        streaming_quality_funnel,
    )

    docs_dir = str(tmp_path / "docs_stream")
    batch_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch_docs.repartition(6).write.parquet(docs_dir)  # several input files

    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=2)
    run_funnel_to_memory(streaming_quality_funnel(stream), "funnel_mem")

    expected = _rows(funnel_report(funnel_counters(gate_flags(
        spark.read.parquet(docs_dir)))))
    got = _rows(spark.table("funnel_mem"))
    assert got == expected
    assert len(got) == 4 and got[0][2] == 500  # stage 1 saw every doc


def _ordered_attribution_dir(spark, events_dir, tmp_path, name):
    """Source directory for the outer-join twins: four ts-ordered
    chunks with ascending mtimes, then sentinel files.

    Event-time-ordered arrival (the semdedup-fixture discipline): a
    random split would make whole batches "late" behind the first
    batch's watermark and the join would legitimately drop them; real
    deployments tail a time-ordered log.

    TWO sentinel batches: a batch's watermark only takes effect in the
    NEXT batch's state cleanup, and availableNow runs no no-data batch
    at the end — sentinel #1 advances the watermark past every real
    row's no-match horizon, sentinel #2's batch performs the eviction
    that emits the last NULL rows (single-file triggers keep them in
    separate batches; without #2, the globally-latest unmatched
    purchase stays pending forever — observed). Each sentinel file
    carries BOTH event types: the global watermark is the MIN over the
    two legs' watermark operators, so a click-only sentinel would
    leave the purchases leg pinned at its own max event (observed).

    Returns (src_dir, real_events_df)."""
    import datetime
    import os
    import shutil

    from pyspark.sql import Window as W

    src = str(tmp_path / name)
    os.makedirs(src)
    real = spark.read.parquet(events_dir)
    n = real.count()
    ranked = real.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    base = 1_600_000_000
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        cdir = str(tmp_path / f"{name}_chunk{i}")
        ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop(
            "rn"
        ).coalesce(1).write.mode("overwrite").parquet(cdir)
        cfile = [f for f in os.listdir(cdir) if f.endswith(".parquet")][0]
        dst_i = os.path.join(src, f"chunk{i}.parquet")
        shutil.copyfile(os.path.join(cdir, cfile), dst_i)
        os.utime(dst_i, (base + i, base + i))
    max_ts = real.agg(F.max("ts")).collect()[0][0]
    for s_i in (1, 2):
        sentinel_ts = max_ts + datetime.timedelta(hours=2 * s_i)
        sent_dir = str(tmp_path / f"{name}_sentinel{s_i}")
        spark.createDataFrame(
            [
                (-s_i, sentinel_ts, -1, "click", 0.0, "{}"),
                (-s_i - 10, sentinel_ts, -1, "purchase", 0.0, "{}"),
            ],
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(sent_dir)
        sfile = [f for f in os.listdir(sent_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"zz_sentinel{s_i}.parquet")
        shutil.copyfile(os.path.join(sent_dir, sfile), dst)
        os.utime(dst, (base + 1000 + s_i, base + 1000 + s_i))
    return src, real


def _split_click_purchase(df):
    return (
        df.filter(F.col("event_type") == "click"),
        df.filter(F.col("event_type") == "purchase"),
    )


def _rows_nullsafe(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_stream_stream_left_outer_join_equals_batch(spark, events_dir, tmp_path):
    """LEFT OUTER attribution join twin: every purchase emits exactly
    once — matched, or with NULL click columns once the watermark
    proves no qualifying click can arrive. Streamed rows (sentinels
    excluded) must equal the batch left-outer join over the real
    events. Output columns: (user_id, click_id, click_ts, purchase_id,
    purchase_ts, purchase_value)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        stream_stream_interval_join_left_outer,
    )

    src, real = _ordered_attribution_dir(spark, events_dir, tmp_path, "ev_outer")
    s_clicks, s_purch = _split_click_purchase(
        read_events_stream(spark, src, max_files_per_trigger=1)
    )
    joined = stream_stream_interval_join_left_outer(s_clicks, s_purch)
    run_to_memory(joined, "ssj_outer_mem", output_mode="append")
    got = _rows_nullsafe(spark.table("ssj_outer_mem").filter(F.col("user_id") != -1))

    b_clicks, b_purch = _split_click_purchase(real.filter(F.col("user_id") != -1))
    want = _rows_nullsafe(stream_stream_interval_join_left_outer(b_clicks, b_purch))
    assert any(r[1] is None for r in want), "vacuous: every purchase matched"
    assert any(r[1] is not None for r in want), "vacuous: no matched pairs"
    assert got == want


def test_stream_stream_full_outer_join_equals_batch(spark, events_dir, tmp_path):
    """FULL OUTER twin: unmatched purchases AND dead-end clicks both
    finalize to NULL-padded rows; streamed result equals the batch full
    outer join (same ts-ordered arrival + dual two-batch sentinel
    discipline)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        stream_stream_interval_join_full_outer,
    )

    src, real = _ordered_attribution_dir(spark, events_dir, tmp_path, "ev_fouter")
    s_clicks, s_purch = _split_click_purchase(
        read_events_stream(spark, src, max_files_per_trigger=1)
    )
    joined = stream_stream_interval_join_full_outer(s_clicks, s_purch)
    run_to_memory(joined, "ssj_fouter_mem", output_mode="append")
    got = _rows_nullsafe(spark.table("ssj_fouter_mem").filter(F.col("user_id") != -1))

    b_clicks, b_purch = _split_click_purchase(real.filter(F.col("user_id") != -1))
    want = _rows_nullsafe(stream_stream_interval_join_full_outer(b_clicks, b_purch))
    n_null_click = sum(1 for r in want if r[1] is None)
    n_null_purch = sum(1 for r in want if r[3] is None)
    assert n_null_click > 0 and n_null_purch > 0, (n_null_click, n_null_purch)
    assert got == want


def test_stream_stream_right_outer_join_equals_batch(spark, events_dir, tmp_path):
    """RIGHT OUTER twin (click side preserved): every click emits
    exactly once per qualifying purchase or with NULL purchase columns
    on watermark passage; streamed rows (sentinels excluded) must equal
    the batch right-outer join. Same ts-ordered arrival + dual
    two-batch sentinel discipline as the left-outer twin."""
    import datetime
    import os
    import shutil

    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        stream_stream_interval_join_right_outer,
    )

    src = str(tmp_path / "ev_router")
    os.makedirs(src)
    real = spark.read.parquet(events_dir)
    n = real.count()
    from pyspark.sql import Window as W

    ranked = real.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    base = 1_600_000_000
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        cdir = str(tmp_path / f"chunk{i}")
        ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop(
            "rn"
        ).coalesce(1).write.mode("overwrite").parquet(cdir)
        cfile = [f for f in os.listdir(cdir) if f.endswith(".parquet")][0]
        dst_i = os.path.join(src, f"chunk{i}.parquet")
        shutil.copyfile(os.path.join(cdir, cfile), dst_i)
        os.utime(dst_i, (base + i, base + i))
    max_ts = real.agg(F.max("ts")).collect()[0][0]
    for s in (1, 2):
        sentinel_ts = max_ts + datetime.timedelta(hours=2 * s)
        sent_dir = str(tmp_path / f"sentinel{s}")
        spark.createDataFrame(
            [
                (-s, sentinel_ts, -1, "click", 0.0, "{}"),
                (-s - 10, sentinel_ts, -1, "purchase", 0.0, "{}"),
            ],
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(sent_dir)
        sfile = [f for f in os.listdir(sent_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"zz_sentinel{s}.parquet")
        shutil.copyfile(os.path.join(sent_dir, sfile), dst)
        os.utime(dst, (base + 1000 + s, base + 1000 + s))

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    def _rows_nullsafe(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    s_clicks, s_purch = split(read_events_stream(spark, src, max_files_per_trigger=1))
    joined = stream_stream_interval_join_right_outer(s_clicks, s_purch)
    run_to_memory(joined, "ssj_router_mem", output_mode="append")
    got = _rows_nullsafe(spark.table("ssj_router_mem").filter(F.col("user_id") != -1))

    b_clicks, b_purch = split(real.filter(F.col("user_id") != -1))
    want = _rows_nullsafe(stream_stream_interval_join_right_outer(b_clicks, b_purch))
    n_null = sum(1 for r in want if r[3] is None)
    assert n_null > 0, "vacuous: every click found a purchase"
    assert any(r[3] is not None for r in want), "vacuous: no matched pairs"
    assert got == want
