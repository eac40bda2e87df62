"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

from datetime import datetime, timedelta


def test_stateful_sessionize_closes_gapped_sessions(spark, tmp_path):
    from knowledgegraphgenerator_spark.streaming.incremental import (
        stateful_sessionize_stream,
    )

    base = datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # user 1: two sessions separated by a 2h gap
    for m in (0, 5, 10):
        rows.append((eid, base + timedelta(minutes=m), 1)); eid += 1
    for m in (180, 184):
        rows.append((eid, base + timedelta(minutes=m), 1)); eid += 1
    # user 2: one session, still open at end of input (not emitted)
    for m in (0, 20):
        rows.append((eid, base + timedelta(minutes=m), 2)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    src = str(tmp_path / "events")
    df.write.mode("overwrite").parquet(src)

    q = stateful_sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), gap_seconds=1800
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }
    # only user 1's FIRST session closed within the batch (30-min gap
    # exceeded by the 170-min jump); the trailing sessions stay in state
    assert (1, 3) in got
    assert not any(u == 2 for u, _ in got)

    closed = spark.sql(
        "select session_end - session_start as dur from sessions"
    ).collect()
    assert all(r["dur"] == 600 for r in closed)  # 0..10 min session
