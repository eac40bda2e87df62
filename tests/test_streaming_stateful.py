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


def _protobuf_available() -> bool:
    # transformWithStateInPandas speaks protobuf to the JVM
    # (pyspark/sql/streaming/proto/StateMessage_pb2); without the python
    # protobuf package the TWS driver worker crashes on import.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs the python protobuf package "
    "(absent in this sandbox; no pip install allowed)",
)
def test_transform_with_state_twin_matches(spark, tmp_path):
    """Spark-4 successor API (transformWithStateInPandas + ValueState +
    RocksDB store) produces the same closed sessions as the
    applyInPandasWithState formulation on the same input."""
    from knowledgegraphgenerator_spark.streaming.incremental import (
        stateful_sessionize_stream,
        stateful_sessionize_tws,
    )

    base = datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for m in (0, 5, 10, 180, 184, 400):   # user 1: three sessions
        rows.append((eid, base + timedelta(minutes=m), 1)); eid += 1
    for m in (0, 20, 300):                # user 2: two sessions
        rows.append((eid, base + timedelta(minutes=m), 2)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    src = str(tmp_path / "events")
    df.write.mode("overwrite").parquet(src)

    q1 = stateful_sessionize_stream(
        spark, src, str(tmp_path / "ckpt_apis"), gap_seconds=1800
    )
    q1.awaitTermination()
    legacy = {
        tuple(r) for r in spark.sql("select * from sessions").collect()
    }

    q2 = stateful_sessionize_tws(
        spark, src, str(tmp_path / "ckpt_tws"), gap_seconds=1800
    )
    q2.awaitTermination()
    tws = {
        tuple(r) for r in spark.sql("select * from sessions_tws").collect()
    }
    assert tws == legacy and len(tws) >= 3
