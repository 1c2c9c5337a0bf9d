"""Event sessionization: batch gaps-and-islands + streaming session_window."""

from pyspark.sql import functions as F


def _events(spark):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),   # same session (10 min gap)
        (1, "2024-01-01 11:30:00"),   # > 30 min -> new session
        (2, "2024-01-01 09:00:00"),
        (2, "2024-01-01 09:00:00"),   # tie: same session either order
        (2, "2024-01-01 09:31:00"),   # 31 min -> new session
        (3, "2024-01-01 23:59:00"),   # singleton
    ]
    return (spark.createDataFrame(rows, "user_id long, ts string")
            .withColumn("ts", F.col("ts").cast("timestamp")))


def test_session_stats_batch(spark):
    from python_hll_spark.operators.sessions import session_stats

    got = {(r["user_id"], r["session_idx"]): r for r in
           session_stats(_events(spark), gap_minutes=30).collect()}
    assert got[(1, 0)]["n_events"] == 2
    assert got[(1, 1)]["n_events"] == 1
    assert str(got[(1, 1)]["session_start"]).startswith("2024-01-01 11:30")
    assert got[(2, 0)]["n_events"] == 2
    assert got[(2, 1)]["n_events"] == 1
    assert got[(3, 0)]["n_events"] == 1
    assert len(got) == 5


def test_sessionize_repartition_invariant(spark):
    """Session assignment is a pure function of (user, ts multiset)."""
    from python_hll_spark.operators.sessions import sessionize

    ev = _events(spark)
    a = sorted(map(tuple, sessionize(ev).collect()))
    b = sorted(map(tuple, sessionize(ev.repartition(7)).collect()))
    assert a == b


def test_session_window_stream(spark, tmp_path):
    from python_hll_spark.operators.sessions import session_window_stream

    ev = _events(spark)
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = session_window_stream(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sess_s")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_s").collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[1]) == [1, 2]
    assert sorted(by_user[2]) == [1, 2]
    assert by_user[3] == [1]
