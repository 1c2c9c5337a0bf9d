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


def test_sessionize_matches_python_reference(spark):
    """Randomized cross-check: session stats vs a pure-Python
    gaps-and-islands reference over 60 users x random event times."""
    import random

    rng = random.Random(42)
    rows = []
    for u in range(60):
        t = rng.randrange(0, 3600)
        for _ in range(rng.randrange(1, 12)):
            t += rng.randrange(0, 5400)      # gaps 0..90 min
            rows.append((u, t))
    df = (spark.createDataFrame(rows, "user_id long, epoch long")
          .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch"))

    # python reference
    expected = {}
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        idx, prev = 0, None
        for t in ts:
            if prev is not None and t - prev > 1800:
                idx += 1
            key = (u, idx)
            s = expected.setdefault(key, [t, t, 0])
            s[0] = min(s[0], t)
            s[1] = max(s[1], t)
            s[2] += 1
            prev = t

    from python_hll_spark.operators.sessions import session_stats
    got = {(r["user_id"], r["session_idx"]):
           (int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()), r["n_events"])
           for r in session_stats(df, gap_minutes=30).collect()}
    assert got == {k: tuple(v) for k, v in expected.items()}
