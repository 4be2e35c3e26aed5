"""Time-series gap-fill semantics (events_gapfill contract query)."""

import datetime

from pyspark.sql import functions as F  # noqa: F401


def test_gapfill_grid_zero_and_forward_fill(spark, tmp_path):
    import __spark_entry__ as E

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 10), 1, "click", 2.5, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 40), 1, "click", 1.5, "{}"),
        # 01:00 hour has NO click events (gap)
        (3, datetime.datetime(2024, 1, 1, 2, 5), 2, "click", 4.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 2, 30), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        (r["event_type"], r["bucket_ts"].hour): r
        for r in E.queries()["events_gapfill"](spark, sf).collect()
    }
    # complete 3-hour grid for BOTH types (global bounds)
    assert len(out) == 6
    c0, c1, c2 = (out[("click", h)] for h in (0, 1, 2))
    assert c0["n_events"] == 2 and c0["filled_value"] == 4.0
    # the gap hour: zero count, value forward-filled from hour 0
    assert c1["n_events"] == 0 and c1["filled_value"] == 4.0
    assert c2["n_events"] == 1 and c2["filled_value"] == 4.0
    # view has no events before hour 2: leading nulls stay null
    v0, v2 = out[("view", 0)], out[("view", 2)]
    assert v0["n_events"] == 0 and v0["filled_value"] is None
    assert v2["n_events"] == 1 and v2["filled_value"] == 1.0


def test_anomaly_flags_spike(spark, tmp_path):
    import datetime

    import __spark_entry__ as E

    rows = []
    eid = 0
    # steady 2-3 events/hour for 30 hours (NOT constant: a zero-variance
    # window yields std=0 and a null z by design), then a 40-event spike
    for h in range(30):
        for j in range(2 + h % 2):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, 0, 5 * j + 1)
                 + datetime.timedelta(hours=h),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    for j in range(40):
        rows.append(
            (eid, datetime.datetime(2024, 1, 2, 6, j % 60),
             2, "click", 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = E.queries()["events_anomaly"](spark, sf).collect()
    spike = [r for r in out if r["n_events"] >= 40]
    assert spike and all(r["is_anomaly"] for r in spike)
    steady = [r for r in out if r["n_events"] == 2 and r["z_score"] is not None]
    assert steady and not any(r["is_anomaly"] for r in steady)
