"""Property tests for the hypertable-style time-series operators
(gap-fill/LOCF/interpolate, time-weighted average, counter rate, OHLC
downsample) — complement the differential oracle harness."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries


def test_gapfill_locf_grid_is_dense(spark, sf_dir):
    out = timeseries.hourly_gapfill_locf(spark, sf_dir)
    gaps = (
        out.withColumn(
            "prev",
            F.lag("bucket").over(Window.partitionBy("user_id").orderBy("bucket")),
        )
        .filter(F.col("prev").isNotNull())
        .filter(
            (F.unix_timestamp("bucket") - F.unix_timestamp("prev")) != 3600
        )
        .count()
    )
    assert gaps == 0


def test_interpolate_endpoints_and_grid(spark, sf_dir):
    out = timeseries.hourly_gapfill_interpolate(spark, sf_dir).collect()
    # dense grid per user
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        ts = [r["bucket"] for r in rows]
        assert ts == sorted(ts)
        for a, b in zip(ts, ts[1:]):
            assert (b - a).total_seconds() == 3600
    # interpolated values stay inside the per-user observed range
    ev = load_table(spark, sf_dir, "events")
    rng = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in out:
        lo, hi = rng[r["user_id"]]
        assert lo - 0.01 <= r["value_interp"] <= hi + 0.01


def test_time_weighted_avg_bounds(spark, sf_dir):
    out = timeseries.time_weighted_avg(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    stats = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert {r["user_id"] for r in out} == set(stats)
    for r in out:
        s = stats[r["user_id"]]
        assert r["n_segments"] == s["n"] - 1
        if r["twa_value"] is not None:
            assert s["lo"] - 0.01 <= r["twa_value"] <= s["hi"] + 0.01
            assert r["span_hours"] > 0


def test_counter_rate_accounting(spark, sf_dir):
    out = timeseries.counter_rate(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in out:
        assert r["n_samples"] == counts[r["user_id"]]
        # first sample has no delta; every other is a delta or a reset
        assert 0 <= r["n_resets"] <= r["n_samples"] - 1
        assert r["total_increase"] >= 0.0


def test_ohlc_invariants(spark, sf_dir):
    out = timeseries.hourly_ohlc(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out) == n_total
    for r in out:
        assert r["low"] <= r["high"]
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        if r["n_events"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_hourly_ewma_matches_bruteforce(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    out = {
        (r["event_type"], r["hour"]): (r["n"], r["ewma"])
        for r in timeseries.hourly_event_ewma(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    import datetime

    by_type = {}
    for r in cells:
        by_type.setdefault(r["event_type"], {})[r["hour"]] = r["n"]
    expect = {}
    for et, series in by_type.items():
        for hour, n in series.items():
            num = den = 0
            for i, w in enumerate(timeseries._EWMA_W):
                src = hour - datetime.timedelta(hours=i)
                if src in series:
                    num += series[src] * w
                    den += w
            import math

            expect[(et, hour)] = (n, math.floor(num / den * 10_000 + 0.5) / 10_000.0)
    assert out == expect


def test_monthly_spine_is_gapfree_and_conserves_orders(spark, sf_dir):
    """Spine covers every month from min to max with no gaps; per-month
    counts sum to the table total."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from pyspark.sql import functions as F

    out = timeseries.monthly_order_spine(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in out) == orders.count()
    months = [r["month"] for r in out]
    assert months == sorted(months)
    for a, b in zip(months, months[1:]):
        assert (b.year - a.year) * 12 + (b.month - a.month) == 1
        assert b.day == 1


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    """Per-day peak equals a literal per-second recount of overlapping
    sessions (inclusive ends, 30-min gap sessions, floor-to-second)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from collections import defaultdict

    out = {r["day"]: r for r in timeseries.daily_peak_concurrency(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    gap = timeseries._CONC_GAP_MIN * 60
    sessions = []  # (floored_start, floored_end); assignment on RAW ts
    for u, rows in by_user.items():
        rows.sort()
        cur = [rows[0][0], rows[0][0]]
        for ts, _ in rows[1:]:
            if (ts - cur[1]).total_seconds() < gap:
                cur[1] = ts
            else:
                sessions.append((cur[0].replace(microsecond=0), cur[1].replace(microsecond=0)))
                cur = [ts, ts]
        sessions.append((cur[0].replace(microsecond=0), cur[1].replace(microsecond=0)))
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    deltas = defaultdict(lambda: defaultdict(int))
    for s, e in sessions:
        ss, es = int((s - epoch).total_seconds()), int((e - epoch).total_seconds())
        for di in range(ss // 86400, es // 86400 + 1):
            d0 = di * 86400
            deltas[di][max(ss, d0) - d0] += 1
            deltas[di][min(es, d0 + 86399) - d0 + 1] -= 1
    for di, cells in deltas.items():
        run, best, best_sec = 0, -1, None
        for sec in sorted(cells):
            run += cells[sec]
            if run > best:
                best, best_sec = run, sec
        day = (epoch + dt.timedelta(days=di)).date()
        assert out[day]["peak_concurrent"] == best
        assert out[day]["at_second"] == best_sec
    assert set(out) == {(epoch + dt.timedelta(days=di)).date() for di in deltas}


def test_growth_accounting_identities(spark, sf_dir):
    """active = new + retained + resurrected each week; churn reconciles
    with the previous week's actives; totals match a brute recount."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from collections import defaultdict
    import datetime as dt

    out = timeseries.weekly_growth_accounting(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    epoch = dt.date(1970, 1, 1)
    weeks = defaultdict(set)
    for r in ev:
        w = (r["ts"].date() - epoch).days // 7
        weeks[w].add(r["user_id"])
    first = {}
    for w in sorted(weeks):
        for u in weeks[w]:
            first.setdefault(u, w)
    by_week = {(epoch + dt.timedelta(days=w * 7)): w for w in weeks}
    assert {r["week_start"] for r in out} == set(by_week)
    for r in out:
        w = by_week[r["week_start"]]
        act, prev = weeks[w], weeks.get(w - 1, set())
        assert r["n_active"] == len(act)
        assert r["n_new"] == sum(1 for u in act if first[u] == w)
        assert r["n_retained"] == len(act & prev)
        assert r["n_resurrected"] == r["n_active"] - r["n_new"] - r["n_retained"]
        assert r["n_churned"] == len(prev - act)
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


def test_cohort_ltv_reconciles_with_retention_and_totals(spark, sf_dir):
    """LTV triangle joins 1:1 onto the retention triangle's cells; total
    revenue across the triangle equals the events table's exact cents
    total; cumulative column is a running sum of the weekly column."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    import math

    ltv = timeseries.cohort_ltv(spark, sf_dir).collect()
    ret = {(r["cohort_week"], r["week_n"]) for r in timeseries.cohort_retention(spark, sf_dir).collect()}
    assert {(r["cohort_week"], r["week_n"]) for r in ltv} == ret
    ev = load_table(spark, sf_dir, "events").select("value").collect()
    total = sum(int(math.floor(r["value"] * 100.0 + 0.5)) for r in ev) / 100.0
    assert abs(sum(r["revenue"] for r in ltv) - total) < 1e-6 * abs(total)
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in sorted(ltv, key=lambda r: (r["cohort_week"], r["week_n"])):
        by_cohort[r["cohort_week"]].append(r)
    for rows in by_cohort.values():
        run = 0.0
        for r in rows:
            run += r["revenue"]
            assert abs(r["cum_revenue"] - run) < 1e-6


def test_gini_and_stickiness_invariants(spark, sf_dir):
    """Gini matches a literal sorted recount; stickiness = avg_dau/mau and
    both are bounded."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency, timeseries
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    counts = Counter(r["user_id"] for r in ev)
    xs = sorted(counts.values())
    n = len(xs)
    rank_weighted = sum((i + 1) * x for i, x in enumerate(xs))
    expect = 2.0 * rank_weighted / (n * sum(xs)) - (n + 1) / n
    r = frequency.user_activity_gini(spark, sf_dir).collect()[0]
    assert r["n_users"] == n and r["total_events"] == sum(xs)
    assert abs(r["gini"] - expect) < 1.01e-6
    assert 0.0 <= r["gini"] < 1.0

    months = defaultdict(lambda: (set(), defaultdict(set)))
    for row in ev:
        d = row["ts"].date()
        m = d.replace(day=1)
        months[m][0].add(row["user_id"])
        months[m][1][d].add(row["user_id"])
    out = {r["month"]: r for r in timeseries.monthly_stickiness(spark, sf_dir).collect()}
    assert set(out) == set(months)
    for m, (users, by_day) in months.items():
        r = out[m]
        assert r["mau"] == len(users)
        assert r["n_days"] == len(by_day)
        sum_dau = sum(len(u) for u in by_day.values())
        assert abs(r["avg_dau"] - sum_dau / len(by_day)) < 1.01e-4
        assert abs(r["stickiness"] - sum_dau / (len(by_day) * len(users))) < 1.01e-4
        assert 0.0 < r["stickiness"] <= 1.0
