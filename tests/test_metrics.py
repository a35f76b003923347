"""Edge-case tests for the reference metrics (FIXTURES.md §6 checklist),
run over a reference-shaped fixture written as a parquet sf_dir."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from data_pipeline_for_autonomous_vehicles_spark.operators import metrics

T0 = dt.datetime(2024, 1, 20, 12, 0, 0)


def _ev(event_id, minutes, user_id, event_type, value):
    return Row(
        event_id=event_id,
        ts=T0 + dt.timedelta(minutes=minutes),
        user_id=user_id,
        event_type=event_type,
        value=float(value),
        props="{}",
    )


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    """events fixture with the §6 edge cases:
    - user 1: telemetry span 100 km, 4 interventions → rate 4/km·100
    - user 2: telemetry span 50 km, ZERO interventions → NULL km/interv
    - user 3: interventions but NO telemetry → absent from J1 left side
    - user 4: odometer regress (span clamps to 0 in rate metrics)
    - threshold rows: value exactly 65 (not violation), 19.999 (low), 10 (not risk)
    """
    rows = [
        _ev(1, 0, 1, "view", 100.0),
        _ev(2, 10, 1, "view", 200.0),
        _ev(3, 11, 1, "error", 50.0),
        _ev(4, 12, 1, "error", 50.0),
        _ev(5, 13, 1, "error", 50.0),
        _ev(6, 14, 1, "error", 50.0),
        _ev(7, 0, 2, "view", 10.0),
        _ev(8, 20, 2, "view", 60.0),
        _ev(9, 0, 3, "error", 42.0),
        _ev(10, 0, 4, "view", 500.0),
        _ev(11, 30, 4, "view", 400.0),  # regress
        _ev(12, 40, 5, "view", 65.0),  # exactly at speed limit → NOT a violation
        _ev(13, 41, 5, "view", 19.999),  # below 20 → Low Battery
        _ev(14, 42, 5, "error", 10.0),  # exactly 10 → NOT collision risk
    ]
    d = tmp_path_factory.mktemp("fixture_sf")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


AS_OF = "2024-01-21 00:00:00"


def test_km_per_intervention_null_when_zero_events(spark, fixture_dir):
    out = {
        r["vehicle_id"]: r
        for r in metrics.km_per_intervention(
            spark, fixture_dir, hours=24, as_of=AS_OF
        ).collect()
    }
    assert out[1]["km_driven"] == 100.0
    assert out[1]["interventions"] == 4
    assert out[1]["km_per_intervention"] == 25.0
    # zero interventions → NULL rate, not 0 (queries.py:106-107)
    assert out[2]["interventions"] == 0
    assert out[2]["km_per_intervention"] is None
    # interventions without telemetry → not present (LEFT join keeps dist side)
    assert 3 not in out


def test_rate_clamps_odometer_regress(spark, fixture_dir):
    out = {
        r["vehicle_id"]: r
        for r in metrics.intervention_rate(spark, fixture_dir, hours=24, as_of=AS_OF).collect()
    }
    # user 4 span = GREATEST(0, 400-500)... max=500,min=400 → 100? No:
    # clamp is GREATEST(0, COALESCE(MAX)-COALESCE(MIN)) = 500-400 = 100.
    assert out[4]["km_driven"] == 100.0
    # user 1: 4 interventions over 100 km → 4 per 100km
    assert out[1]["rate_per_100km"] == 4.0


def test_alert_threshold_strictness(spark, fixture_dir):
    alerts = metrics.alerts_batch(spark, fixture_dir).collect()
    by_type = {}
    for a in alerts:
        by_type.setdefault(a["alert_type"], []).append(a)
    # value == 65 exactly → NOT a speed violation (strict >, producer.py:79)
    speed_vehicles = {a["vehicle_id"] for a in by_type.get("Speed Violation", [])}
    assert 5 not in speed_vehicles
    # 19.999 < 20 → Low Battery fires (strict <, consumer.py:99)
    low = [a for a in by_type.get("Low Battery", []) if a["vehicle_id"] == 5]
    assert len(low) == 1
    assert low[0]["alert_message"] == "Vehicle 5 battery low (20.00%)"  # %.2f rounds display
    # value == 10 exactly → NOT collision risk (strict >, consumer.py:114)
    risk_vehicles = {a["vehicle_id"] for a in by_type.get("Collision Risk", [])}
    assert 5 not in risk_vehicles


def test_latest_telemetry_deterministic_tiebreak(spark, tmp_path_factory):
    # duplicate (user, ts) rows → highest event_id wins (FIXTURES.md §6.4)
    rows = [
        _ev(1, 0, 9, "view", 1.0),
        _ev(2, 0, 9, "view", 2.0),
        _ev(3, 0, 9, "view", 3.0),
    ]
    d = tmp_path_factory.mktemp("tie_sf")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(str(d / "events.parquet"))
    out = metrics.latest_telemetry(spark, str(d)).collect()
    assert len(out) == 1
    assert out[0]["value"] == 3.0


def test_fleet_summary_single_row(spark, fixture_dir):
    row = metrics.fleet_summary(spark, fixture_dir, hours=24, as_of=AS_OF).collect()
    assert len(row) == 1
    r = row[0]
    # spans: u1=100, u2=50, u4=100, u5=45.001 → 295.0 (cents-exact)
    assert r["total_km"] == pytest.approx(295.0, abs=0.01)
    assert r["total_interventions"] == 6
    assert r["km_per_intervention"] == pytest.approx(295.0 / 6, abs=0.01)


def test_window_predicate_excludes_old_rows(spark, fixture_dir):
    # as_of far in the future → 24h window selects nothing
    out = metrics.driving_event_counts(
        spark, fixture_dir, hours=24, as_of="2024-03-01 00:00:00"
    ).collect()
    assert out == []


def test_dashboard_snapshot_matches_individual_queries(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark import dashboard
    from data_pipeline_for_autonomous_vehicles_spark.operators import metrics as m

    snap = dashboard.dashboard_snapshot(spark, sf_dir)
    assert set(snap) == {
        "driving_event_counts", "recent_alerts", "vehicle_list",
        "latest_telemetry", "km_per_intervention", "intervention_rate",
        "disengagement_rate", "perception_summary", "fleet_summary",
        "autopilot_engagement",
    }
    # snapshot frames equal the standalone metric results
    a = {tuple(map(str, r)) for r in snap["km_per_intervention"].collect()}
    b = {tuple(map(str, r)) for r in m.km_per_intervention(spark, sf_dir).collect()}
    assert a == b
    assert snap["fleet_summary"].count() == 1
    dashboard.release(spark)


def test_dashboard_snapshot_vehicle_filter(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark import dashboard

    snap = dashboard.dashboard_snapshot(spark, sf_dir, vehicle_id=3)
    tele = snap["latest_telemetry"].collect()
    assert len(tele) <= 1
    for r in snap["driving_event_counts"].collect():
        assert r["vehicle_id"] == 3
    dashboard.release(spark)


def test_chart_frames_render_harness(spark, sf_dir):
    """chart_frames must produce the reference dashboard's widget inputs
    (dashboard.py:74-194): KPI header, speed gauge spec (axis max(120,
    min(1000, 1.2·v)), threshold 65), grouped/stacked bar frames with the
    exact plotly axis columns, and the table frames — all consistent with
    the underlying metric queries."""
    from data_pipeline_for_autonomous_vehicles_spark import dashboard
    from data_pipeline_for_autonomous_vehicles_spark.operators import metrics

    frames = dashboard.chart_frames(spark, sf_dir)
    assert set(frames) == {
        "kpis", "speed_gauge", "events_bar", "perception_bar", "alerts",
        "km_per_intervention", "intervention_rate", "disengagement_rate",
        "engagement", "fleet",
    }
    k = frames["kpis"]
    assert k["vehicles_with_data"] == metrics.latest_telemetry(spark, sf_dir).count()
    assert k["alerts_latest"] == metrics.recent_alerts(spark, sf_dir).count()
    assert k["interventions_plus_disengagements"] >= 0
    g = frames["speed_gauge"]
    assert g["threshold"] == 65.0
    assert g["axis_max"] == max(120.0, min(1000.0, g["value"] * 1.2))
    # the plotly bar inputs carry the reference's exact axis columns
    assert {"vehicle_id", "event_type", "event_count"} <= set(frames["events_bar"].columns)
    assert {"vehicle_id", "object_class", "detection_count"} <= set(
        frames["perception_bar"].columns
    )
    assert len(frames["events_bar"]) == metrics.driving_event_counts(spark, sf_dir).count()
    dashboard.release(spark)


def test_dashboard_app_contract_and_graceful_degrade(spark, sf_dir):
    """The runnable Streamlit entry (scripts/dashboard_app.py) consumes
    exactly the chart_frames payload — its REQUIRED_FRAME_KEYS must stay
    in lockstep — and exits with a clear message (code 2) when streamlit
    is absent, which is this container's documented state."""
    import importlib.util
    import subprocess
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "dashboard_app", "/root/repo/scripts/dashboard_app.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import must not require streamlit

    from data_pipeline_for_autonomous_vehicles_spark import dashboard

    frames = dashboard.chart_frames(spark, sf_dir)
    assert mod.REQUIRED_FRAME_KEYS == set(frames)
    dashboard.release(spark)

    try:
        import streamlit  # noqa: F401
    except ImportError:
        proc = subprocess.run(
            [_sys.executable, "/root/repo/scripts/dashboard_app.py"],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 2
        assert "streamlit" in proc.stderr
