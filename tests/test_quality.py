"""Privacy-release audits (k-anonymity / l-diversity) — literal recounts
over exact QI classes on driver data."""

from __future__ import annotations


def test_l_diversity_consistent_with_k_anonymity_and_bruteforce(spark, sf_dir):
    """l-diversity counts match a literal recount over exact QI classes,
    and are bounded by the k-anonymity view of the same classes (a class
    with < l distinct users has at least as few users as rows)."""
    import math
    from collections import defaultdict

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.quality import (
        L_DIV_THRESHOLDS,
        l_diversity_report,
    )

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value", "user_id"
    ).collect()
    classes = defaultdict(lambda: [0, set()])
    for r in rows:
        key = (r["event_type"], r["ts"].date(), math.floor(r["value"] / 10.0))
        classes[key][0] += 1
        classes[key][1].add(r["user_id"])
    got = {r["l"]: r for r in l_diversity_report(spark, sf_dir).collect()}
    assert set(got) == set(L_DIV_THRESHOLDS)
    for l in L_DIV_THRESHOLDS:
        below = [(n, users) for n, users in classes.values() if len(users) < l]
        assert got[l]["n_classes_below"] == len(below)
        assert got[l]["n_rows_at_risk"] == sum(n for n, _ in below)
        assert got[l]["n_classes_total"] == len(classes)
    # monotone in l, and the signal exists on driver data
    risks = [got[l]["n_rows_at_risk"] for l in sorted(L_DIV_THRESHOLDS)]
    assert risks == sorted(risks)
    assert risks[-1] > 0
