"""Spatial proximity join tests (operators/spatial.py).

Key property: the geo-cell-bucketed equi-join must produce exactly the
same pairs as the naive O(n²) crossJoin it replaces — the cell grid is a
pure optimization, never a semantics change.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.operators import spatial


def _naive_pairs(spark, sf_dir):
    pos = spatial.vehicle_positions(spark, sf_dir)
    a = pos
    b = pos.select(
        F.col("vehicle_id").alias("other_id"),
        F.col("lat").alias("other_lat"),
        F.col("lon").alias("other_lon"),
    )
    dlat = (F.col("lat") - F.col("other_lat")) * F.lit(spatial.M_PER_DEG_LAT)
    dlon = (
        (F.col("lon") - F.col("other_lon"))
        * F.lit(spatial.M_PER_DEG_LAT)
        * F.lit(spatial.LON_SCALE)
    )
    w = Window.partitionBy("vehicle_id").orderBy("dist_m", "other_id")
    return (
        a.crossJoin(b)
        .filter(F.col("other_id") != F.col("vehicle_id"))
        .withColumn("dist_m", F.sqrt(dlat * dlat + dlon * dlon))
        .filter(F.col("dist_m") <= spatial.RADIUS_M)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= spatial.TOP_K)
        .select("vehicle_id", "other_id", "dist_m", F.col("rnk").cast("long").alias("rnk"))
    )


def test_bucketed_equals_naive(spark, sf_dir):
    bucketed = {
        (r["vehicle_id"], r["other_id"], r["rnk"])
        for r in spatial.nearby_vehicle_pairs(spark, sf_dir).collect()
    }
    naive = {
        (r["vehicle_id"], r["other_id"], r["rnk"])
        for r in _naive_pairs(spark, sf_dir).collect()
    }
    assert bucketed == naive


def test_pairs_symmetric_and_bounded(spark, sf_dir):
    rows = spatial.nearby_vehicle_pairs(spark, sf_dir).collect()
    pairs = {(r["vehicle_id"], r["other_id"]) for r in rows}
    for r in rows:
        assert r["vehicle_id"] != r["other_id"]
        assert 0.0 < r["dist_m"] <= spatial.RADIUS_M
        assert 1 <= r["rnk"] <= spatial.TOP_K
    per_vehicle = {}
    for r in rows:
        per_vehicle[r["vehicle_id"]] = per_vehicle.get(r["vehicle_id"], 0) + 1
    assert all(n <= spatial.TOP_K for n in per_vehicle.values())
    # distance is symmetric, so below the top-k cap membership is mutual;
    # at minimum, no pair may appear with two different distances
    dist = {}
    for r in rows:
        key = tuple(sorted((r["vehicle_id"], r["other_id"])))
        assert abs(dist.setdefault(key, r["dist_m"]) - r["dist_m"]) < 1e-9


def test_positions_one_row_per_vehicle(spark, sf_dir):
    pos = spatial.vehicle_positions(spark, sf_dir)
    n = pos.count()
    assert n == pos.select("vehicle_id").distinct().count()
    for r in pos.collect():
        assert 37.0 <= r["lat"] <= 37.5
        assert -122.5 <= r["lon"] <= -121.8


def test_spatial_clusters_partition_and_edge_consistency(spark, sf_dir):
    """Clusters partition the fleet; any two vehicles within eps share a
    cluster; cluster ids are member minima."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import spatial
    import math

    out = spatial.spatial_clusters(spark, sf_dir).collect()
    pos = {r["vehicle_id"]: (r["lat"], r["lon"]) for r in spatial.vehicle_positions(spark, sf_dir).collect()}
    assert sum(r["n_points"] for r in out) == len(pos)
    # brute-force union-find recomputation
    parent = {v: v for v in pos}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(pos)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dlat = (pos[a][0] - pos[b][0]) * spatial.M_PER_DEG_LAT
            dlon = (pos[a][1] - pos[b][1]) * spatial.M_PER_DEG_LAT * spatial.LON_SCALE
            if math.sqrt(dlat * dlat + dlon * dlon) <= spatial.RADIUS_M:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    sizes = Counter(find(v) for v in pos)
    assert {(r["cluster_id"], r["n_points"]) for r in out} == set(sizes.items())
