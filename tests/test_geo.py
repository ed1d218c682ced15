"""Geospatial-lite operator invariants.

The oracle gate (check_oracle / the driver) proves value equality at
sf; these tests pin the properties the oracle can't see: the geohash
matches an independent reference implementation, the ray-cast
matches an independent Python even-odd test, the banded distance
join misses NO pair on adversarial layouts (antimeridian, cell
corners), and the plans stay scale-safe.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_gov_spark.operators import geo as G


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- independent reference implementations (pure Python) -----------


def _ref_geohash(lat_milli: int, lon_milli: int, chars: int) -> str:
    lon_bits, lat_bits = G._geohash_quant(chars)
    lon_q = lon_milli * (1 << lon_bits) // 360000
    lat_q = lat_milli * (1 << lat_bits) // 120000
    bits = []
    li, ai = lon_bits - 1, lat_bits - 1
    for pos in range(5 * chars):
        if pos % 2 == 0:  # even positions (MSB-first) take longitude
            bits.append((lon_q >> li) & 1)
            li -= 1
        else:
            bits.append((lat_q >> ai) & 1)
            ai -= 1
    out = ""
    for k in range(chars):
        v = 0
        for b in bits[5 * k : 5 * k + 5]:
            v = (v << 1) | b
        out += G._BASE32[v]
    return out


def _ref_inside(lon: float, lat: float, ring) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i + 1) % n]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (
            yj - yi
        ) + xi:
            inside = not inside
    return inside


def _ref_haversine(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_geohash_matches_reference_bit_interleave(spark):
    """geohash_col's closed-form interleave == the canonical MSB-first
    alternating-bit construction, across precisions and the full
    coordinate domain (corners included)."""
    samples = [
        (0, 0),
        (119999, 359999),
        (60000, 180000),
        (1, 359998),
        (99990, 123456),
        (59999, 300001),
    ]
    df = spark.createDataFrame(samples, "lat_m long, lon_m long")
    for chars in (1, 2, 5):
        got = df.select(
            "lat_m",
            "lon_m",
            G.geohash_col(F.col("lat_m"), F.col("lon_m"), chars).alias("h"),
        ).collect()
        for r in got:
            assert r["h"] == _ref_geohash(r["lat_m"], r["lon_m"], chars), (
                chars,
                r["lat_m"],
                r["lon_m"],
            )
            assert len(r["h"]) == chars


def test_point_in_polygon_matches_python_raycast(spark):
    """The unrolled crossing expression == an independent even-odd
    ray-cast for every polygon over a lattice of probe points
    (interior, exterior, near-vertex)."""
    probes = [
        (lon / 1.0, lat / 1.0)
        for lon in range(-175, 180, 35)
        for lat in range(-55, 60, 23)
    ] + [(-35.0, 0.0), (120.0, -5.0), (0.0, 40.0), (-59.9, -19.9)]
    df = spark.createDataFrame(probes, "lon double, lat double")
    for name, ring in G.POLYGONS.items():
        got = df.select(
            "lon",
            "lat",
            G.point_in_polygon_col(F.col("lon"), F.col("lat"), ring).alias("i"),
        ).collect()
        for r in got:
            assert r["i"] == _ref_inside(r["lon"], r["lat"], ring), (
                name,
                r["lon"],
                r["lat"],
            )
    # sanity: at least one probe inside each region
    for name, ring in G.POLYGONS.items():
        assert any(_ref_inside(lon, lat, ring) for lon, lat in probes), name


def test_banded_pairs_complete_on_adversarial_layout(spark):
    """banded_pairs finds EXACTLY the brute-force pair set on a
    layout built to break banding: clusters straddling the
    antimeridian, a cell-corner crossing, the ±60 latitude edge, and
    isolated far points."""
    pts = [
        # antimeridian cluster: ~111 km apart across the seam
        (1, 10.0, 179.5),
        (2, 10.0, -179.5),
        # cell-corner cluster (6° cells start at -180/-60): corners
        # at lon=-174/lat=-54 — points in 4 different cells, all
        # within 300 km of each other
        (3, -54.5, -174.5),
        (4, -53.5, -174.5),
        (5, -54.5, -173.5),
        (6, -53.5, -173.5),
        # latitude-band edge pair
        (7, 59.9, 20.0),
        (8, 59.1, 21.0),
        # isolated points (no partner in range)
        (9, -30.0, 60.0),
        (10, 45.0, -100.0),
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        (r["a_id"], r["b_id"])
        for r in G.banded_pairs(df, radius_km=300.0, cell_deg=6.0).collect()
    }
    want = set()
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            ia, la, oa = pts[i]
            ib, lb, ob = pts[j]
            if _ref_haversine(la, oa, lb, ob) <= 300.0:
                want.add((min(ia, ib), max(ia, ib)))
    assert got == want
    assert (1, 2) in got, "antimeridian pair must survive the wrap"
    assert {(3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6)} <= got
    assert all(9 not in p and 10 not in p for p in got)


def test_geo_plans_scale_safe(spark, sf_dir):
    """Hotspots top-k plans TakeOrderedAndProject (distributed
    take), the banded join never plans a cartesian product, and the
    nearest-hub join broadcasts the 25-row hub side."""
    hot = G.geo_grid_hotspots(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(hot)

    banded = G.geo_banded_distance_join(spark, sf_dir)
    p = _plan(banded)
    assert "CartesianProduct" not in p

    hub = G.geo_nearest_hub_census(spark, sf_dir)
    assert "BroadcastNestedLoopJoin" in _plan(hub) or "BroadcastHashJoin" in _plan(
        hub
    )


def test_geocoder_band_and_determinism(spark, sf_dir):
    """Synthetic coordinates stay in the ±60 lat band and [-180,180)
    lon domain, and are a pure function of the key."""
    cust = G._customers_geo(spark, sf_dir)
    row = cust.agg(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")
    ).collect()[0]
    assert -60.0 <= row[0] and row[1] < 60.0
    assert -180.0 <= row[2] and row[3] < 180.0
    a = cust.orderBy("c_custkey").limit(5).collect()
    b = cust.orderBy("c_custkey").limit(5).collect()
    assert [(r["lat"], r["lon"]) for r in a] == [(r["lat"], r["lon"]) for r in b]


# --- round-9 widening II: flows, stays, Gi*, straightness ----------


def _events_pd(sf_dir):
    import pandas as pd

    return pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "ts", "event_id"]
    ].sort_values(["user_id", "ts", "event_id"])


def _ping(eid: int) -> tuple[float, float]:
    lat = ((eid * G._LAT_MULT) % 120000) / 1000.0 - 60.0
    lon = ((eid * G._LON_MULT) % 360000) / 1000.0 - 180.0
    return lat, lon


def test_od_flow_matrix_conserves_legs(spark, sf_dir):
    """Every user with n pings contributes exactly n-1 legs, cells
    stay in the bounded 0..47 domain, and the flow total matches."""
    res = G.geo_od_flow_matrix(spark, sf_dir).collect()
    ev = _events_pd(sf_dir)
    n_events = len(ev)
    n_users = ev["user_id"].nunique()
    assert sum(r["n_legs"] for r in res) == n_events - n_users
    for r in res:
        assert 0 <= r["origin_cell"] <= 47 and 0 <= r["dest_cell"] <= 47
        assert r["n_users"] <= r["n_legs"]


def test_stay_points_matches_python_reference(spark, sf_dir):
    """The gaps-and-islands segmentation agrees with an independent
    row-at-a-time Python walk over the same event stream."""
    res = {r["cohort"]: r for r in G.geo_stay_points(spark, sf_dir).collect()}
    ev = _events_pd(sf_dir)
    stays, users, stay_pings, total_pings = {}, {}, {}, {}
    for uid, grp in ev.groupby("user_id"):
        prev = None
        episodes = []
        for eid in grp["event_id"]:
            lat, lon = _ping(int(eid))
            if prev is None:
                episodes.append(1)
            else:
                leg = round(_ref_haversine(prev[0], prev[1], lat, lon), 6)
                if leg > G._STAY_KM:
                    episodes.append(1)
                else:
                    episodes[-1] += 1
            prev = (lat, lon)
        c = int(uid) % 10
        users[c] = users.get(c, 0) + 1
        stays[c] = stays.get(c, 0) + sum(1 for e in episodes if e >= 2)
        stay_pings[c] = stay_pings.get(c, 0) + sum(e for e in episodes if e >= 2)
        total_pings[c] = total_pings.get(c, 0) + len(grp)
    for c, r in res.items():
        assert r["n_users"] == users[c]
        assert r["n_stays"] == stays[c]
        assert r["dwell_share"] == round(stay_pings[c] / total_pings[c], 6)


def test_gi_hotspots_matches_python_reference(spark, sf_dir):
    """Top-15 Gi* cells and scores agree with a dense numpy replay
    of the scatter + population-moment formula."""
    import pandas as pd

    res = G.geo_gi_hotspots(spark, sf_dir).collect()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")["c_custkey"]
    counts = {}
    for k in cust:
        cell = (
            int((k * G._LAT_MULT) % 120000) // 1000,
            int((k * G._LON_MULT) % 360000) // 1000,
        )
        counts[cell] = counts.get(cell, 0) + 1
    D = 120 * 360
    n = sum(counts.values())
    mu = n / D
    sd = math.sqrt(sum(c * c for c in counts.values()) / D - mu * mu)
    denom = sd * math.sqrt((9.0 * D - 81.0) / (D - 1.0))
    scored = []
    for (la, lo), c in counts.items():
        s = 0
        for dla in (-1, 0, 1):
            for dlo in (-1, 0, 1):
                nb = (la + dla, (lo + dlo + 360) % 360)
                if 0 <= nb[0] <= 119:
                    s += counts.get(nb, 0)
        scored.append((round((s - 9.0 * mu) / denom, 6), la, lo, c, s))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:15]
    assert len(res) == 15
    for r, (z, la, lo, c, s) in zip(res, want):
        assert (r["cell_lat"], r["cell_lon"]) == (la, lo)
        assert r["gi_z"] == z
        assert r["n_points"] == c and r["nbr_points"] == s


def test_trip_straightness_bounded_by_triangle_inequality(spark, sf_dir):
    """Net displacement can't exceed path length (haversine is a
    metric), so every cohort-average straightness sits in (0, 1]."""
    res = G.geo_trip_straightness(spark, sf_dir).collect()
    assert len(res) == 10
    for r in res:
        assert 0.0 < r["avg_straightness"] <= 1.0 + 1e-6
        assert r["avg_net_km"] <= r["avg_total_km"] + 1e-6


def test_new_geo_plans_scale_safe(spark, sf_dir):
    """No single-partition exchange in any of the four new plans
    except Gi*'s final top-15, which must be a distributed take."""
    for fn in (
        G.geo_od_flow_matrix,
        G.geo_stay_points,
        G.geo_trip_straightness,
    ):
        p = _plan(fn(spark, sf_dir))
        assert "Exchange SinglePartition" not in p, fn.__name__
        assert "CartesianProduct" not in p, fn.__name__
    gi = _plan(G.geo_gi_hotspots(spark, sf_dir))
    assert "TakeOrderedAndProject" in gi
    assert "CartesianProduct" not in gi


def test_home_location_census_consistent(spark, sf_dir):
    """geo_home_location: cohorts partition the user base, home
    dominance is a valid share in (0, 1], and distinct home cells
    per cohort can't exceed its user count."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.geo import geo_home_location

    rows = geo_home_location(spark, sf_dir).collect()
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0.0 < r.mean_home_share <= r.max_home_share <= 1.0
        assert 0 < r.n_home_cells <= r.n_users


def test_home_k_anonymity_consistent_with_home_census(spark, sf_dir):
    """geo_home_k_anonymity: total users equals the home census's
    user total, risk arithmetic is internally consistent, and the
    risky-cell count can't exceed total cells."""
    from etl_gov_spark.operators.geo import (
        geo_home_k_anonymity,
        geo_home_location,
    )

    r = geo_home_k_anonymity(spark, sf_dir).collect()[0]
    homes = geo_home_location(spark, sf_dir).collect()
    assert r.n_users_total == sum(h.n_users for h in homes)
    assert 0 <= r.n_risky_cells <= r.n_cells
    assert 0 <= r.n_users_at_risk < r.k * max(r.n_risky_cells, 1) + 1
    assert 0.0 <= r.at_risk_share <= 1.0
