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
