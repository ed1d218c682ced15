"""Geospatial-lite operators: haversine, geohash, point-in-polygon,
banded distance joins — the family a government data platform needs
(almost everything a gov publishes has a location) expressed with
the same portable-primitive discipline as the rest of the engine:
every computation is plain column arithmetic that Spark and DuckDB
evaluate bit-identically, so each query carries a full value-hash
oracle.

Coordinates: the TPC-H-ish tables carry no lat/lon, so a
deterministic integer "geocoder" stands in (documented stand-in,
same role as the multimodal fake decode): millidegrees are derived
from the entity key by Knuth multiplicative hashing —
``lat = ((key * 2654435761) % 120000)/1000 - 60`` (±60° band, no
polar degeneracy), ``lon = ((key * 2246822519) % 360000)/1000 - 180``.
Pure int64 arithmetic → identical in both engines; the products stay
far below 2^63.

Cross-engine float discipline: IEEE +,−,×,÷ are correctly rounded
and identical everywhere, so grid/geohash math (integer scaling and
exact divisions) hashes exactly; only the trig in haversine is
libm-dependent, so every distance is rounded to 6 dp BEFORE any
ranking/aggregation (the same quantize-then-rank contract as the
embedding cosine queries).

Scale notes per query in each docstring. Reference parity: the
reference's domain (gov open data) publishes location columns
everywhere; its stock DAG suite has no geospatial operator to cite,
so this family is the Spark-first widening the round-8 verdict
directed (VERDICT.md "Next round" #7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog
from etl_gov_spark.operators.privacy import K_ANON

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

_LAT_MULT = 2654435761  # Knuth multiplicative hash constants
_LON_MULT = 2246822519
_EARTH_KM = 6371.0
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


# --- deterministic geocoder (shared Spark/SQL definitions) ---------


def lat_col(key: Column) -> Column:
    """Synthetic latitude in [-60, 60) millidegree-derived from an
    integer key (exact int64 arithmetic)."""
    return ((key * F.lit(_LAT_MULT)) % 120000) / 1000.0 - 60.0


def lon_col(key: Column) -> Column:
    """Synthetic longitude in [-180, 180)."""
    return ((key * F.lit(_LON_MULT)) % 360000) / 1000.0 - 180.0


def _lat_sql(key: str) -> str:
    return f"((({key} * {_LAT_MULT}) % 120000) / 1000.0 - 60.0)"


def _lon_sql(key: str) -> str:
    return f"((({key} * {_LON_MULT}) % 360000) / 1000.0 - 180.0)"


# --- haversine (rounded to 6 dp — the only libm-touching step) -----


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, correct across the antimeridian
    (sin²(Δλ/2) is symmetric-periodic, so raw Δλ needs no wrap
    normalization)."""
    sphi = F.sin(F.radians(lat2 - lat1) / 2)
    slmb = F.sin(F.radians(lon2 - lon1) / 2)
    a = (
        sphi * sphi
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * slmb * slmb
    )
    return 2.0 * _EARTH_KM * F.asin(F.sqrt(a))


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"(2.0 * {_EARTH_KM} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)"
        f")))"
    )


# --- geohash from integer millidegrees (pure arithmetic) -----------


def _geohash_quant(chars: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a geohash of ``chars`` base32 chars.
    Geohash interleaves starting with longitude, so odd totals give
    longitude the extra bit."""
    total = 5 * chars
    lon_bits = (total + 1) // 2
    return lon_bits, total - lon_bits


def geohash_col(lat_milli: Column, lon_milli: Column, chars: int) -> Column:
    """Geohash string of ``chars`` base32 chars from millidegree
    columns (lat_milli in [0,120000) for the ±60 band's offset
    latitude, lon_milli in [0,360000)). All integer shifts and an
    exact substring lookup — no floats, so Spark and DuckDB agree
    bitwise. The quantizer maps the ±60 lat band onto the full
    geohash lat domain via the same scale both sides."""
    lon_bits, lat_bits = _geohash_quant(chars)
    # MSB-first the hash alternates lon,lat,lon,...; in LSB shift
    # terms that puts lon bit j at position 2j for ODD bit totals
    # and 2j+1 for even totals (lat the other way around)
    lon_off, lat_off = (0, 1) if (5 * chars) % 2 else (1, 0)
    lon_q = F.floor(lon_milli * (1 << lon_bits) / 360000).cast("long")
    lat_q = F.floor(lat_milli * (1 << lat_bits) / 120000).cast("long")
    inter = F.lit(0).cast("long")
    for j in range(lon_bits):
        inter = inter + F.shiftleft(
            F.shiftright(lon_q, j).bitwiseAND(1), 2 * j + lon_off
        )
    for j in range(lat_bits):
        inter = inter + F.shiftleft(
            F.shiftright(lat_q, j).bitwiseAND(1), 2 * j + lat_off
        )
    out = None
    for k in range(chars):
        idx = F.shiftright(inter, 5 * (chars - 1 - k)).bitwiseAND(31)
        ch = F.lit(_BASE32).substr(idx + 1, F.lit(1))
        out = ch if out is None else F.concat(out, ch)
    return out


def _geohash_sql(lat_milli: str, lon_milli: str, chars: int) -> str:
    """DuckDB mirror of ``geohash_col`` — generated from the same
    bit layout so the two can't drift."""
    lon_bits, lat_bits = _geohash_quant(chars)
    lon_off, lat_off = (0, 1) if (5 * chars) % 2 else (1, 0)
    lon_q = f"((({lon_milli}) * {1 << lon_bits}) // 360000)"
    lat_q = f"((({lat_milli}) * {1 << lat_bits}) // 120000)"
    terms = [
        f"((({lon_q} >> {j}) & 1) << {2 * j + lon_off})" for j in range(lon_bits)
    ] + [
        f"((({lat_q} >> {j}) & 1) << {2 * j + lat_off})" for j in range(lat_bits)
    ]
    inter = "(" + " + ".join(terms) + ")"
    chars_sql = " || ".join(
        f"substr('{_BASE32}', CAST(((({inter} >> {5 * (chars - 1 - k)}) & 31)) + 1 AS INTEGER), 1)"
        for k in range(chars)
    )
    return "(" + chars_sql + ")"


# --- ray-cast point-in-polygon (unrolled per literal edge) ---------

# Three literal audit regions (lon, lat vertex rings, not closed).
POLYGONS: dict[str, list[tuple[float, float]]] = {
    "atlantic_corridor": [
        (-60.0, -20.0),
        (-10.0, -25.0),
        (5.0, 10.0),
        (-20.0, 35.0),
        (-55.0, 20.0),
    ],
    "indo_pacific": [(60.0, -30.0), (150.0, -35.0), (165.0, 15.0), (90.0, 25.0)],
    "northern_band": [
        (-150.0, 35.0),
        (-30.0, 30.0),
        (60.0, 42.0),
        (170.0, 38.0),
        (175.0, 58.0),
        (-140.0, 55.0),
    ],
}


def point_in_polygon_col(
    lon: Column, lat: Column, ring: list[tuple[float, float]]
) -> Column:
    """Ray-cast test: odd number of edge crossings of the eastward
    ray ⇒ inside. Each edge unrolls to one crossing predicate; the
    vertex list is literal, so the expression is fixed-size and
    identical (op for op) to the SQL mirror."""
    inside = F.lit(False)
    n = len(ring)
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i + 1) % n]
        crosses = ((F.lit(yi) > lat) != (F.lit(yj) > lat)) & (
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
        )
        inside = F.when(crosses, ~inside).otherwise(inside)
    return inside


def _point_in_polygon_sql(
    lon: str, lat: str, ring: list[tuple[float, float]]
) -> str:
    n = len(ring)
    terms = []
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({yi} > {lat}) != ({yj} > {lat})) AND "
            f"(({lon}) < ({xj} - {xi}) * (({lat}) - {yi}) / ({yj} - {yi}) + {xi}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


# --- queries -------------------------------------------------------


def _customers_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer.select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    return c.withColumn("lat", lat_col(F.col("c_custkey"))).withColumn(
        "lon", lon_col(F.col("c_custkey"))
    )


_CUST_GEO_SQL = f"""
  SELECT c_custkey, c_nationkey, c_acctbal,
         {_lat_sql('c_custkey')} AS lat,
         {_lon_sql('c_custkey')} AS lon
  FROM customer
"""


def geo_nearest_hub_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment: every customer point snaps to the
    closest of 25 nation hubs by haversine, then a per-hub census
    (members, mean/max distance).

    Spark-first: the hub table is 25 rows — a broadcast cross join
    (25× row expansion, map-side only) followed by one min-by-struct
    aggregate per customer; no shuffle until the 25-group census.
    At 100 TB of points this stays a single scan: hub count is a
    constant of the domain. Distances quantize to 6 dp before the
    argmin (tie-break on hub key) so both engines pick the same hub.
    """
    cust = _customers_geo(spark, sf_dir)
    hubs = Catalog(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("hub_key"),
        lat_col(F.col("n_nationkey").cast("long")).alias("hlat"),
        lon_col(F.col("n_nationkey").cast("long")).alias("hlon"),
    )
    d6 = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon")), 6
    )
    best = (
        cust.crossJoin(F.broadcast(hubs))
        .select(
            "c_custkey",
            F.struct(d6.alias("d"), F.col("hub_key").alias("h")).alias("dh"),
        )
        .groupBy("c_custkey")
        .agg(F.min("dh").alias("dh"))
        .select("c_custkey", F.col("dh.h").alias("hub_key"), F.col("dh.d").alias("d"))
    )
    return best.groupBy("hub_key").agg(
        F.count(F.lit(1)).alias("n_members"),
        _R4(F.avg("d"), "avg_km"),
        _R4(F.max("d"), "max_km"),
    )


GEO_NEAREST_HUB_SQL = f"""
WITH cust AS ({_CUST_GEO_SQL}),
hubs AS (
  SELECT n_nationkey AS hub_key,
         {_lat_sql('n_nationkey')} AS hlat,
         {_lon_sql('n_nationkey')} AS hlon
  FROM nation
), scored AS (
  SELECT c.c_custkey, h.hub_key,
         round({_haversine_sql('c.lat', 'c.lon', 'h.hlat', 'h.hlon')}, 6) AS d,
         row_number() OVER (
           PARTITION BY c.c_custkey
           ORDER BY round({_haversine_sql('c.lat', 'c.lon', 'h.hlat', 'h.hlon')}, 6),
                    h.hub_key) AS rn
  FROM cust c CROSS JOIN hubs h
)
SELECT hub_key, count(*) AS n_members,
       round(avg(d), 4) AS avg_km, round(max(d), 4) AS max_km
FROM scored WHERE rn = 1
GROUP BY hub_key
"""


_GEOHASH_CHARS = 2  # 10-bit cells (~1250 km): a bounded census domain


def geo_geohash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash bucketing: customers binned into base32 geohash cells
    (2 chars here — a bounded 1024-cell domain at any data size),
    with per-cell population and balance stats.

    The hash is pure integer bit-interleaving on millidegrees
    (geohash_col — no floats, no UDF, whole-stage codegen), so the
    bucketing runs at scan speed and the one shuffle is the
    per-cell aggregate; cells are a fixed domain, so the aggregate
    is skew-bounded and the result bounded regardless of N.
    """
    cust = Catalog(spark, sf_dir).customer.select(
        "c_custkey", "c_acctbal"
    ).select(
        "c_custkey",
        "c_acctbal",
        ((F.col("c_custkey") * _LAT_MULT) % 120000).alias("lat_m"),
        ((F.col("c_custkey") * _LON_MULT) % 360000).alias("lon_m"),
    )
    cells = cust.withColumn(
        "cell", geohash_col(F.col("lat_m"), F.col("lon_m"), _GEOHASH_CHARS)
    )
    return cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_points"),
        # integer-path 4-dp readout: money averages land on exact
        # 4-dp half-ties (…89625) where round(x, 4) disagrees
        # across engines (sf0.1 gate finding, round 12)
        (F.round(F.avg("c_acctbal") * 10000.0) / 10000.0).alias("avg_bal"),
    )


GEO_GEOHASH_CENSUS_SQL = f"""
WITH pts AS (
  SELECT c_custkey, c_acctbal,
         (c_custkey * {_LAT_MULT}) % 120000 AS lat_m,
         (c_custkey * {_LON_MULT}) % 360000 AS lon_m
  FROM customer
)
SELECT {_geohash_sql('lat_m', 'lon_m', _GEOHASH_CHARS)} AS cell,
       count(*) AS n_points,
       round(avg(c_acctbal) * 10000.0) / 10000.0 AS avg_bal
FROM pts GROUP BY 1
"""


def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon audit: customer membership in three literal
    audit regions via the ray-cast (even-odd) rule, reported as one
    row per region with population and balance stats.

    The crossing test unrolls to |edges| fixed predicates per region
    — branch-free column arithmetic inside one codegen stage, no
    join, no UDF; at 100 TB this is a full-scan map plus a 3-group
    aggregate. For polygon sets too large to unroll, the scale path
    is the banded-join pattern (geo_banded_distance_join) keyed by
    polygon bounding-box cells; semantics stay the even-odd rule.
    """
    cust = _customers_geo(spark, sf_dir)
    tagged = None
    for name, ring in POLYGONS.items():
        inside = point_in_polygon_col(F.col("lon"), F.col("lat"), ring)
        part = cust.filter(inside).withColumn("region", F.lit(name))
        tagged = part if tagged is None else tagged.unionByName(part)
    # group AFTER the union so an empty region is absent on both
    # engines (a literal-select global agg would keep a 0-row there
    # in SQL but null out the region name in Spark)
    return tagged.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_inside"),
        _R4(F.avg("c_acctbal"), "avg_bal"),
        F.count_distinct("c_nationkey").alias("n_nations"),
    )


def _pip_sql() -> str:
    parts = []
    for name, ring in POLYGONS.items():
        pred = _point_in_polygon_sql("lon", "lat", ring)
        parts.append(
            f"SELECT '{name}' AS region, c_acctbal, c_nationkey\n"
            f"FROM ({_CUST_GEO_SQL}) WHERE {pred}"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
SELECT region, count(*) AS n_inside,
       round(avg(c_acctbal), 4) AS avg_bal,
       count(DISTINCT c_nationkey) AS n_nations
FROM ({union})
GROUP BY region
"""


GEO_POINT_IN_POLYGON_SQL = _pip_sql()


_NEIGHBOR_KM = 300.0
_CELL_DEG = 6.0  # ≥ 300 km of lon even at |lat| = 60 (5.4°)
_LON_CELLS = int(360 / _CELL_DEG)


def banded_pairs(
    points: DataFrame,
    radius_km: float = _NEIGHBOR_KM,
    cell_deg: float = _CELL_DEG,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """All point pairs within ``radius_km`` without an O(N²) cross
    join. ``points`` needs columns ``id``, ``lat``, ``lon`` (plus any
    ``carry`` columns, returned with an ``a_`` prefix from the pair's
    lower-id side). Returns (a_id, b_id, km, a_<carry>...).

    Each point lands in a ``cell_deg`` grid cell; the caller must
    pick ``cell_deg`` ≥ the radius in degrees at the worst latitude
    (for the ±60 geocoder band: deg ≥ km / (111.195 · cos 60°)).
    One side explodes to its 3×3 neighbor cells — longitude cells
    wrap at the antimeridian — candidates equi-join on cell (plain
    shuffle-on-key, Σ|cell|·9 candidates), the exact haversine
    filter confirms, ``a_id < b_id`` dedups. Each pair meets in
    exactly one offset (the neighbor relation is a function of the
    two cells), so no distinct pass is needed.
    """
    lon_cells = int(round(360 / cell_deg))
    with_cell = points.select(
        "*",
        F.floor((F.col("lat") + 60.0) / cell_deg).cast("long").alias("cy"),
        F.floor((F.col("lon") + 180.0) / cell_deg).cast("long").alias("cx"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off = points.sparkSession.createDataFrame(offsets, "dx long, dy long")
    left = with_cell.crossJoin(F.broadcast(off)).select(
        F.col("id").alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in carry],
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        ((F.col("cx") + F.col("dx") + lon_cells) % lon_cells).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    right = with_cell.select(
        F.col("id").alias("b_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d6 = F.round(
        haversine_km(
            F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
        ),
        6,
    )
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", *[f"a_{c}" for c in carry], "b_id", d6.alias("km"))
        .filter(F.col("km") <= radius_km)
    )


def geo_banded_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 300 km, found WITHOUT the O(N²)
    cross join (the synthetic geocoder's lattice spacing puts nearest
    neighbors ~250 km apart, hence the 300 km audit radius): each point lands in a 6° grid cell (cell edge ≥
    the radius at every latitude in the ±60 band), one side explodes
    to its 3×3 neighbor cells (longitude wraps at the antimeridian),
    the pair candidates equi-join on cell — a plain shuffle-on-key
    join costing Σ |cell|·9 — and the exact haversine ≤ 300 km filter
    plus a < tie-break dedups and confirms. Per-nation pair census
    as the bounded readout.

    The oracle brute-forces the same pairs (fine at oracle SF); the
    banded plan is the one that survives 100 TB — candidate count
    scales with density × N, not N².
    """
    cust = _customers_geo(spark, sf_dir).select(
        F.col("c_custkey").alias("id"), "c_nationkey", "lat", "lon"
    )
    pairs = banded_pairs(cust, carry=("c_nationkey",))
    return pairs.groupBy(F.col("a_c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        _R4(F.avg("km"), "avg_km"),
        _R4(F.min("km"), "min_km"),
    )


GEO_BANDED_JOIN_SQL = f"""
WITH cust AS ({_CUST_GEO_SQL}),
pairs AS (
  SELECT a.c_custkey AS a_id, a.c_nationkey AS a_nat,
         b.c_custkey AS b_id,
         round({_haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')}, 6) AS km
  FROM cust a JOIN cust b ON a.c_custkey < b.c_custkey
)
SELECT a_nat AS nationkey, count(*) AS n_pairs,
       round(avg(km), 4) AS avg_km, round(min(km), 4) AS min_km
FROM pairs WHERE km <= {_NEIGHBOR_KM}
GROUP BY a_nat
"""


_HOT_K = 20


def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 densest 1° grid cells (spatial hotspot detection):
    grid aggregate, then a two-phase top-k — orderBy().limit(k)
    plans TakeOrderedAndProject (each partition keeps k, the driver
    merges k·P), never a global sort. Readout: cell coordinates,
    population, mean balance.
    """
    cust = _customers_geo(spark, sf_dir)
    cells = cust.select(
        F.floor(F.col("lat")).cast("long").alias("cell_lat"),
        F.floor(F.col("lon")).cast("long").alias("cell_lon"),
        "c_acctbal",
    )
    agg = cells.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).alias("n_points"),
        _R4(F.avg("c_acctbal"), "avg_bal"),
    )
    return agg.orderBy(
        F.desc("n_points"), F.asc("cell_lat"), F.asc("cell_lon")
    ).limit(_HOT_K)


GEO_GRID_HOTSPOTS_SQL = f"""
WITH cust AS ({_CUST_GEO_SQL}),
agg AS (
  SELECT CAST(floor(lat) AS BIGINT) AS cell_lat,
         CAST(floor(lon) AS BIGINT) AS cell_lon,
         count(*) AS n_points, round(avg(c_acctbal), 4) AS avg_bal
  FROM cust GROUP BY 1, 2
)
SELECT cell_lat, cell_lon, n_points, avg_bal
FROM agg ORDER BY n_points DESC, cell_lat ASC, cell_lon ASC
LIMIT {_HOT_K}
"""


QUERIES: dict[str, tuple] = {
    "geo_nearest_hub_census": (geo_nearest_hub_census, GEO_NEAREST_HUB_SQL),
    "geo_geohash_census": (geo_geohash_census, GEO_GEOHASH_CENSUS_SQL),
    "geo_point_in_polygon": (geo_point_in_polygon, GEO_POINT_IN_POLYGON_SQL),
    "geo_banded_distance_join": (geo_banded_distance_join, GEO_BANDED_JOIN_SQL),
    "geo_grid_hotspots": (geo_grid_hotspots, GEO_GRID_HOTSPOTS_SQL),
}


def geo_user_travel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory mileage per user: events become position pings
    (event_id geocoded like every other entity), consecutive pings
    per user chain into legs via one PARTITIONED lag window
    (per-user shards — skew-bounded by the busiest user, never a
    global sort), each leg's haversine quantizes to 6 dp, and the
    readout is a per-user-cohort (user_id % 10) travel census:
    total km, mean leg, share of long (> 5000 km) legs. The
    gov-telemetry shape: mobility audits over located pings.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id"
    ).select(
        "user_id",
        "ts",
        "event_id",
        lat_col(F.col("event_id")).alias("lat"),
        lon_col(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = ev.select(
        "user_id",
        F.round(
            haversine_km(
                F.lag("lat").over(w),
                F.lag("lon").over(w),
                F.col("lat"),
                F.col("lon"),
            ),
            6,
        ).alias("leg_km"),
    ).filter(F.col("leg_km").isNotNull())
    per_user = legs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum("leg_km").alias("total_km"),
        F.avg("leg_km").alias("mean_km"),
        F.avg((F.col("leg_km") > 5000.0).cast("double")).alias("long_share"),
    )
    return per_user.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_legs").alias("n_legs"),
        _R4(F.avg("total_km"), "avg_total_km"),
        _R4(F.avg("mean_km"), "avg_leg_km"),
        _R4(F.avg("long_share"), "long_leg_share"),
    )


GEO_USER_TRAVEL_SQL = f"""
WITH pings AS (
  SELECT user_id, ts, event_id,
         {_lat_sql('event_id')} AS lat,
         {_lon_sql('event_id')} AS lon
  FROM events
), legs AS (
  SELECT user_id,
         round({_haversine_sql(
             'lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lat', 'lon')}, 6) AS leg_km
  FROM pings
), lf AS (SELECT * FROM legs WHERE leg_km IS NOT NULL),
per_user AS (
  SELECT user_id, count(*) AS n_legs, sum(leg_km) AS total_km,
         avg(leg_km) AS mean_km,
         avg(CASE WHEN leg_km > 5000.0 THEN 1.0 ELSE 0.0 END) AS long_share
  FROM lf GROUP BY user_id
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       CAST(sum(n_legs) AS BIGINT) AS n_legs,
       round(avg(total_km), 4) AS avg_total_km,
       round(avg(mean_km), 4) AS avg_leg_km,
       round(avg(long_share), 4) AS long_leg_share
FROM per_user GROUP BY 1
"""

QUERIES["geo_user_travel_profile"] = (geo_user_travel_profile, GEO_USER_TRAVEL_SQL)


# --- round-9 widening II: flows, stays, hotspot statistics ---------

_OD_CELL_MILLI = 30000  # 30° cells -> 4 lat bands x 12 lon bands = 48 cells


def geo_od_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix: consecutive pings per user
    chain into directed legs (the travel-profile lag machinery),
    each endpoint buckets into a 30-degree grid cell by pure integer
    division on millidegrees (codegen, cross-engine exact), and
    flows aggregate per (origin_cell, dest_cell) with volume,
    distinct movers and mean leg length.

    Scale: the lag window is PARTITIONED by user (skew-bounded by
    the busiest user, never a global sort) and the flow aggregate's
    domain is bounded at 48x48 cells regardless of N, so the final
    rollup can never skew or overflow a partition. The gov-mobility
    staple: commuting / migration flow tables between regions.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id")
    pings = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * _LAT_MULT) % 120000).alias("lat_m"),
        ((F.col("event_id") * _LON_MULT) % 360000).alias("lon_m"),
        lat_col(F.col("event_id")).alias("lat"),
        lon_col(F.col("event_id")).alias("lon"),
    ).withColumn(
        "cell",
        F.expr(f"lat_m div {_OD_CELL_MILLI}") * 12
        + F.expr(f"lon_m div {_OD_CELL_MILLI}"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pings.select(
        "user_id",
        F.lag("cell").over(w).alias("origin_cell"),
        F.col("cell").alias("dest_cell"),
        F.round(
            haversine_km(
                F.lag("lat").over(w),
                F.lag("lon").over(w),
                F.col("lat"),
                F.col("lon"),
            ),
            6,
        ).alias("leg_km"),
    ).filter(F.col("origin_cell").isNotNull())
    return legs.groupBy("origin_cell", "dest_cell").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.countDistinct("user_id").alias("n_users"),
        # sum, not avg: a mean of 6-dp values lands on half-grid
        # decimal ties (avg of 2 is a 5e-7 grid point) where the
        # engines' rounding modes diverge; a SUM of 6-dp values sits
        # on the 1e-6 grid itself, so re-rounding to 6 dp is exact.
        F.round(F.sum("leg_km"), 6).alias("total_km"),
    )


GEO_OD_FLOW_SQL = f"""
WITH pings AS (
  SELECT user_id, ts, event_id,
         ((event_id * {_LAT_MULT}) % 120000) // {_OD_CELL_MILLI} * 12
           + ((event_id * {_LON_MULT}) % 360000) // {_OD_CELL_MILLI} AS cell,
         {_lat_sql('event_id')} AS lat,
         {_lon_sql('event_id')} AS lon
  FROM events
), legs AS (
  SELECT user_id,
         lag(cell) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS origin_cell,
         cell AS dest_cell,
         round({_haversine_sql(
             'lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lat', 'lon')}, 6) AS leg_km
  FROM pings
)
SELECT origin_cell, dest_cell, count(*) AS n_legs,
       count(DISTINCT user_id) AS n_users,
       round(sum(leg_km), 6) AS total_km
FROM legs WHERE origin_cell IS NOT NULL
GROUP BY 1, 2
"""

QUERIES["geo_od_flow_matrix"] = (geo_od_flow_matrix, GEO_OD_FLOW_SQL)


_STAY_KM = 2000.0  # legs under this chain pings into one "stay" episode


def geo_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point (dwell) detection: within each user's ping stream,
    a leg shorter than _STAY_KM keeps the user in the same episode;
    a longer (or first) leg opens a new one. Episodes are carved by
    the classic gaps-and-islands cumulative sum over a PARTITIONED
    window -- integer arithmetic only, so the segmentation is
    engine-exact -- and episodes spanning >= 2 pings are stays.
    Readout: per-cohort census of stay counts, longest stay and the
    share of pings spent dwelling.

    Scale: both window passes (lag + running sum) share one
    partitioned sort per user; the two aggregates reduce to
    user then cohort grain. No global sort, no unbounded state.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id")
    pings = ev.select(
        "user_id",
        "ts",
        "event_id",
        lat_col(F.col("event_id")).alias("lat"),
        lon_col(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pings.select(
        "user_id",
        "ts",
        "event_id",
        F.round(
            haversine_km(
                F.lag("lat").over(w),
                F.lag("lon").over(w),
                F.col("lat"),
                F.col("lon"),
            ),
            6,
        ).alias("leg_km"),
    ).withColumn(
        "is_break",
        (F.col("leg_km").isNull() | (F.col("leg_km") > _STAY_KM)).cast("int"),
    )
    episodes = legs.withColumn(
        "episode",
        F.sum("is_break").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ep_sizes = episodes.groupBy("user_id", "episode").agg(
        F.count(F.lit(1)).alias("n_pings")
    )
    per_user = ep_sizes.groupBy("user_id").agg(
        F.sum("n_pings").alias("total_pings"),
        F.sum((F.col("n_pings") >= 2).cast("int")).alias("n_stays"),
        F.sum(
            F.when(F.col("n_pings") >= 2, F.col("n_pings")).otherwise(F.lit(0))
        ).alias("stay_pings"),
        F.max(F.when(F.col("n_pings") >= 2, F.col("n_pings"))).alias(
            "max_stay"
        ),
    )
    return per_user.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_stays").alias("n_stays"),
        _R4(F.avg("max_stay"), "avg_max_stay"),
        F.round(F.sum("stay_pings") / F.sum("total_pings"), 6).alias(
            "dwell_share"
        ),
    )


GEO_STAY_POINTS_SQL = f"""
WITH pings AS (
  SELECT user_id, ts, event_id,
         {_lat_sql('event_id')} AS lat, {_lon_sql('event_id')} AS lon
  FROM events
), legs AS (
  SELECT user_id, ts, event_id,
         round({_haversine_sql(
             'lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lat', 'lon')}, 6) AS leg_km
  FROM pings
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN leg_km IS NULL OR leg_km > {_STAY_KM} THEN 1 ELSE 0 END AS is_break
  FROM legs
), episodes AS (
  SELECT user_id,
         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS episode
  FROM flagged
), ep_sizes AS (
  SELECT user_id, episode, count(*) AS n_pings
  FROM episodes GROUP BY 1, 2
), per_user AS (
  SELECT user_id,
         sum(n_pings) AS total_pings,
         sum(CASE WHEN n_pings >= 2 THEN 1 ELSE 0 END) AS n_stays,
         sum(CASE WHEN n_pings >= 2 THEN n_pings ELSE 0 END) AS stay_pings,
         max(CASE WHEN n_pings >= 2 THEN n_pings END) AS max_stay
  FROM ep_sizes GROUP BY 1
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       CAST(sum(n_stays) AS BIGINT) AS n_stays,
       round(avg(max_stay), 4) AS avg_max_stay,
       round(CAST(sum(stay_pings) AS DOUBLE) / sum(total_pings), 6) AS dwell_share
FROM per_user GROUP BY 1
"""

QUERIES["geo_stay_points"] = (geo_stay_points, GEO_STAY_POINTS_SQL)


_GI_DOMAIN = 120 * 360  # 1-degree cells over the +/-60 lat band
_GI_TOPK = 15


def geo_gi_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hot-spot statistic over 1-degree grid cells
    (rook+diagonal 3x3 neighborhood, self included, binary weights
    W = 9): z_i = (S_i - 9*mu) / (sd * sqrt((9*D - 81) / (D - 1)))
    with mu/sd the population moments over the FULL D = 43200-cell
    domain (empty cells contribute zero to both sums, so the
    moments come straight off the occupied-cell aggregate -- no
    dense grid is ever materialized).

    Distribution strategy: each occupied cell SCATTERS its count to
    its nine neighborhood centers (explode of a 9-literal offset
    array -- longitude wraps, latitude clamps), the scatter stream
    re-aggregates per center, and only centers that are themselves
    occupied survive the final broadcastable join. Candidates scale
    with occupied cells, never with the domain or N^2; moments ride
    in on a one-row broadcast cross join. Scores quantize to 6 dp
    BEFORE the two-phase top-k (quantize-then-rank contract).
    """
    cust = Catalog(spark, sf_dir).customer.select(
        ((F.col("c_custkey") * _LAT_MULT) % 120000).alias("lat_m"),
        ((F.col("c_custkey") * _LON_MULT) % 360000).alias("lon_m"),
    )
    cells = cust.select(
        F.expr("lat_m div 1000").alias("cell_lat"),
        F.expr("lon_m div 1000").alias("cell_lon"),
    ).groupBy("cell_lat", "cell_lon").agg(F.count(F.lit(1)).alias("n_points"))

    stats = cells.agg(
        (F.sum("n_points") / F.lit(float(_GI_DOMAIN))).alias("mu"),
        F.sqrt(
            F.sum(F.col("n_points") * F.col("n_points"))
            / F.lit(float(_GI_DOMAIN))
            - F.pow(F.sum("n_points") / F.lit(float(_GI_DOMAIN)), 2)
        ).alias("sd"),
    )

    offsets = F.expr(
        "array("
        + ", ".join(
            f"struct({dlat} as dlat, {dlon} as dlon)"
            for dlat in (-1, 0, 1)
            for dlon in (-1, 0, 1)
        )
        + ")"
    )
    scatter = (
        cells.select("cell_lat", "cell_lon", "n_points", F.explode(offsets).alias("o"))
        .select(
            (F.col("cell_lat") + F.col("o.dlat")).alias("ctr_lat"),
            ((F.col("cell_lon") + F.col("o.dlon") + 360) % 360).alias("ctr_lon"),
            "n_points",
        )
        .filter((F.col("ctr_lat") >= 0) & (F.col("ctr_lat") <= 119))
        .groupBy("ctr_lat", "ctr_lon")
        .agg(F.sum("n_points").alias("nbr_points"))
    )

    scored = (
        cells.join(
            scatter,
            (cells.cell_lat == scatter.ctr_lat)
            & (cells.cell_lon == scatter.ctr_lon),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "cell_lat",
            "cell_lon",
            "n_points",
            "nbr_points",
            F.round(
                (F.col("nbr_points") - 9.0 * F.col("mu"))
                / (
                    F.col("sd")
                    * F.sqrt(
                        F.lit(
                            (9.0 * _GI_DOMAIN - 81.0) / (_GI_DOMAIN - 1.0)
                        )
                    )
                ),
                6,
            ).alias("gi_z"),
        )
    )
    return scored.orderBy(
        F.desc("gi_z"), F.asc("cell_lat"), F.asc("cell_lon")
    ).limit(_GI_TOPK)


GEO_GI_HOTSPOTS_SQL = f"""
WITH cells AS (
  SELECT ((c_custkey * {_LAT_MULT}) % 120000) // 1000 AS cell_lat,
         ((c_custkey * {_LON_MULT}) % 360000) // 1000 AS cell_lon,
         count(*) AS n_points
  FROM customer GROUP BY 1, 2
), stats AS (
  SELECT CAST(sum(n_points) AS DOUBLE) / {_GI_DOMAIN} AS mu,
         sqrt(CAST(sum(n_points * n_points) AS DOUBLE) / {_GI_DOMAIN}
              - pow(CAST(sum(n_points) AS DOUBLE) / {_GI_DOMAIN}, 2)) AS sd
  FROM cells
), scatter AS (
  SELECT cell_lat + dlat AS ctr_lat,
         (cell_lon + dlon + 360) % 360 AS ctr_lon,
         n_points
  FROM cells
  CROSS JOIN (VALUES (-1), (0), (1)) AS ol(dlat)
  CROSS JOIN (VALUES (-1), (0), (1)) AS oo(dlon)
  WHERE cell_lat + dlat BETWEEN 0 AND 119
), nbr AS (
  SELECT ctr_lat, ctr_lon, CAST(sum(n_points) AS BIGINT) AS nbr_points
  FROM scatter GROUP BY 1, 2
)
SELECT c.cell_lat, c.cell_lon, c.n_points, n.nbr_points,
       round((n.nbr_points - 9.0 * s.mu)
             / (s.sd * sqrt((9.0 * {_GI_DOMAIN} - 81.0) / ({_GI_DOMAIN} - 1.0))),
             6) AS gi_z
FROM cells c
JOIN nbr n ON n.ctr_lat = c.cell_lat AND n.ctr_lon = c.cell_lon
CROSS JOIN stats s
ORDER BY gi_z DESC, c.cell_lat ASC, c.cell_lon ASC
LIMIT {_GI_TOPK}
"""

QUERIES["geo_gi_hotspots"] = (geo_gi_hotspots, GEO_GI_HOTSPOTS_SQL)


def geo_trip_straightness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trip straightness index per user: net displacement (first to
    last ping, by time) over total path length -- 1.0 is a straight
    line, near 0 is wandering. First/last positions come off the
    SAME partitioned sort as the leg lags (row_number ascending +
    partition count), folded to user grain by conditional
    aggregation; no second sort, no self-join.

    Scale: one partitioned window pass, two grouped reductions
    (user, then cohort of 10). Users with a single ping carry no
    path and are excluded before the ratio.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id")
    pings = ev.select(
        "user_id",
        "ts",
        "event_id",
        lat_col(F.col("event_id")).alias("lat"),
        lon_col(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    marked = pings.select(
        "user_id",
        "lat",
        "lon",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_pings"),
        F.round(
            haversine_km(
                F.lag("lat").over(w),
                F.lag("lon").over(w),
                F.col("lat"),
                F.col("lon"),
            ),
            6,
        ).alias("leg_km"),
    )
    per_user = (
        marked.groupBy("user_id")
        .agg(
            F.max("n_pings").alias("n_pings"),
            F.sum("leg_km").alias("total_km"),
            F.max(F.when(F.col("rn") == 1, F.col("lat"))).alias("lat0"),
            F.max(F.when(F.col("rn") == 1, F.col("lon"))).alias("lon0"),
            F.max(
                F.when(F.col("rn") == F.col("n_pings"), F.col("lat"))
            ).alias("lat1"),
            F.max(
                F.when(F.col("rn") == F.col("n_pings"), F.col("lon"))
            ).alias("lon1"),
        )
        .filter(F.col("n_pings") >= 2)
        .select(
            "user_id",
            "total_km",
            F.round(
                haversine_km(
                    F.col("lat0"), F.col("lon0"), F.col("lat1"), F.col("lon1")
                ),
                6,
            ).alias("net_km"),
        )
    )
    return per_user.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n_users"),
        _R4(F.avg("net_km"), "avg_net_km"),
        _R4(F.avg("total_km"), "avg_total_km"),
        _R4(
            F.avg(
                F.when(
                    F.col("total_km") > 0.0,
                    F.col("net_km") / F.col("total_km"),
                )
            ),
            "avg_straightness",
        ),
    )


GEO_TRIP_STRAIGHTNESS_SQL = f"""
WITH pings AS (
  SELECT user_id, ts, event_id,
         {_lat_sql('event_id')} AS lat, {_lon_sql('event_id')} AS lon
  FROM events
), marked AS (
  SELECT user_id, lat, lon,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_pings,
         round({_haversine_sql(
             'lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id)',
             'lat', 'lon')}, 6) AS leg_km
  FROM pings
), per_user_raw AS (
  SELECT user_id,
         max(n_pings) AS n_pings,
         sum(leg_km) AS total_km,
         max(CASE WHEN rn = 1 THEN lat END) AS lat0,
         max(CASE WHEN rn = 1 THEN lon END) AS lon0,
         max(CASE WHEN rn = n_pings THEN lat END) AS lat1,
         max(CASE WHEN rn = n_pings THEN lon END) AS lon1
  FROM marked GROUP BY 1
), per_user AS (
  SELECT user_id, total_km,
         round({_haversine_sql('lat0', 'lon0', 'lat1', 'lon1')}, 6) AS net_km
  FROM per_user_raw WHERE n_pings >= 2
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       round(avg(net_km), 4) AS avg_net_km,
       round(avg(total_km), 4) AS avg_total_km,
       round(avg(CASE WHEN total_km > 0.0 THEN net_km / total_km END), 4)
         AS avg_straightness
FROM per_user GROUP BY 1
"""

QUERIES["geo_trip_straightness"] = (geo_trip_straightness, GEO_TRIP_STRAIGHTNESS_SQL)


def geo_home_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Home-location detection — the standard mobility-analytics
    anchor (most pings wins): per user, the modal 1° grid cell
    (deterministic tie-break on cell coordinates) and its ping
    share ("home dominance"), rolled to a per-cohort census —
    users, distinct home cells, mean/max dominance. Everything a
    downstream privacy gate (k-anonymity over home cells) or travel
    model consumes.

    One grouped count per (user, cell) — map-side combined on the
    uniform user key — then a per-user struct-min argmax (no
    window), then a bounded cohort rollup. Grid math is exact
    integer-derived floors (the geo family's portable contract).
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id").select(
        "user_id",
        F.floor(lat_col(F.col("event_id"))).alias("clat"),
        F.floor(lon_col(F.col("event_id"))).alias("clon"),
    )
    per_cell = ev.groupBy("user_id", "clat", "clon").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_user = (
        per_cell.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("negc"),
                    F.col("clat").alias("hlat"),
                    F.col("clon").alias("hlon"),
                )
            ).alias("h"),
            F.sum("cnt").alias("n_pings"),
        )
        .select(
            "user_id",
            F.col("h.hlat").alias("home_lat"),
            F.col("h.hlon").alias("home_lon"),
            (-F.col("h.negc") / F.col("n_pings")).alias("home_share"),
        )
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.countDistinct("home_lat", "home_lon").alias("n_home_cells"),
            _R4(F.avg("home_share"), "mean_home_share"),
            _R4(F.max("home_share"), "max_home_share"),
        )
        .orderBy("cohort")
    )


GEO_HOME_SQL = f"""
WITH ev AS (
  SELECT user_id,
         floor(((event_id * {_LAT_MULT}) % 120000) / 1000.0 - 60.0) AS clat,
         floor(((event_id * {_LON_MULT}) % 360000) / 1000.0 - 180.0) AS clon
  FROM events
), per_cell AS (
  SELECT user_id, clat, clon, count(*) AS cnt FROM ev GROUP BY 1, 2, 3
), per_user AS (
  SELECT user_id,
         min(struct_pack(negc := -cnt, hlat := clat, hlon := clon)) AS h,
         sum(cnt) AS n_pings
  FROM per_cell GROUP BY user_id
), homed AS (
  SELECT user_id, h.hlat AS home_lat, h.hlon AS home_lon,
         -h.negc / CAST(n_pings AS DOUBLE) AS home_share
  FROM per_user
)
SELECT user_id % 10 AS cohort,
       count(*) AS n_users,
       count(DISTINCT (home_lat, home_lon)) AS n_home_cells,
       round(avg(home_share), 4) AS mean_home_share,
       round(max(home_share), 4) AS max_home_share
FROM homed
GROUP BY 1
ORDER BY 1
"""

QUERIES["geo_home_location"] = (geo_home_location, GEO_HOME_SQL)


def geo_home_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over detected home locations — the privacy
    gate a mobility release runs before publishing anything keyed by
    home cell (composes ``geo_home_location`` with the §J
    k-anonymity discipline): per 1° home cell, the user count; any
    cell under k = re-identification risk. Census: total cells,
    risky cells, users at risk, at-risk share — the release-blocking
    numbers.

    Same bounded shapes as its parents: (user, cell) count →
    per-user argmax → per-cell count → 1-row census (plus the risky
    top cells for triage, bounded top-10 by ascending count).
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id").select(
        "user_id",
        F.floor(lat_col(F.col("event_id"))).alias("clat"),
        F.floor(lon_col(F.col("event_id"))).alias("clon"),
    )
    per_cell = ev.groupBy("user_id", "clat", "clon").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    homes = (
        per_cell.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("negc"),
                    F.col("clat").alias("hlat"),
                    F.col("clon").alias("hlon"),
                )
            ).alias("h")
        )
        .select("user_id", F.col("h.hlat").alias("hlat"), F.col("h.hlon").alias("hlon"))
    )
    cells = homes.groupBy("hlat", "hlon").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("n_users") < K_ANON).cast("long")).alias("n_risky_cells"),
        F.sum(
            F.when(F.col("n_users") < K_ANON, F.col("n_users")).otherwise(0)
        ).alias("n_users_at_risk"),
        F.sum("n_users").alias("n_users_total"),
        F.lit(K_ANON).alias("k"),
    ).select(
        "n_cells",
        "n_risky_cells",
        "n_users_at_risk",
        "n_users_total",
        "k",
        _R4(
            F.col("n_users_at_risk") / F.col("n_users_total"), "at_risk_share"
        ),
    )


GEO_HOME_KANON_SQL = f"""
WITH ev AS (
  SELECT user_id,
         floor(((event_id * {_LAT_MULT}) % 120000) / 1000.0 - 60.0) AS clat,
         floor(((event_id * {_LON_MULT}) % 360000) / 1000.0 - 180.0) AS clon
  FROM events
), per_cell AS (
  SELECT user_id, clat, clon, count(*) AS cnt FROM ev GROUP BY 1, 2, 3
), homes AS (
  SELECT user_id,
         min(struct_pack(negc := -cnt, hlat := clat, hlon := clon)) AS h
  FROM per_cell GROUP BY user_id
), cells AS (
  SELECT h.hlat, h.hlon, count(*) AS n_users FROM homes GROUP BY 1, 2
)
SELECT count(*) AS n_cells,
       CAST(sum(CASE WHEN n_users < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_cells,
       CAST(sum(CASE WHEN n_users < {K_ANON} THEN n_users ELSE 0 END) AS BIGINT) AS n_users_at_risk,
       CAST(sum(n_users) AS BIGINT) AS n_users_total,
       {K_ANON} AS k,
       round(sum(CASE WHEN n_users < {K_ANON} THEN n_users ELSE 0 END)
             / CAST(sum(n_users) AS DOUBLE), 4) AS at_risk_share
FROM cells
"""

QUERIES["geo_home_k_anonymity"] = (geo_home_k_anonymity, GEO_HOME_KANON_SQL)


def geo_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius of gyration per user (González et al. 2008, the
    canonical human-mobility summary): r_g = √(mean squared
    haversine distance from each ping to the user's centroid),
    rolled up to a per-cohort census (user_id % 10) — the one
    number that separates commuters from travelers in a mobility
    release, computed before any such release ships.

    One shuffle total: the per-user centroid is a window average
    over the same user_id partition the squared-distance pass
    needs, so no join materializes; per-ping haversine quantizes
    at 6 dp (the module's cross-engine float discipline) and the
    cohort rollup is a bounded 10-row readout.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id").select(
        "user_id",
        lat_col(F.col("event_id")).alias("lat"),
        lon_col(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id")
    d6 = F.round(
        haversine_km(
            F.col("lat"),
            F.col("lon"),
            F.avg("lat").over(w),
            F.avg("lon").over(w),
        ),
        6,
    )
    per_user = (
        ev.select("user_id", (d6 * d6).alias("d2"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.round(F.sqrt(F.avg("d2")), 6).alias("rg"),
        )
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_pings").alias("n_pings"),
            _R4(F.avg("rg"), "avg_rg_km"),
            _R4(F.max("rg"), "max_rg_km"),
        )
        .orderBy("cohort")
    )


GEO_RGYRATION_SQL = f"""
WITH pings AS (
  SELECT user_id,
         {_lat_sql('event_id')} AS lat,
         {_lon_sql('event_id')} AS lon
  FROM events
), centered AS (
  SELECT user_id,
         round({_haversine_sql(
             'lat', 'lon',
             'avg(lat) OVER (PARTITION BY user_id)',
             'avg(lon) OVER (PARTITION BY user_id)')}, 6) AS d
  FROM pings
), per_user AS (
  SELECT user_id, count(*) AS n_pings,
         round(sqrt(avg(d * d)), 6) AS rg
  FROM centered GROUP BY user_id
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       CAST(sum(n_pings) AS BIGINT) AS n_pings,
       round(avg(rg), 4) AS avg_rg_km,
       round(max(rg), 4) AS max_rg_km
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["geo_radius_of_gyration"] = (geo_radius_of_gyration, GEO_RGYRATION_SQL)


def geo_visit_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location-visit entropy per user (Song et al. 2010's
    "uncorrelated entropy" S_unc, next to [[geo_radius_of_gyration]]
    in the mobility-predictability toolkit): Shannon entropy over
    each user's 1° visit-cell frequency distribution, plus the
    ratio to its log2(n_cells) maximum — 1.0 means the user spreads
    visits uniformly, near-0 means one dominant cell. Cohort census
    (user_id % 10) readout.

    Shapes: (user, cell) count → per-user entropy via the
    Σc·log2 c identity (no per-user normalization pass — entropy =
    log2(n) − Σ c·log2 c / n falls out of two sums) → 10-row
    rollup. All bounded-key aggregates, one shuffle each.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id").select(
        "user_id",
        F.floor(lat_col(F.col("event_id"))).alias("clat"),
        F.floor(lon_col(F.col("event_id"))).alias("clon"),
    )
    per_cell = ev.groupBy("user_id", "clat", "clon").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_user = per_cell.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clog"),
    ).select(
        "user_id",
        "n_cells",
        F.round(
            F.log2("n") - F.col("clog") / F.col("n"), 6
        ).alias("entropy"),
    ).select(
        "user_id",
        "n_cells",
        "entropy",
        F.when(F.col("n_cells") == 1, F.lit(1.0))
        .otherwise(F.round(F.col("entropy") / F.log2("n_cells"), 6))
        .alias("ratio"),
    )
    return (
        per_user.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            _R4(F.avg("n_cells"), "avg_n_cells"),
            _R4(F.avg("entropy"), "avg_entropy_bits"),
            _R4(F.avg("ratio"), "avg_uniformity"),
        )
        .orderBy("cohort")
    )


GEO_VISIT_ENTROPY_SQL = f"""
WITH cells AS (
  SELECT user_id,
         floor({_lat_sql('event_id')}) AS clat,
         floor({_lon_sql('event_id')}) AS clon,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3
), per_user AS (
  SELECT user_id, count(*) AS n_cells,
         round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
  FROM cells GROUP BY user_id
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       round(avg(n_cells), 4) AS avg_n_cells,
       round(avg(entropy), 4) AS avg_entropy_bits,
       round(avg(CASE WHEN n_cells = 1 THEN 1.0
                      ELSE round(entropy / log2(n_cells), 6) END), 4) AS avg_uniformity
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["geo_visit_entropy"] = (geo_visit_entropy, GEO_VISIT_ENTROPY_SQL)


_COLOC_CELL_DEG = 10.0  # 0.1° cells: floor(lat × 10)


def geo_colocation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-presence census by hour of day: users sharing a 0.1°
    cell within the same hour — the contact-graph precursor (and
    the precise thing a privacy review must quantify BEFORE anyone
    builds that graph; pairs here means re-identification risk,
    [[geo_home_k_anonymity]]'s moving cousin). Per hour-of-day:
    occupied cell-hours, crowded ones (≥2 users), total co-presence
    pairs ΣC(n,2), and the worst cell's user count.

    Deliberately NO pair materialization: the census reduces
    through (cell, hour) user counts only, so a boilerplate hotspot
    (a stadium cell) contributes one big n, never n² rows — the
    pair EXPANSION, if a downstream contact graph is ever approved,
    would reuse the dedup family's bounded-bucket discipline.
    Integer counts end to end — hash-exact by construction.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.hour("ts").alias("hod"),
        F.to_date("ts").alias("day"),
        F.floor(lat_col(F.col("event_id")) * _COLOC_CELL_DEG).alias("clat"),
        F.floor(lon_col(F.col("event_id")) * _COLOC_CELL_DEG).alias("clon"),
    )
    occ = ev.groupBy("day", "hod", "clat", "clon").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return (
        occ.groupBy("hod")
        .agg(
            F.count(F.lit(1)).alias("n_cell_hours"),
            F.sum((F.col("n_users") >= 2).cast("long")).alias("n_crowded"),
            F.sum(
                F.col("n_users") * (F.col("n_users") - 1) / 2
            ).cast("long").alias("n_copresence_pairs"),
            F.max("n_users").alias("max_cell_users"),
        )
        .orderBy("hod")
    )


GEO_COLOCATION_SQL = f"""
WITH ev AS (
  SELECT user_id,
         extract(hour FROM ts) AS hod,
         CAST(ts AS DATE) AS day,
         floor({_lat_sql('event_id')} * {_COLOC_CELL_DEG}) AS clat,
         floor({_lon_sql('event_id')} * {_COLOC_CELL_DEG}) AS clon
  FROM events
), occ AS (
  SELECT day, hod, clat, clon, count(DISTINCT user_id) AS n_users
  FROM ev GROUP BY 1, 2, 3, 4
)
SELECT hod,
       count(*) AS n_cell_hours,
       CAST(sum(CASE WHEN n_users >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_crowded,
       CAST(sum(n_users * (n_users - 1) / 2) AS BIGINT) AS n_copresence_pairs,
       max(n_users) AS max_cell_users
FROM occ GROUP BY hod ORDER BY hod
"""

QUERIES["geo_colocation_census"] = (geo_colocation_census, GEO_COLOCATION_SQL)
