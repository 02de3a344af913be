package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.operators.GeoJoin
import graft.sources.ViewingData

/** Geospatial analytics (reference capability: the viewing-data model
  * is geographic on every row — DMA, zip, geo-weighted panels
  * (ingest-ddl.sql GEO_WEIGHTS); Snowflake ships the ST_ / GEOGRAPHY
  * surface this family re-expresses Spark-first). Coordinates are
  * derived deterministically from entity keys (`Geo.synth*Sql` — the
  * same generated-SQL-both-engines discipline as the md5 oracle
  * flavors), so every row here is fully hash-checked: the geometry
  * arithmetic itself (haversine, geohash bit interleave) is what the
  * DuckDB compare proves.
  *
  * Scale shapes: distance scoring and geohash encoding are pure
  * scan-speed projections (zero shuffle before the final small agg);
  * the radius join is `GeoJoin.radiusJoin` — grid-cell equi-join with
  * a ×9 replicated broadcast dim side, never a cross join (the
  * RangeJoin argument, in two dimensions).
  */
object QueriesGeo {

  private val custLat = Geo.synthLatSql("c_custkey", 37)
  private val custLon = Geo.synthLonSql("c_custkey", 73)
  private val suppLat = Geo.synthLatSql("s_suppkey", 91)
  private val suppLon = Geo.synthLonSql("s_suppkey", 57)

  /** Distance-band report: every customer's great-circle distance to
    * one anchor point, folded into 200 km bands — the "audience
    * within X of the transmitter/store" readout. One scan, one tiny
    * aggregate; the haversine runs inside whole-stage codegen. */
  private val geoDistance = Q(
    "q_geo_distance",
    (s, dir) => {
      val hav = Geo.haversineSql(custLat, custLon, "0.0", "0.0")
      ViewingData.table(s, dir, "customer")
        .withColumn("dist_km", expr(hav))
        .withColumn("band", floor(col("dist_km") / 200.0).cast("long"))
        .groupBy("band")
        .agg(
          count(lit(1)).as("n"),
          round(avg("dist_km"), 3).as("avg_km"),
          round(min("dist_km"), 3).as("min_km"),
          round(max("dist_km"), 3).as("max_km"))
    },
    Some(s"""SELECT CAST(floor(d.dist_km / 200.0) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(d.dist_km), 3) AS avg_km,
       ROUND(MIN(d.dist_km), 3) AS min_km,
       ROUND(MAX(d.dist_km), 3) AS max_km
FROM (SELECT ${Geo.haversineSql(custLat, custLon, "0.0", "0.0")} AS dist_km
      FROM customer) d
GROUP BY 1"""))

  /** Radius join: (customer, supplier) pairs within 60 km, via the
    * grid-bucketed `GeoJoin.radiusJoin` (|lat| ≤ 10 in the synthetic
    * domain, so a 1° cell step covers the radius everywhere — the
    * operator `require`s exactly that contract). The DuckDB oracle is
    * the BRUTE-FORCE cross join + filter, so the hash match is also
    * the bucketing-completeness proof on this data (GeoSpec proves it
    * adversarially, including antimeridian wrap, at the operator
    * level). */
  private val geoRadiusJoin = Q(
    "q_geo_radius_join",
    (s, dir) => {
      val cust = ViewingData.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr(custLat).as("clat"), expr(custLon).as("clon"))
      val supp = ViewingData.table(s, dir, "supplier")
        .select(col("s_suppkey"),
          expr(suppLat).as("slat"), expr(suppLon).as("slon"))
      GeoJoin.radiusJoin(
          cust, "clat", "clon", supp, "slat", "slon",
          radiusKm = 60.0, cellDeg = 1.0, maxAbsLat = 10.0)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("dist_km"), 4).as("dist_km"))
    },
    Some(s"""WITH c AS (
  SELECT c_custkey, $custLat AS clat, $custLon AS clon FROM customer),
s AS (
  SELECT s_suppkey, $suppLat AS slat, $suppLon AS slon FROM supplier),
p AS (
  SELECT c_custkey, s_suppkey,
         ${Geo.haversineSql("clat", "clon", "slat", "slon")} AS dist_km
  FROM c CROSS JOIN s)
SELECT c_custkey, s_suppkey, ROUND(dist_km, 4) AS dist_km
FROM p WHERE dist_km <= 60.0"""))

  /** Geohash cell aggregation: customers binned into 3-character
    * geohash cells (the standard base-32 bit-interleave, generated as
    * arithmetic both engines run — GeoSpec pins it against an
    * independent bisection implementation), with per-cell count and
    * centroid. The quantized indices are projected ONCE and the six
    * per-char expressions read them — scan-speed encode, one small
    * agg. */
  private val geohashCells = Q(
    "q_geohash_cells",
    (s, dir) => {
      val (latQ, lonQ) = Geo.geohashQuantizeSql("lat", "lon", 3)
      ViewingData.table(s, dir, "customer")
        .select(expr(custLat).as("lat"), expr(custLon).as("lon"))
        .withColumn("latq", expr(latQ))
        .withColumn("lonq", expr(lonQ))
        .withColumn("geohash", expr(Geo.geohashFromQuantizedSql("latq", "lonq", 3)))
        .groupBy("geohash")
        .agg(
          count(lit(1)).as("n"),
          round(avg("lat"), 6).as("centroid_lat"),
          round(avg("lon"), 6).as("centroid_lon"))
    },
    Some {
      val (latQ, lonQ) = Geo.geohashQuantizeSql("lat", "lon", 3)
      s"""WITH pts AS (
  SELECT $custLat AS lat, $custLon AS lon FROM customer),
q AS (
  SELECT lat, lon, $latQ AS latq, $lonQ AS lonq FROM pts)
SELECT ${Geo.geohashFromQuantizedSql("latq", "lonq", 3)} AS geohash,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(lat), 6) AS centroid_lat,
       ROUND(AVG(lon), 6) AS centroid_lon
FROM q
GROUP BY 1"""
    })

  /** Nearest-neighbor-within-radius: each customer's closest supplier
    * among those ≤ 60 km (the store-assignment / nearest-transmitter
    * readout). Radius-bounded nearest is the form grid bucketing
    * answers COMPLETELY (unbounded nearest needs expanding-ring
    * probes); candidates come from the same `GeoJoin.radiusJoin`,
    * then a per-customer top-1 that Catalyst runs as WindowGroupLimit
    * (map-side partial before the exchange). Ordering uses the
    * ROUNDED distance + supplier id so lattice-symmetric exact ties
    * and last-ulp trig differences both break identically in the two
    * engines. */
  private val geoNearest = Q(
    "q_geo_nearest",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = ViewingData.table(s, dir, "customer")
        .select(col("c_custkey"),
          expr(custLat).as("clat"), expr(custLon).as("clon"))
      val supp = ViewingData.table(s, dir, "supplier")
        .select(col("s_suppkey"),
          expr(suppLat).as("slat"), expr(suppLon).as("slon"))
      val pairs = GeoJoin.radiusJoin(
          cust, "clat", "clon", supp, "slat", "slon",
          radiusKm = 60.0, cellDeg = 1.0, maxAbsLat = 10.0)
        .withColumn("dist_km", round(col("dist_km"), 4))
      val w = Window.partitionBy("c_custkey")
        .orderBy(col("dist_km").asc, col("s_suppkey").asc)
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c_custkey"), col("s_suppkey"), col("dist_km"))
    },
    Some(s"""WITH c AS (
  SELECT c_custkey, $custLat AS clat, $custLon AS clon FROM customer),
s AS (
  SELECT s_suppkey, $suppLat AS slat, $suppLon AS slon FROM supplier),
p AS (
  SELECT c_custkey, s_suppkey,
         ${Geo.haversineSql("clat", "clon", "slat", "slon")} AS raw_km
  FROM c CROSS JOIN s),
r AS (
  SELECT c_custkey, s_suppkey, ROUND(raw_km, 4) AS dist_km,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY ROUND(raw_km, 4) ASC, s_suppkey ASC) AS rn
  FROM p WHERE raw_km <= 60.0)
SELECT c_custkey, s_suppkey, dist_km FROM r WHERE rn = 1"""))

  val all: Seq[Q] = Seq(geoDistance, geoRadiusJoin, geohashCells, geoNearest)
}
