package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial operators (SURVEY.md §2.14 EXT, round 6): haversine
  * distance, nearest-neighbor against a small broadcast site table, and
  * a grid-cell-bucketed radius join — the spatial analogue of the LSH
  * band join ([[NearDup.candidatePairs]]): candidates from an equi-join
  * on coarse cells, exact distance refine after.
  *
  * The reference's domain is geo-coded alerts (task.ts:172-184 reads
  * `latitude`/`longitude` and drops zero-coordinate rows); these
  * operators are what a consumer does NEXT with those coordinates —
  * "nearest fire station to each alert", "alert pairs within N km",
  * "alert density heatmap".
  *
  * 100 TB design:
  *   - nearest-site join: the site table is dimension-sized (thousands)
  *     → broadcast; the fact side never shuffles, argmin folds into a
  *     map-side partial aggregate keyed by the fact id.
  *   - radius join: never all-pairs. Points land in `cellDeg`-degree
  *     grid cells; one side expands to its 3×3 cell neighborhood, the
  *     other keeps its home cell, and a plain shuffled equi-join on the
  *     cell key produces candidates — O(points × local density), not
  *     O(n²). Exact haversine refines. Each right-side point has ONE
  *     home cell, so a qualifying pair is emitted exactly once (no
  *     dedup pass).
  *   - skew: urban cells are the hot keys; cap or salt exactly like the
  *     LSH bucket cap (NearDup.scala `maxBucket`) if a city-cell
  *     dominates. AQE skew-join handles the moderate case (ScaleSpec).
  *
  * All float math is spelled identically in the DuckDB oracles
  * (same literal constants, same operation order) so cross-engine
  * results agree bit-for-bit before the defensive `roundz`.
  */
object Geo {

  /** Mean-earth diameter in km (2 × IAU nominal radius 6371.0088).
    * Kept as ONE literal so Spark and the SQL oracles fold the same
    * constant.
    */
  val EarthDiameterKm = 12742.0176

  /** Great-circle distance in km between two (degree) coordinate pairs.
    * Codegen'd built-ins only: sin/cos/asin/sqrt/radians — no UDF.
    * `least(1.0, …)` clamps the asin argument against rounding spill
    * just past 1 for antipodal-ish inputs. Squares are spelled `x*x`
    * (not `pow`) to keep the oracle's libm surface identical.
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val h = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(EarthDiameterKm) * asin(sqrt(least(lit(1.0), h)))
  }

  /** SQL spelling of [[haversineKm]] for the DuckDB oracles — same
    * constants, same operation order.
    */
  def haversineKmSql(lat1: String, lon1: String,
                     lat2: String, lon2: String): String =
    s"""12742.0176 * asin(sqrt(least(1.0,
       |  sin(radians($lat2 - $lat1) / 2) * sin(radians($lat2 - $lat1) / 2)
       |  + cos(radians($lat1)) * cos(radians($lat2))
       |    * sin(radians($lon2 - $lon1) / 2)
       |    * sin(radians($lon2 - $lon1) / 2))))""".stripMargin

  /** Nearest site for every point: broadcast the (dimension-sized) site
    * table, expand each point × site, fold back to the argmin with a
    * map-side `min(struct(...))` partial aggregate — deterministic
    * tie-break on (rounded distance, site key), no window sort.
    *
    * Output: pointId, every `carry` column, `site_key`, `dist_km`
    * (raw double — caller rounds for oracle-facing output).
    */
  def nearestSite(points: DataFrame, pointId: String,
                  pLat: Column, pLon: Column,
                  sites: DataFrame, siteKey: String,
                  sLat: Column, sLon: Column): DataFrame = {
    points
      .crossJoin(broadcast(sites.select(col(siteKey).as("__site"),
        sLat.as("__slat"), sLon.as("__slon"))))
      .withColumn("__d",
        haversineKm(pLat, pLon, col("__slat"), col("__slon")))
      .groupBy(col(pointId))
      .agg(min(struct(round(col("__d"), 6).as("d6"),
        col("__site").as("k"), col("__d").as("d"))).as("__m"))
      .select(col(pointId), col("__m.k").as("site_key"),
        col("__m.d").as("dist_km"))
  }

  /** Native geohash encode (see [[graft.expr.GeohashEncode]]): the
    * prefix-hierarchical spatial bucket key. Registers graft's function
    * table on the session first (idempotent).
    */
  def geohash(df: DataFrame, latCol: Column, lonCol: Column,
              prec: Int): Column = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    call_function(graft.expr.GraftFunctions.GeohashName,
      latCol.cast("double"), lonCol.cast("double"), lit(prec))
  }

  /** Grid cell key for a point: `(floor(lat/cellDeg), floor(lon/cellDeg))`.
    * For `cellDeg = 1.0` this is `floor(lat)`/`floor(lon)` — the oracle
    * spelling.
    */
  def cell(latCol: Column, lonCol: Column, cellDeg: Double): (Column, Column) =
    (floor(latCol / lit(cellDeg)), floor(lonCol / lit(cellDeg)))

  /** Point-in-polygon (geofence) by the crossing-number rule: a ray
    * from the point toward +x (lon) crosses an odd number of polygon
    * edges iff the point is inside. The polygon is a driver-side
    * literal (vertex list, implicitly closed), so the test unrolls into
    * a static codegen'd sum of per-edge `when` terms — no UDF, no join;
    * the fence rides along inside whatever scan predicate it's used in.
    * Degenerate on-boundary points follow the half-open `(y1 > y) !=
    * (y2 > y)` convention (top vertex counted once). The SQL twin
    * [[pointInPolygonSql]] is generated from the SAME vertex list in
    * the same operation order.
    */
  def pointInPolygon(latCol: Column, lonCol: Column,
                     poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, "polygon needs >= 3 vertices")
    val crossings = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      when((lit(y1) > latCol) =!= (lit(y2) > latCol),
        when(lonCol < lit(x1) + (latCol - lit(y1)) *
          lit(x2 - x1) / lit(y2 - y1), 1).otherwise(0)).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** SQL spelling of [[pointInPolygon]] — same vertices, same ops. */
  def pointInPolygonSql(latSql: String, lonSql: String,
                        poly: Seq[(Double, Double)]): String = {
    val terms = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      s"(CASE WHEN ($y1 > $latSql) <> ($y2 > $latSql) THEN " +
        s"(CASE WHEN $lonSql < $x1 + ($latSql - $y1) * " +
        s"(${x2 - x1}) / (${y2 - y1}) THEN 1 ELSE 0 END) ELSE 0 END)"
    }.mkString(" + ")
    s"(($terms) % 2 = 1)"
  }

  /** All (a, b) pairs with haversine(a, b) < radiusKm, via grid-cell
    * candidate generation. PRECONDITION (checked by the caller's data
    * construction, asserted in GeoSpec): `cellDeg` ≥ radiusKm /
    * (111.0 × cos(max |lat|)) so that any qualifying pair differs by at
    * most one cell index per axis — the 3×3 neighborhood is then
    * complete. Longitude cells do NOT wrap at ±180; keep the data (or
    * pre-rotate it) inside an open band, as the queries do.
    *
    * Hot-cell defense (r7): a city-density cell puts all its b rows on
    * ONE join key, so a single task would refine |A-neighborhood|×|cell|
    * pairs. Cells whose b count exceeds `hotThreshold` are sub-split
    * into `ceil(count/hotThreshold)` (≤ `maxSalt`) deterministic hash
    * buckets of the b id (the ops/Salt discipline: no rand(), task
    * retries re-derive the same salt); a-side candidates replicate
    * across exactly that cell's bucket count via the broadcast hot-cell
    * directory, so the replication cost is paid ONLY at hot cells and
    * every (a, b) pair still meets exactly once — b has one (cell,
    * salt) home, and a's expansion hits each (cell, salt) once. Cold
    * cells keep salt 0 and a 1-element sequence — the plan is the old
    * one plus a broadcast lookup. Per-task b rows are bounded by
    * ~hotThreshold (hash-even split), so per-task pair counts are
    * bounded regardless of how dense one city gets.
    *
    * `a`/`b` must carry (`idA`, lat, lon) / (`idB`, lat, lon); returns
    * (idA, idB, dist_km).
    */
  def radiusJoinKm(a: DataFrame, idA: String,
                   b: DataFrame, idB: String,
                   lat: String, lon: String,
                   radiusKm: Double, cellDeg: Double,
                   hotThreshold: Long = 100000L,
                   maxSalt: Int = 32): DataFrame = {
    val (expanded, home) = radiusJoinSides(a, idA, b, idB, lat, lon,
      cellDeg, hotThreshold, maxSalt)
    expanded.join(home, Seq("__cy", "__cx", "__salt"))
      .withColumn("__d", haversineKm(col("__alat"), col("__alon"),
        col("__blat"), col("__blon")))
      .filter(col("__d") < lit(radiusKm))
      .select(col(idA), col(idB), col("__d").as("dist_km"))
  }

  /** The salted join inputs of [[radiusJoinKm]], exposed so GeoSpec can
    * assert the per-(cell, salt) b-row bound on a planted dense cell.
    */
  private[graft] def radiusJoinSides(
      a: DataFrame, idA: String, b: DataFrame, idB: String,
      lat: String, lon: String, cellDeg: Double,
      hotThreshold: Long, maxSalt: Int): (DataFrame, DataFrame) = {
    require(hotThreshold > 0 && maxSalt >= 1)
    val (by, bx) = cell(b(lat), b(lon), cellDeg)
    val bCelled = b.select(col(idB), col(lat).as("__blat"),
      col(lon).as("__blon"), by.as("__cy"), bx.as("__cx"))
    // hot-cell directory: tiny by construction (≤ |b| / hotThreshold
    // rows), broadcast to both sides
    val hot = bCelled.groupBy(col("__cy"), col("__cx"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col("__cy"), col("__cx"),
        least(ceil(col("__n").cast("double") / lit(hotThreshold.toDouble))
          .cast("long"), lit(maxSalt.toLong)).as("__ns"))
    val home = bCelled
      .join(broadcast(hot), Seq("__cy", "__cx"), "left")
      .withColumn("__salt",
        pmod(xxhash64(col(idB)), coalesce(col("__ns"), lit(1L))))
      .drop("__ns")
    val (ay, ax) = cell(a(lat), a(lon), cellDeg)
    val expanded = a
      .select(col(idA), col(lat).as("__alat"), col(lon).as("__alon"),
        ay.as("__cy"), ax.as("__cx"))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col(idA), col("__alat"), col("__alon"),
        (col("__cy") + col("__dy")).as("__cy"),
        (col("__cx") + col("__dx")).as("__cx"))
      .join(broadcast(hot), Seq("__cy", "__cx"), "left")
      .withColumn("__salt", explode(
        sequence(lit(0L), coalesce(col("__ns"), lit(1L)) - 1L)))
      .drop("__ns")
    (expanded, home)
  }
}
