package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.{roundz, table}
import graft.expr.GeohashEncode
import graft.ext.{Geo => GeoOps}

/** Geospatial query family (round 6, SURVEY.md §2.14 EXT geo): the
  * consumer-side operators for the reference's geo-coded alert domain
  * (task.ts:172-184 emits latitude/longitude) — nearest-site assignment,
  * radius pair search, density binning, geohash bucketing.
  *
  * The harness tables carry no coordinates, so each query derives
  * deterministic lat/lon from integer keys with overflow-safe hashing
  * (key reduced mod m BEFORE the Knuth multiply — SURVEY §5 convention)
  * and EXACT-integer milli-degrees; both engines compute the same
  * doubles from the same integers in the same operation order, so the
  * only cross-engine float surface is the haversine trig itself,
  * absorbed by `roundz(…, 4)` on km outputs.
  *
  * Longitude stays in [-120, 120): the grid-cell radius join does not
  * wrap cells at ±180 (Geo.radiusJoinKm scaladoc) — a production
  * deployment near the antimeridian pre-rotates longitudes.
  */
object Geo {

  /** Derived alert points: lat ∈ [-60, 60) and lon ∈ [-120, 120) in
    * exact integer milli-degrees, then one division to double.
    */
  private[queries] def points(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .select(col("event_id"),
        (col("event_id") % 120000 * lit(2654435761L) % 120000)
          .as("lat_milli"),
        (col("event_id") % 240000 * lit(2654435761L) % 240000)
          .as("lon_milli"))
      .withColumn("lat", col("lat_milli") / lit(1000.0) - lit(60.0))
      .withColumn("lon", col("lon_milli") / lit(1000.0) - lit(120.0))

  private[queries] val PointsSql =
    """pts AS (
         SELECT event_id,
           event_id % 120000 * 2654435761 % 120000 AS lat_milli,
           event_id % 240000 * 2654435761 % 240000 AS lon_milli
         FROM events),
       p AS (
         SELECT event_id, lat_milli, lon_milli,
           lat_milli / 1000.0 - 60.0 AS lat,
           lon_milli / 1000.0 - 120.0 AS lon
         FROM pts)"""

  /** Concave 8-vertex geofence (lat, lon) — shared between the Spark
    * predicate and the generated oracle SQL (single source of truth).
    */
  private val Fence: Seq[(Double, Double)] = Seq(
    (-40.5, -80.5), (-50.5, 20.5), (10.5, 60.5), (0.5, 10.5),
    (45.5, 30.5), (30.5, -30.5), (40.5, -60.5), (0.5, -90.5))

  /** Clustered synthetic sky for density clustering: 60% of points land
    * ±1° around 7 integer-derived centers, the rest uniform — densities
    * that survive every SF, all arithmetic exact-integer before one
    * division (mirrored literally in [[ClusteredSql]]).
    */
  private[queries] def clusteredPoints(s: SparkSession, d: String): DataFrame = {
    val h1 = col("event_id") % 120000 * lit(2654435761L) % 120000
    val h2 = col("event_id") % 240000 * lit(2654435761L) % 240000
    val cidx = col("event_id") % 7
    val cLat = cidx * 13 % 100 - 50 + lit(0.5)
    val cLon = cidx * 29 % 200 - 100 + lit(0.5)
    val member = col("event_id") % 10 < 6
    table(s, d, "events").select(col("event_id"),
      when(member, cLat + (h1 % 2000 / lit(1000.0) - lit(1.0)))
        .otherwise(h1 / lit(1000.0) - lit(60.0)).as("lat"),
      when(member, cLon + (h2 % 2000 / lit(1000.0) - lit(1.0)))
        .otherwise(h2 / lit(1000.0) - lit(120.0)).as("lon"))
  }

  private[queries] val ClusteredSql =
    """cp AS (
         SELECT event_id,
           CASE WHEN event_id % 10 < 6
             THEN event_id % 7 * 13 % 100 - 50 + 0.5
               + (event_id % 120000 * 2654435761 % 120000 % 2000
                  / 1000.0 - 1.0)
             ELSE event_id % 120000 * 2654435761 % 120000 / 1000.0 - 60.0
           END AS lat,
           CASE WHEN event_id % 10 < 6
             THEN event_id % 7 * 29 % 200 - 100 + 0.5
               + (event_id % 240000 * 2654435761 % 240000 % 2000
                  / 1000.0 - 1.0)
             ELSE event_id % 240000 * 2654435761 % 240000 / 1000.0 - 120.0
           END AS lon
         FROM events)"""

  /** Stations: one per nation row (dimension-sized), integer-exact
    * half-degree coordinates.
    */
  private def stations(s: SparkSession, d: String): DataFrame =
    table(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("st_key"),
        (col("n_nationkey") * 47 % 120 - 60 + lit(0.5)).as("st_lat"),
        (col("n_nationkey") * 83 % 240 - 120 + lit(0.5)).as("st_lon"))

  private val StationsSql =
    """st AS (
         SELECT CAST(n_nationkey AS BIGINT) AS st_key,
           n_nationkey * 47 % 120 - 60 + 0.5 AS st_lat,
           n_nationkey * 83 % 240 - 120 + 0.5 AS st_lon
         FROM nation)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Nearest station per alert point: broadcast the dimension-sized
    // station table, map-side argmin via min(struct) — the fact side
    // never shuffles more than its own id-keyed partial-agg combine.
    // Deterministic tie-break on (round(d, 6), st_key).
    "q220_nearest_station" -> ((s, d) => {
      GeoOps.nearestSite(points(s, d), "event_id",
          col("lat"), col("lon"),
          stations(s, d), "st_key", col("st_lat"), col("st_lon"))
        .select(col("event_id"), col("site_key").as("st_key"),
          roundz(col("dist_km"), 4).as("dist_km4"))
        .orderBy(col("event_id"))
    }),

    // Alert pairs within 50 km — grid-cell candidate join (3×3
    // neighborhood at 1° cells; 1° ≥ 50 km / (111 km × cos 60°) so the
    // neighborhood is complete over this data's |lat| ≤ 60), exact
    // haversine refine. The oracle is the independent all-pairs
    // spelling — exactly the LSH-vs-exact pattern of q36/q39.
    "q221_radius_pairs" -> ((s, d) => {
      val p = points(s, d)
      val a = p.filter(col("event_id") % 4 === 0)
        .select(col("event_id").as("a_id"), col("lat"), col("lon"))
      val b = p.filter(col("event_id") % 4 === 1)
        .select(col("event_id").as("b_id"), col("lat"), col("lon"))
      GeoOps.radiusJoinKm(a, "a_id", b, "b_id", "lat", "lon",
          radiusKm = 50.0, cellDeg = 1.0)
        .select(col("a_id"), col("b_id"),
          roundz(col("dist_km"), 4).as("dist_km4"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Density heatmap: alerts per 1° grid cell with the cell centroid.
    // Centroids divide EXACT integer milli-degree sums (BIGINT on both
    // engines) so the aggregation order can't perturb the float — the
    // only division happens once, after the aggregate.
    "q222_spatial_bin" -> ((s, d) => {
      val p = points(s, d)
      val (cy, cx) = GeoOps.cell(col("lat"), col("lon"), 1.0)
      p.groupBy(cy.as("cell_y"), cx.as("cell_x"))
        .agg(count(lit(1)).as("n"),
          sum(col("lat_milli")).as("slat"),
          sum(col("lon_milli")).as("slon"))
        .select(col("cell_y"), col("cell_x"), col("n"),
          roundz(col("slat").cast("double") / col("n") / lit(1000.0)
            - lit(60.0), 6).as("centroid_lat"),
          roundz(col("slon").cast("double") / col("n") / lit(1000.0)
            - lit(120.0), 6).as("centroid_lon"))
        .orderBy(col("cell_y"), col("cell_x"))
    }),

    // Geofence: point-in-polygon by the crossing-number rule against a
    // concave 8-vertex fence. The polygon is a driver-side literal, so
    // the test is a static codegen'd per-edge sum fused into the scan —
    // no join, no UDF; at 100 TB the fence is a free scan predicate.
    // Oracle SQL is GENERATED from the same vertex list (same ops).
    "q229_geofence" -> ((s, d) => {
      points(s, d)
        .filter(GeoOps.pointInPolygon(col("lat"), col("lon"), Fence))
        .select(col("event_id"))
        .orderBy(col("event_id"))
    }),

    // Grid-density clustering (DBSCAN-style at cell granularity) over a
    // CLUSTERED synthetic sky (60% of points land ±1° around 7 centers,
    // the rest uniform): 2° cells → 3×3 neighborhood counts → core
    // cells by a scale-free threshold (nb·80 > N, exact integers) →
    // connected components over 8-adjacent core cells (the hash-min +
    // pointer-jump ladder of NearDup.connectedComponents). Noise never
    // reaches the component stage — the corpus-sized data is gone after
    // one cell aggregate. Oracle: same build + recursive-CTE closure
    // (the q69 pattern) over the tiny core-cell graph.
    "q230_grid_density_clusters" -> ((s, d) => {
      val p = clusteredPoints(s, d)
      // referenced by both the neighborhood sum and the core join —
      // checkpoint so the corpus aggregate runs once (orientEdges
      // discipline, SURVEY §9)
      val cellsDf = p
        .groupBy(floor(col("lat") / lit(2.0)).as("cy"),
          floor(col("lon") / lit(2.0)).as("cx"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val nTotal = cellsDf.agg(sum(col("n")).as("ntot"))
      val off = array(lit(-1L), lit(0L), lit(1L))
      val nb = cellsDf
        .withColumn("dy", explode(off)).withColumn("dx", explode(off))
        .groupBy((col("cy") + col("dy")).as("cy"),
          (col("cx") + col("dx")).as("cx"))
        .agg(sum(col("n")).as("nb"))
      val cores = cellsDf.join(nb, Seq("cy", "cx"))
        .crossJoin(broadcast(nTotal))
        .filter(col("nb") * 80 > col("ntot"))
        .select(col("cy"), col("cx"), col("n"),
          (col("cy") * 1000 + col("cx")).as("ck"))
        .localCheckpoint(true) // tiny; anchors the CC iteration input
      val edges = cores.select(col("ck"), col("cy"), col("cx"))
        .withColumn("dy", explode(off)).withColumn("dx", explode(off))
        .filter(!(col("dy") === 0 && col("dx") === 0))
        .select(col("ck").as("ka"),
          ((col("cy") + col("dy")) * 1000 + col("cx") + col("dx")).as("kb"))
        .join(cores.select(col("ck").as("kb")), Seq("kb"))
        .filter(col("ka") < col("kb"))
      val comps = graft.ext.NearDup
        .connectedComponents(edges, "ka", "kb")
        .select(col("id").as("ck"), col("comp"))
      cores.join(comps, Seq("ck"), "left")
        .select(col("cy"), col("cx"), col("n"),
          coalesce(col("comp"), col("ck")).as("cluster"))
        .orderBy(col("cy"), col("cx"))
    }),

    // Native geohash bucketing: the codegen'd base-32 encoder on every
    // point (precision 5 ≈ 4.9 km cells), plus the count of the point's
    // 2-char prefix region — the prefix IS the coarser cell, no
    // re-encode. Oracle recomputes the encode arithmetically (generated
    // bit-interleave SQL, identical double quantization).
    "q223_geohash_cells" -> ((s, d) => {
      val p = points(s, d).filter(col("event_id") <= 3000)
      val gh = p.withColumn("gh5",
        GeoOps.geohash(p, col("lat"), col("lon"), 5))
      val regions = gh.groupBy(substring(col("gh5"), 1, 2).as("region"))
        .agg(count(lit(1)).as("region_n"))
      gh.join(regions, substring(col("gh5"), 1, 2) === col("region"))
        .select(col("event_id"), col("gh5"), col("region_n"))
        .orderBy(col("event_id"))
    }),

    // Hilbert space-filling key over integer milli-degree coordinates —
    // the strictly-locality-preserving layout key beside graft_zorder:
    // consecutive keys are ALWAYS grid neighbors (no Z-shaped jumps),
    // so sorting a 100 TB point table by this key makes contiguous key
    // ranges compact spatial blobs (range scan = spatial prune).
    // Per-row native codegen'd expression; the oracle replays the
    // identical integer recurrence level-by-level in a recursive CTE.
    // Order 17 covers lat_milli's [0, 120000).
    "q239_hilbert_key" -> ((s, d) => {
      val p = points(s, d).filter(col("event_id") <= 3000)
      graft.expr.GraftFunctions.register(s)
      p.select(col("event_id"),
          call_function(graft.expr.GraftFunctions.HilbertName,
            col("lat_milli"), col("lon_milli"), lit(17)).as("h"))
        .orderBy(col("event_id"))
    }))

  private def hav(lat1: String, lon1: String,
                  lat2: String, lon2: String): String =
    GeoOps.haversineKmSql(lat1, lon1, lat2, lon2)

  val oracles: Map[String, String] = Map(
    "q220_nearest_station" ->
      s"""WITH $PointsSql, $StationsSql,
          x AS (
            SELECT p.event_id, st.st_key,
              ${hav("p.lat", "p.lon", "st.st_lat", "st.st_lon")} AS d
            FROM p CROSS JOIN st),
          r AS (
            SELECT event_id, st_key, d,
              ROW_NUMBER() OVER (PARTITION BY event_id
                ORDER BY round(d, 6), st_key) AS rn
            FROM x)
          SELECT event_id, st_key, round(d, 4) + 0.0 AS dist_km4
          FROM r WHERE rn = 1 ORDER BY event_id""",
    "q221_radius_pairs" ->
      s"""WITH $PointsSql,
          a AS (SELECT event_id AS a_id, lat, lon FROM p
                WHERE event_id % 4 = 0),
          b AS (SELECT event_id AS b_id, lat, lon FROM p
                WHERE event_id % 4 = 1),
          j AS (
            SELECT a.a_id, b.b_id,
              ${hav("a.lat", "a.lon", "b.lat", "b.lon")} AS d
            FROM a CROSS JOIN b)
          SELECT a_id, b_id, round(d, 4) + 0.0 AS dist_km4
          FROM j WHERE d < 50.0 ORDER BY a_id, b_id""",
    "q222_spatial_bin" ->
      s"""WITH $PointsSql
          SELECT CAST(floor(lat / 1.0) AS BIGINT) AS cell_y,
            CAST(floor(lon / 1.0) AS BIGINT) AS cell_x,
            COUNT(*) AS n,
            round(CAST(SUM(lat_milli) AS DOUBLE) / COUNT(*) / 1000.0
              - 60.0, 6) + 0.0 AS centroid_lat,
            round(CAST(SUM(lon_milli) AS DOUBLE) / COUNT(*) / 1000.0
              - 120.0, 6) + 0.0 AS centroid_lon
          FROM p GROUP BY 1, 2 ORDER BY cell_y, cell_x""",
    "q229_geofence" ->
      s"""WITH $PointsSql
          SELECT event_id FROM p
          WHERE ${GeoOps.pointInPolygonSql("lat", "lon", Fence)}
          ORDER BY event_id""",
    "q230_grid_density_clusters" ->
      s"""WITH RECURSIVE $ClusteredSql,
          cells AS (
            SELECT CAST(floor(lat / 2.0) AS BIGINT) AS cy,
              CAST(floor(lon / 2.0) AS BIGINT) AS cx, COUNT(*) AS n
            FROM cp GROUP BY 1, 2),
          tot AS (SELECT SUM(n) AS ntot FROM cells),
          nb AS (
            SELECT c.cy + dy.d AS cy, c.cx + dx.d AS cx, SUM(c.n) AS nbn
            FROM cells c,
              (VALUES (-1), (0), (1)) dy(d),
              (VALUES (-1), (0), (1)) dx(d)
            GROUP BY 1, 2),
          cores AS (
            SELECT c.cy, c.cx, c.n, c.cy * 1000 + c.cx AS ck
            FROM cells c JOIN nb ON nb.cy = c.cy AND nb.cx = c.cx, tot
            WHERE nb.nbn * 80 > tot.ntot),
          e0 AS (
            SELECT a.ck AS src, b.ck AS dst
            FROM cores a JOIN cores b
              ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
                AND a.ck <> b.ck),
          reach(id, comp) AS (
            SELECT ck, ck FROM cores
            UNION
            SELECT e0.dst, r.comp FROM reach r JOIN e0 ON e0.src = r.id),
          lab AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
          SELECT c.cy, c.cx, CAST(c.n AS BIGINT) AS n, l.comp AS cluster
          FROM cores c JOIN lab l ON l.id = c.ck
          ORDER BY c.cy, c.cx""",
    "q223_geohash_cells" ->
      s"""WITH $PointsSql,
          f AS (SELECT event_id, lat, lon FROM p WHERE event_id <= 3000),
          q AS (
            SELECT event_id,
              ${GeohashEncode.quantLonSql("lon", 5)} AS lonq,
              ${GeohashEncode.quantLatSql("lat", 5)} AS latq
            FROM f),
          c AS (
            SELECT event_id,
              ${GeohashEncode.interleaveSql("lonq", "latq", 5)} AS code
            FROM q),
          g AS (
            SELECT event_id,
              ${GeohashEncode.charsSql("code", 5)} AS gh5
            FROM c),
          r AS (
            SELECT substr(gh5, 1, 2) AS region, COUNT(*) AS region_n
            FROM g GROUP BY 1)
          SELECT g.event_id, g.gh5, r.region_n
          FROM g JOIN r ON substr(g.gh5, 1, 2) = r.region
          ORDER BY g.event_id""",
    "q239_hilbert_key" ->
      s"""WITH RECURSIVE $PointsSql,
          src AS (SELECT event_id, lat_milli, lon_milli FROM pts
                  WHERE event_id <= 3000),
          ${graft.expr.HilbertKey.recursiveSql("hc", "src", "event_id",
             "lat_milli", "lon_milli", 17)}
          SELECT id AS event_id, d AS h FROM hc WHERE s = 0
          ORDER BY event_id""")
}
