package graft

import org.apache.spark.sql.functions._

import graft.expr.GeohashEncode
import graft.ext.Geo

/** Geo family specs (round 6): the geohash closed form against a
  * textbook bisection reference + the canonical public test vector,
  * prefix nesting, and the grid-cell radius join / broadcast
  * nearest-site argmin against brute force on seeded fixtures.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook geohash: interval bisection, lon bit first — the
    * independent reference implementation the closed form must match.
    */
  private def bisectGeohash(lat: Double, lon: Double, prec: Int): String = {
    val sb = new StringBuilder
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    var evenBit = true
    var bits = 0
    var ch = 0
    while (sb.length < prec) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch << 1 | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch << 1 | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) {
        sb.append(GeohashEncode.Alphabet.charAt(ch)); bits = 0; ch = 0
      }
    }
    sb.toString
  }

  test("geohash matches the canonical public vector and the bisection " +
      "reference on seeded points") {
    // Wikipedia's worked example: (57.64911, 10.40744) → u4pruydqqvj
    assert(GeohashEncode.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val p = 1 + rnd.nextInt(12)
      assert(GeohashEncode.encode(lat, lon, p) == bisectGeohash(lat, lon, p),
        s"mismatch at ($lat, $lon, $p)")
    }
    // poles/antimeridian clamp into the last cell, like bisection
    assert(GeohashEncode.encode(90.0, 180.0, 4) ==
      bisectGeohash(89.9999999, 179.9999999, 4))
  }

  test("geohash prefixes nest: encode(p) is a prefix of encode(p+k)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val lat = rnd.nextDouble() * 180.0 - 90.0
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val full = GeohashEncode.encode(lat, lon, 12)
      (1 to 11).foreach { p =>
        assert(GeohashEncode.encode(lat, lon, p) == full.take(p))
      }
    }
  }

  test("geohash expression evaluates through the column path") {
    val df = Seq((57.64911, 10.40744)).toDF("lat", "lon")
    val out = df.select(
      Geo.geohash(df, col("lat"), col("lon"), 5).as("gh")).head()
    assert(out.getString(0) == "u4pru")
  }

  test("hilbert key: bijective on the full order-4 grid, consecutive " +
      "keys are ALWAYS grid neighbors, masks high bits") {
    import graft.expr.HilbertKey
    val n = 16 // order 4
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertKey.xy2d(4, x, y), (x, y))
    val ds = cells.sortBy(_._1)
    // bijection onto [0, 256)
    assert(ds.map(_._1) == (0L until 256L))
    // the defining Hilbert property (Z-order does NOT have it):
    // d and d+1 are 4-neighbors in the grid
    ds.zip(ds.tail).foreach { case ((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=${d2 - 1}: ($x1,$y1) -> ($x2,$y2)")
    }
    // inputs above the order's range mask down (oracle base-case parity)
    assert(HilbertKey.xy2d(4, 16 + 3, 32 + 7) == HilbertKey.xy2d(4, 3, 7))
  }

  test("radius join equals brute force on seeded points (incl. cell " +
      "boundaries)") {
    val rnd = new scala.util.Random(13)
    // cluster points so some pairs actually qualify, and add exact
    // cell-edge points (integer lat/lon) to pin floor-boundary behavior
    val pts = (1 to 260).map { i =>
      val lat = math.floor(rnd.nextDouble() * 12 - 6) +
        (if (i % 5 == 0) 0.0 else rnd.nextDouble())
      val lon = math.floor(rnd.nextDouble() * 12 - 6) +
        (if (i % 7 == 0) 0.0 else rnd.nextDouble())
      (i.toLong, lat, lon)
    }
    val a = pts.filter(_._1 % 2 == 0).toDF("a_id", "lat", "lon")
    val b = pts.filter(_._1 % 2 == 1).toDF("b_id", "lat", "lon")
    val fast = Geo.radiusJoinKm(a, "a_id", b, "b_id", "lat", "lon",
        radiusKm = 75.0, cellDeg = 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b.select(col("b_id"),
        col("lat").as("lat2"), col("lon").as("lon2")))
      .filter(Geo.haversineKm(col("lat"), col("lon"),
        col("lat2"), col("lon2")) < 75.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture produced no qualifying pairs")
    assert(fast == brute,
      s"missed=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
  }

  test("radius join hot-cell salting: planted dense cell splits into " +
      "bounded buckets, pairs emit exactly once") {
    val rnd = new scala.util.Random(31)
    // one dense "city" cell at (10.x, 10.x) with 400 b points, plus
    // sparse background; threshold 100 → the city must split into 4
    // hash buckets while every cold cell keeps salt 0
    val dense = (1 to 400).map(i =>
      (1000L + i, 10.0 + rnd.nextDouble(), 10.0 + rnd.nextDouble()))
    val sparse = (1 to 60).map(i =>
      (2000L + i, rnd.nextDouble() * 8, rnd.nextDouble() * 8))
    val b = (dense ++ sparse).toDF("b_id", "lat", "lon")
    val a = ((1 to 30).map(i =>
      (3000L + i, 10.0 + rnd.nextDouble(), 10.0 + rnd.nextDouble())) ++
      (1 to 20).map(i =>
        (4000L + i, rnd.nextDouble() * 8, rnd.nextDouble() * 8)))
      .toDF("a_id", "lat", "lon")
    val salted = Geo.radiusJoinKm(a, "a_id", b, "b_id", "lat", "lon",
        radiusKm = 50.0, cellDeg = 1.0, hotThreshold = 100L, maxSalt = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val brute = a.crossJoin(b.select(col("b_id"),
        col("lat").as("lat2"), col("lon").as("lon2")))
      .filter(Geo.haversineKm(col("lat"), col("lon"),
        col("lat2"), col("lon2")) < 50.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(salted.size == salted.toSet.size, "a pair was emitted twice")
    assert(salted.toSet == brute,
      s"missed=${(brute -- salted.toSet).take(5)} " +
        s"extra=${(salted.toSet -- brute).take(5)}")
    // the per-(cell, salt) b-row bound: the dense cell's 400 rows must
    // spread over ceil(400/100)=4 buckets, none anywhere near 400
    val (_, home) = Geo.radiusJoinSides(a, "a_id", b, "b_id",
      "lat", "lon", cellDeg = 1.0, hotThreshold = 100L, maxSalt = 8)
    val buckets = home.groupBy("__cy", "__cx", "__salt").count()
      .as[(Long, Long, Long, Long)].collect()
    val city = buckets.filter(r => r._1 == 10L && r._2 == 10L)
    assert(city.map(_._3).toSet == Set(0L, 1L, 2L, 3L),
      s"city cell must use exactly 4 salts, got ${city.toSeq}")
    assert(city.map(_._4).max <= 200L,
      s"a city bucket still holds ${city.map(_._4).max} rows")
    // cold cells stay unsalted — a single salt-0 bucket each
    assert(buckets.filter(r => !(r._1 == 10L && r._2 == 10L))
      .forall(_._3 == 0L))
  }

  test("nearestSite equals brute-force argmin with deterministic ties") {
    val rnd = new scala.util.Random(99)
    val pts = (1 to 120).map(i =>
      (i.toLong, rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 200 - 100))
      .toDF("pid", "lat", "lon")
    val sites = (0 until 9).map(k =>
      (k.toLong, (k % 3) * 30.0 - 30.0, (k / 3) * 60.0 - 60.0))
      .toDF("sk", "slat", "slon")
    val got = Geo.nearestSite(pts, "pid", col("lat"), col("lon"),
        sites, "sk", col("slat"), col("slon"))
      .select("pid", "site_key").as[(Long, Long)].collect().toMap
    val brute = pts.crossJoin(sites)
      .withColumn("d", round(Geo.haversineKm(col("lat"), col("lon"),
        col("slat"), col("slon")), 6))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
          .orderBy(col("d"), col("sk"))))
      .filter(col("rn") === 1)
      .select("pid", "sk").as[(Long, Long)].collect().toMap
    assert(got == brute)
  }
}
