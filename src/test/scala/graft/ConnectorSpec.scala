package graft

import graft.ops.{Active911, Fixtures}
import graft.sinks.CloudTakSink
import graft.sources.{Active911Config, Active911Connector, Active911Transport}

/** Standalone (no \$outer capture) serializable transport for the DSv2
  * tests — the reader factory ships it inside task closures.
  */
private class V2MockTransport(failing: Set[Int] = Set.empty)
    extends Active911Transport {
  def login(u: String, p: String): String =
    """({"result":"success","message":{"jwt":"tok-abc","agencies":[{"id":101},{"id":102},{"id":103}]}})"""
  def fetchAlerts(token: String, agencyId: Int, fromMs: Long, toMs: Long): String = {
    assert(token == "tok-abc" && toMs - fromMs == 6L * 3600 * 1000)
    if (failing.contains(agencyId)) throw new RuntimeException(s"http 500 for $agencyId")
    Fixtures.envelopes.toMap.apply(agencyId)
  }
}

/** Connector ring semantics (reference task.ts:98-152, 238-279): login
  * parse, agency validation throw, window arithmetic, HTTP-error
  * accumulation, and the submit-then-fail ordering of the sink.
  */
class ConnectorSpec extends SparkSpec {

  private val loginResponse =
    """({"result":"success","message":{"jwt":"tok-abc","agencies":[{"id":101},{"id":102},{"id":103}]}})"""

  private class MockTransport(failing: Set[Int] = Set.empty) extends Active911Transport {
    var fetched: List[Int] = Nil
    def login(u: String, p: String): String = loginResponse
    def fetchAlerts(token: String, agencyId: Int, fromMs: Long, toMs: Long): String = {
      assert(token == "tok-abc")
      assert(toMs - fromMs == 6L * 3600 * 1000) // the 6h window, task.ts:134-135
      fetched = agencyId :: fetched
      if (failing.contains(agencyId)) throw new RuntimeException(s"http 500 for $agencyId")
      Fixtures.envelopes.toMap.apply(agencyId)
    }
  }

  test("login parses jwt + agency ids (task.ts:267-278)") {
    val c = new Active911Connector(new MockTransport)
    val (tok, ids) = c.login(Active911Config("u", "p"))
    assert(tok == "tok-abc" && ids == Seq(101, 102, 103))
  }

  test("agency validation: subset ok, inaccessible throws, empty = all (task.ts:105-114)") {
    val c = new Active911Connector(new MockTransport)
    assert(c.validateAgencies(Seq("102"), Seq(101, 102)) == Seq(102))
    assert(c.validateAgencies(Nil, Seq(101, 102)) == Seq(101, 102))
    val e = intercept[IllegalStateException](c.validateAgencies(Seq("999"), Seq(101)))
    assert(e.getMessage.contains("999"))
  }

  test("fetch: per-agency failures accumulate, batch continues (task.ts:150-152)") {
    val t = new MockTransport(failing = Set(102))
    val c = new Active911Connector(t)
    val res = c.fetch("tok-abc", Seq(101, 102, 103), nowMs = 1765200000000L)
    assert(res.envelopes.map(_._1) == Seq(101, 103)) // 102 skipped, not fatal
    assert(res.errors == Seq("http 500 for 102"))
    assert(t.fetched.reverse == List(101, 102, 103))
  }

  test("end-to-end: read → pipeline → submit-then-fail ordering (task.ts:238-242)") {
    val c = new Active911Connector(new MockTransport)
    val (envelopes, fetchErrs) = c.read(spark, Active911Config("u", "p"), 1765200000000L)
    val features = Active911.pipeline(envelopes)
    val apiErrs = Active911.envelopeErrors(envelopes)
      .collect().map(_.getAs[String]("error")).toSeq

    var posted: Option[String] = None
    val sink = new CloudTakSink(body => posted = Some(body))
    val errs = fetchErrs ++ apiErrs
    val thrown = intercept[RuntimeException](sink.submit(features, errs))
    // delivery happened BEFORE the failure signal
    assert(posted.isDefined)
    val body = posted.get
    assert(body.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(body.contains(""""id":"active911-9001""""))
    // absent production_time serialized as omitted (JS undefined), not null
    assert(!body.contains(""""production_time":null"""))
    assert(thrown.getMessage == """["Agency not available"]""")
  }

  test("sink chunks large results into size-capped POSTs, all before the throw") {
    val c = new Active911Connector(new MockTransport)
    val (envelopes, _) = c.read(spark, Active911Config("u", "p"), 1765200000000L)
    val features = Active911.pipeline(envelopes)
    val n = features.count() // 5 fixture features
    var bodies: List[String] = Nil
    val sink = new CloudTakSink(body => bodies ::= body, maxFeaturesPerPost = 2)
    intercept[RuntimeException](sink.submit(features, Seq("boom")))
    // ceil(5/2) = 3 capped collections, every one a valid wrapper
    assert(bodies.length == math.ceil(n / 2.0).toInt)
    assert(bodies.forall(_.startsWith("""{"type":"FeatureCollection","features":[""")))
    // no chunk exceeds the cap; union covers every feature exactly once
    val perChunk = bodies.map(_.sliding("\"type\":\"Feature\"".length)
      .count(_ == "\"type\":\"Feature\""))
    assert(perChunk.forall(_ <= 2) && perChunk.sum == n)
  }

  test("error body JSON-escapes control characters (task.ts:241 JSON.stringify)") {
    val sink = new CloudTakSink(_ => ())
    val msg = "line1\nline2\t\"quoted\" back\\slash " + '\u0001'
    val e = intercept[RuntimeException](
      sink.submit(spark.emptyDataFrame, Seq(msg)))
    assert(e.getMessage ==
      "[\"line1\\nline2\\t\\\"quoted\\\" back\\\\slash \\u0001\"]")
  }

  test("sink with no errors does not throw") {
    val c = new Active911Connector(new MockTransport)
    val (envelopes, _) = c.read(spark, Active911Config("u", "p"), 1765200000000L)
    var posted = 0
    new CloudTakSink(_ => posted += 1).submit(Active911.pipeline(envelopes), Nil)
    assert(posted == 1)
  }

  test("DSv2 read path: one partition per agency, executor-side fetch") {
    graft.sources.Active911DataSource.transport = new V2MockTransport
    try {
      val df = spark.read.format("graft.sources.Active911DataSource")
        .option("username", "u").option("password", "p")
        .option("nowMs", "1765200000000").load()
      // login-validated agencies each become one input partition
      assert(df.rdd.getNumPartitions == 3)
      val rows = df.collect()
      assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(101, 102, 103))
      assert(rows.forall(r => !r.isNullAt(1) && r.isNullAt(2)))
      // the scan output feeds the existing pipeline unchanged
      val feats = Active911.pipeline(df.select("agency_id", "raw"))
      assert(feats.count() > 0)
    } finally graft.sources.Active911DataSource.transport = null
  }

  test("DSv2 read path: agency subset honored, inaccessible throws at planning") {
    graft.sources.Active911DataSource.transport = new V2MockTransport
    try {
      val sub = spark.read.format("graft.sources.Active911DataSource")
        .option("username", "u").option("password", "p")
        .option("agencies", "102").option("nowMs", "1765200000000").load()
      assert(sub.collect().map(_.getInt(0)).toSeq == Seq(102))
      val bad = spark.read.format("graft.sources.Active911DataSource")
        .option("username", "u").option("password", "p")
        .option("agencies", "999").option("nowMs", "1765200000000").load()
      val e = intercept[Exception](bad.collect())
      assert(e.getMessage.contains("999") ||
        e.getCause != null && e.getCause.getMessage.contains("999"))
    } finally graft.sources.Active911DataSource.transport = null
  }

  test("DSv2 read path: transport failure lands as an error ROW, batch continues") {
    graft.sources.Active911DataSource.transport = new V2MockTransport(failing = Set(102))
    try {
      val df = spark.read.format("graft.sources.Active911DataSource")
        .option("username", "u").option("password", "p")
        .option("nowMs", "1765200000000").load()
      val rows = df.collect().sortBy(_.getInt(0))
      assert(rows.length == 3) // 102's failure is data, not a dead batch
      val failed = rows.filter(!_.isNullAt(2))
      assert(failed.map(_.getInt(0)).toSeq == Seq(102))
      assert(failed.head.getString(2).contains("http 500 for 102"))
      assert(rows.filter(_.isNullAt(2)).forall(!_.isNullAt(1)))
    } finally graft.sources.Active911DataSource.transport = null
  }

  test("DSv2 write path: executor-side size-capped FeatureCollection posts") {
    import spark.implicits._
    CloudTakPostCollector.posts.clear()
    graft.sinks.CloudTakDataSource.post = CloudTakPostCollector.record _
    try {
      (1 to 25).map(i => s"""{"id":$i}""").toDF("feature")
        .repartition(1)
        .write.format("graft.sinks.CloudTakDataSource")
        .option("maxFeaturesPerPost", "10").mode("append").save()
      val posts = {
        import scala.jdk.CollectionConverters._
        CloudTakPostCollector.posts.asScala.toVector
      }
      // 25 features through one task at cap 10 → chunks of 10, 10, 5
      assert(posts.length == 3)
      assert(posts.forall(_.startsWith(
        """{"type":"FeatureCollection","features":[""")))
      assert(posts.map("\\{\"id\":".r.findAllIn(_).size) == Vector(10, 10, 5))
    } finally graft.sinks.CloudTakDataSource.post = null
  }

  test("DSv2 write path: every partition posts independently; totals conserve") {
    import spark.implicits._
    CloudTakPostCollector.posts.clear()
    graft.sinks.CloudTakDataSource.post = CloudTakPostCollector.record _
    try {
      (1 to 23).map(i => s"""{"id":$i}""").toDF("feature")
        .repartition(4)
        .write.format("graft.sinks.CloudTakDataSource")
        .option("maxFeaturesPerPost", "3").mode("append").save()
      val posts = {
        import scala.jdk.CollectionConverters._
        CloudTakPostCollector.posts.asScala.toVector
      }
      assert(posts.map("\\{\"id\":".r.findAllIn(_).size).sum == 23)
      // no chunk exceeds the cap; empty partitions post nothing
      assert(posts.forall("\\{\"id\":".r.findAllIn(_).size <= 3))
    } finally graft.sinks.CloudTakDataSource.post = null
  }
}

/** Process-wide post collector for the DSv2 writer specs — the lambda
  * handed to the registry captures only this static reference, so it
  * serializes into executor tasks and collects in one place in
  * local mode.
  */
object CloudTakPostCollector {
  val posts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def record(s: String): Unit = { posts.add(s); () }
}
