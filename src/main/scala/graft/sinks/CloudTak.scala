package graft.sinks

import org.apache.spark.sql.DataFrame

/** The submit sink (reference `submit(fc)`, task.ts:238; behavior from
  * `@tak-ps/etl`): POST the FeatureCollection, THEN fail the run if any
  * errors accumulated — delivery of good data strictly precedes the
  * failure signal (reference `task.ts:238-242`, SURVEY.md §2.12 E1).
  *
  * The transport is an injected function (zero-egress harness). Batch
  * shape: one FeatureCollection per micro-batch/partition group; at
  * scale use [[foreachBatchSink]] so each micro-batch posts its own
  * collection and the driver never materializes the full corpus.
  */
class CloudTakSink(post: String => Unit) extends Serializable {

  /** Wrap feature rows into a FeatureCollection JSON document (reference
    * `task.ts:116-119`). Null struct fields are omitted, matching the JS
    * `undefined` serialization of absent `production_time`.
    */
  def toFeatureCollection(features: DataFrame): String =
    features.toJSON.collect()
      .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")

  /** Submit-then-fail: the reference always delivers what it has, and
    * only afterwards throws the accumulated error report (as a JSON
    * array of messages, task.ts:240-242).
    */
  def submit(features: DataFrame, errors: Seq[String]): Unit = {
    post(toFeatureCollection(features))
    if (errors.nonEmpty) {
      val body = errors.map(m =>
        "\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
      throw new RuntimeException(body)
    }
  }

  /** Streaming form: per-micro-batch FeatureCollection POST (idempotent
    * downstream by feature id — the CoT upsert absorbs at-least-once
    * redelivery, SURVEY.md T5).
    */
  def foreachBatchSink: (DataFrame, Long) => Unit =
    (df, _) => post(toFeatureCollection(df))
}
