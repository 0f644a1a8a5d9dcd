package graft.ops

import org.apache.spark.sql.types._

/** Schema introspection registry — the counterpart of the reference's
  * `schema(type, flow)` entry point (reference `task.ts:83-96`): callers
  * ask "what does this connector consume / produce" without running it.
  *
  * The reference dispatches on (SchemaType, DataFlowType):
  * Incoming+Input → the `Env` layer config (task.ts:9-16),
  * Incoming+Output → the TypeBox `OutputSchema` (task.ts:18-43, the 24
  * string alert columns), Outgoing → an empty object. Spark-side the
  * same surface is `StructType`s: Env maps to [[Active911Config]]'s
  * fields (names capitalized as the reference spells them), the alert
  * output IS [[Active911.alertSchema]] (shared val, cannot drift), and
  * — beyond the reference — [[FeatureSchema]] pins the GeoJSON Feature
  * row produced by [[Active911.features]], asserted field-for-field
  * against the live plan's output in SchemasSpec.
  */
object Schemas {

  sealed trait SchemaType
  case object Input extends SchemaType
  case object Output extends SchemaType

  sealed trait DataFlow
  case object Incoming extends DataFlow
  case object Outgoing extends DataFlow

  /** Layer config (reference `Env`, task.ts:9-16): credentials, agency
    * list, debug flag. Field names use the reference's spelling; the
    * lower-cased names map 1:1 onto [[Active911Config]] (spec-pinned).
    */
  val EnvSchema: StructType = StructType(Seq(
    StructField("Username", StringType, nullable = false),
    StructField("Password", StringType, nullable = false),
    StructField("Agencies", ArrayType(StructType(Seq(
      StructField("AgencyId", StringType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("DEBUG", BooleanType, nullable = false)))

  /** The 24-string alert export schema — the reference `OutputSchema`
    * (task.ts:18-43). Shared with the parse path, so registry and
    * parser cannot disagree.
    */
  def alertOutputSchema: StructType = Active911.alertSchema

  /** GeoJSON Point Feature row of [[Active911.features]] (reference
    * task.ts:214-231): id, type, properties(callsign/start/links/
    * remarks), geometry(type/[lon, lat]). Nullability mirrors the
    * expression tree (concat/lit are non-null; parseTime and link
    * production_time can be null on unparseable input).
    */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("properties", StructType(Seq(
      StructField("callsign", StringType, nullable = false),
      StructField("start", StringType, nullable = true),
      StructField("links", ArrayType(StructType(Seq(
        StructField("relation", StringType, nullable = true),
        StructField("callsign", StringType, nullable = true),
        StructField("remarks", StringType, nullable = true),
        StructField("production_time", StringType, nullable = true))),
        containsNull = false), nullable = false),
      StructField("remarks", StringType, nullable = false))),
      nullable = false),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("coordinates", ArrayType(DoubleType,
        containsNull = false), nullable = false))), nullable = false)))

  /** The reference's dispatch, verbatim semantics (task.ts:87-96):
    * outgoing flows expose an empty schema; incoming Input is the env
    * config; incoming Output is the alert export.
    */
  def schema(tpe: SchemaType = Input, flow: DataFlow = Incoming): StructType =
    flow match {
      case Incoming => tpe match {
        case Input  => EnvSchema
        case Output => alertOutputSchema
      }
      case Outgoing => StructType(Nil)
    }
}
