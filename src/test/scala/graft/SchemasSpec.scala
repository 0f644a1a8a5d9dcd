package graft

import org.apache.spark.sql.types.StructType

import graft.ops.{Active911, Schemas}
import graft.sources.Active911Config

/** Pins ops.Schemas — the reference `schema(type, flow)` introspection
  * entry point (task.ts:83-96): the dispatch table, the Env↔config
  * field mapping, the shared alert schema, and the FeatureSchema
  * matching the LIVE output of Active911.features field-for-field.
  */
class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("dispatch mirrors the reference: Incoming Input=Env, " +
      "Incoming Output=alerts, Outgoing=empty") {
    assert(Schemas.schema(Schemas.Input, Schemas.Incoming) eq
      Schemas.EnvSchema)
    assert(Schemas.schema(Schemas.Output, Schemas.Incoming) eq
      Active911.alertSchema)
    assert(Schemas.schema(Schemas.Input, Schemas.Outgoing) ==
      StructType(Nil))
    assert(Schemas.schema(Schemas.Output, Schemas.Outgoing) ==
      StructType(Nil))
    // defaults are the reference's defaults (Input, Incoming)
    assert(Schemas.schema() eq Schemas.EnvSchema)
  }

  test("EnvSchema fields map 1:1 onto Active911Config (reference " +
      "spelling vs Scala spelling)") {
    val cfg = Active911Config("u", "p")
    val configFields = cfg.productElementNames.toSeq
    // DEBUG ↔ debug, Username ↔ username, ... — same set, same order
    assert(Schemas.EnvSchema.fields.map(_.name.toLowerCase).toSeq ==
      configFields.map(_.toLowerCase))
    // agencies is the only collection; debug the only boolean
    assert(Schemas.EnvSchema("Agencies").dataType.typeName == "array")
    assert(Schemas.EnvSchema("DEBUG").dataType.typeName == "boolean")
  }

  test("alert output schema IS the parser's schema (shared val — " +
      "cannot drift) with the reference's 24 columns in order") {
    assert(Schemas.alertOutputSchema eq Active911.alertSchema)
    assert(Schemas.alertOutputSchema.fields.length == 24)
    assert(Schemas.alertOutputSchema.fieldNames.take(3).toSeq ==
      Seq("id", "received", "sent"))
    assert(Schemas.alertOutputSchema.fieldNames.last == "responses")
  }

  test("FeatureSchema matches the live Active911.features output " +
      "exactly, including nullability") {
    val fixed = Seq(
      ("77", "Structure Fire", "08/04/2025 20:00:00 EDT",
        "Got a response of res from unit E1 [08/04/2025 20:01:00 EDT]",
        "E1,L2", "CAD", "2nd floor", -71.1, 42.3)
    ).toDF("id", "description", "sent", "responses", "units", "source",
      "details", "f_lon", "f_lat")
    val live = Active911.features(fixed).schema
    assert(live == Schemas.FeatureSchema,
      s"live=${live.treeString}\nregistry=${Schemas.FeatureSchema.treeString}")
  }
}
