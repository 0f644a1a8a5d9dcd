package graft.ops

import java.util.Base64

/** Deterministic synthetic Active911 wire fixtures (FIXTURES.md §A):
  * alert CSVs wrapped in base64 + JSONP envelopes, exercising every
  * branch of the reference pipeline — happy rows, zero/empty coordinates
  * with good/bad `place` fallback, the tz-abbreviation matrix, duplicate
  * and unmatched responder lines, quoted multi-line fields, and an
  * API-error envelope. Used by the pipeline query entry and the specs.
  */
object Fixtures {

  private def cell(s: String): String =
    if (s.contains(",") || s.contains("\"") || s.contains("\n"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Build one alert CSV row from (column → value); unset columns are
    * empty strings (the export always emits all 24 columns).
    */
  def row(vals: (String, String)*): String = {
    val m = vals.toMap
    Active911.AlertColumns.map(c => cell(m.getOrElse(c, ""))).mkString(",")
  }

  val header: String = Active911.AlertColumns.mkString(",")

  def csv(rows: Seq[String]): String = (header +: rows).mkString("\n")

  def envelope(csvText: String, callback: String = "jQuery1736200000000"): String = {
    val b64 = Base64.getEncoder.encodeToString(csvText.getBytes("UTF-8"))
    s"""$callback({"result":"success","message":"$b64"})"""
  }

  val errorEnvelope: String =
    """jQuery1736200000000({"result":"error","message":"Agency not available"})"""

  /** Agency 101: happy-path rows with responder logs (dup responders →
    * last-wins; unmatched prefixed line → Unknown; non-prefixed lines
    * filtered) across several timezones.
    */
  val agency101Csv: String = csv(Seq(
    row("id" -> "9001", "sent" -> "12/08/2025 18:27:47 MST",
      "description" -> "Structure Fire", "details" -> "Two story residential",
      "place" -> "Station 4", "lat" -> "39.7392", "lon" -> "-104.9903",
      "source" -> "CAD", "units" -> "E4 L2",
      "responses" -> Seq(
        "Got a response of Respond to Nick Ingalls(123456) at 12/08/2025 18:28:20 MST.",
        "Got a response of Unavailable to Jane Roe(222333) at 12/08/2025 18:28:40 EST.",
        "Got a response of Respond to Jane Roe(222333) at 12/08/2025 18:29:05 EST.",
        "Got a response of gibberish that will not match",
        "unrelated log line").mkString("\n")),
    row("id" -> "9002", "sent" -> "12/08/2025 20:15:00 UTC",
      "description" -> "MVA", "details" -> "Highway 36 at exit 12",
      "lat" -> "40.0150", "lon" -> "-105.2705",
      "source" -> "Dispatch", "units" -> "M1",
      "responses" -> ""),
    row("id" -> "9003", "sent" -> "06/15/2025 02:30:00 HDT",
      "description" -> "Medical", "details" -> "Chest pain",
      "lat" -> "21.3069", "lon" -> "-157.8583",
      "source" -> "CAD", "units" -> "A7",
      "responses" -> "Got a response of Respond to Kai Mahoe(777888) at 06/15/2025 02:31:00 HST.")))

  /** Agency 102: coordinate-fallback branches — zero coords with a valid
    * "lat,lon" place (kept, swapped), empty lat/lon (JS ''→0) with place
    * fallback, zero coords with free-text place (dropped), and an
    * unmapped tz abbreviation (CEST → UTC-wall-time fallback parse).
    */
  val agency102Csv: String = csv(Seq(
    row("id" -> "9101", "sent" -> "12/08/2025 08:00:00 CST",
      "description" -> "Grass Fire", "details" -> "North field",
      "place" -> "41.8781,-87.6298", "lat" -> "0", "lon" -> "0",
      "source" -> "CAD", "units" -> "B2", "responses" -> ""),
    row("id" -> "9102", "sent" -> "12/08/2025 09:30:00 CEST",
      "description" -> "Alarm", "details" -> "Panel zone 3",
      "place" -> "48.8566, 2.3522, Paris", "lat" -> "", "lon" -> "",
      "source" -> "Panel", "units" -> "E9", "responses" -> ""),
    row("id" -> "9103", "sent" -> "12/08/2025 10:00:00 PST",
      "description" -> "Dropped Alert", "details" -> "No usable location",
      "place" -> "Corner of 5th and Main", "lat" -> "0", "lon" -> "-122.4",
      "source" -> "CAD", "units" -> "E1", "responses" -> "")))

  /** One envelope row per agency, plus the API-error agency (routed to
    * the error channel, never the feature output).
    */
  val envelopes: Seq[(Int, String)] = Seq(
    101 -> envelope(agency101Csv),
    102 -> envelope(agency102Csv),
    103 -> errorEnvelope)
}
