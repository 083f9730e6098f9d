package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Decoder for the reference's CDC wire format (SURVEY.md O25): Kafka
 * message values are JSON-**string-quoted** full-document post-images
 * (`JsonConverter` with `schemas.enable=false`,
 * kafka-mongodb-connect.yaml:11-12), with MongoDB extended-JSON
 * ObjectIds (`{"$oid": "24hex"}`). Consumers in the reference
 * `strconv.Unquote` then unmarshal (inventario/main.go:70-77).
 *
 * Deviation (documented): a malformed payload parses to null columns
 * and is routed to a dead-letter frame by the flows instead of the
 * reference's no-ack poison-retry loop.
 */
object CdcCodec {

  /** Reverse of JSON string-quoting: decode the value as the JSON
    * string literal it is, by wrapping it in a one-field document and
    * letting the JSON parser handle the FULL escape set — `\"`, `\\`,
    * control-char escapes (\n, \t, …) and `\uXXXX` — exactly like the
    * reference's `strconv.Unquote` (inventario/main.go:70-77). The
    * regex first cut of this handled only `\"` and `\\`, silently
    * corrupting payloads where the connector's JsonConverter emitted
    * control or unicode escapes. A value that is not a JSON string
    * decodes to null and dead-letters downstream. */
  def unquote(value: Column): Column =
    from_json(concat(lit("{\"v\":"), value, lit("}")),
      new StructType().add("v", StringType)).getField("v")

  /** Inverse of `unquote` — JSON-string-quote a payload exactly like
    * the connector's JsonConverter (schemas.enable=false) does on the
    * outbox side (O1/O3: every table write publishes its post-image).
    * Implemented with the JSON writer itself: `to_json(struct(v))`
    * emits `{"v":<quoted>}` and the anchored regex strips the fixed
    * wrapper — one JSON serialization per row (a substr(…, length(…))
    * formulation would evaluate to_json twice), and the escape set
    * (\" \\ \n \t \uXXXX …) is exactly what a JSON consumer (and
    * `unquote`) expects. The quoted literal itself contains no raw
    * newlines (they are escaped), so the anchors are unambiguous.
    * Null payloads quote to null. */
  def quote(value: Column): Column =
    when(value.isNotNull,
      regexp_replace(to_json(struct(value.as("v"))),
        "^\\{\"v\":|\\}$", ""))

  private val oid = new StructType().add("$oid", StringType)

  val eventoSchema: StructType = new StructType()
    .add("_id", oid).add("nombre", StringType).add("capacidad", IntegerType)
    .add("categoria", StringType).add("estado", StringType)

  val inventarioSchema: StructType = eventoSchema
    .add("idres", oid).add("email", StringType).add("canres", IntegerType)

  val reservaSchema: StructType = new StructType()
    .add("_id", oid).add("evento", StringType).add("estado", StringType)
    .add("email", StringType).add("cantidad", IntegerType)

  private def parse(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("__doc", from_json(unquote(col("value")), schema))

  /** Raw messages (`value` string column) → typed evento rows. The
    * original payload rides along as a trailing `raw` column so flows
    * can persist undecodable messages verbatim (dead-letter routing). */
  def parseEvento(df: DataFrame): DataFrame =
    parse(df, eventoSchema).select(
      col("__doc._id.$oid").as("id"), col("__doc.nombre").as("nombre"),
      col("__doc.capacidad").as("capacidad"),
      col("__doc.categoria").as("categoria"), col("__doc.estado").as("estado"),
      col("value").as("raw"))

  /** Raw messages → widened inventario rows (reservation echo columns
    * nullable). */
  def parseInventario(df: DataFrame): DataFrame =
    parse(df, inventarioSchema).select(
      col("__doc._id.$oid").as("id"), col("__doc.nombre").as("nombre"),
      col("__doc.capacidad").as("capacidad"),
      col("__doc.categoria").as("categoria"), col("__doc.estado").as("estado"),
      col("__doc.idres.$oid").as("idres"), col("__doc.email").as("email"),
      col("__doc.canres").as("canres"), col("value").as("raw"))

  /** Raw messages → reserva rows. */
  def parseReserva(df: DataFrame): DataFrame =
    parse(df, reservaSchema).select(
      col("__doc._id.$oid").as("id"), col("__doc.evento").as("evento"),
      col("__doc.estado").as("estado"), col("__doc.email").as("email"),
      col("__doc.cantidad").as("cantidad"), col("value").as("raw"))

  /** O26 — message-type discrimination for inventario post-images
    * (inventario/main.go:83-104): creation echoes and seat-return
    * echoes are dropped, admitted reservations insert, organizer
    * cancels cascade. */
  def classifyInventario(canres: Column, estado: Column): Column =
    when(estado === "C", "cascade_cancel")
      .when(estado === "A" && (canres.isNull || canres === 0), "drop_creation_echo")
      .when(estado === "A" && canres > 0, "insert_reservation")
      .when(estado === "A" && canres < 0, "drop_return_echo")
      .otherwise("dead_letter")

  /** Rows from `parsed` that failed to decode (dead-letter routing). */
  def deadLetter(parsed: DataFrame, keyCol: String = "id"): DataFrame =
    parsed.filter(col(keyCol).isNull)
}
