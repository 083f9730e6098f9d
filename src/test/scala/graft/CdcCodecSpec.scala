package graft

import graft.streaming.CdcCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parse the exact raw connector payload shapes from FIXTURES.md §3
  * (string-quoted JSON, extended-JSON $oid). */
class CdcCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** JSON-string-quote a document the way the connector's
    * JsonConverter (schemas.enable=false) does. */
  private def q(doc: String): String =
    "\"" + doc.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val eventoDoc =
    """{"_id": {"$oid": "619c1b9190812c00013e29c1"}, "nombre": "Opera Boheme", "capacidad": 20, "categoria": "Opera", "estado": "A"}"""
  private val invReservaDoc =
    """{"_id": {"$oid": "619c1ca490812c00013e29c3"}, "nombre": "Opera Boheme", "capacidad": 17, "categoria": "Opera", "estado": "A", "idres": {"$oid": "619c1dae4b21200001952449"}, "email": "pepediaz@gmail.com", "canres": 3}"""
  private val reservaDoc =
    """{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 3}"""

  test("unquote + parse evento post-image") {
    val df = Seq(q(eventoDoc)).toDF("value")
    val r = CdcCodec.parseEvento(df).collect().head
    assert(r.getString(0) === "619c1b9190812c00013e29c1")
    assert(r.getString(1) === "Opera Boheme")
    assert(r.getInt(2) === 20)
    assert(r.getString(4) === "A")
  }

  test("widened inventario message parses reservation columns") {
    val df = Seq(q(invReservaDoc)).toDF("value")
    val r = CdcCodec.parseInventario(df).collect().head
    assert(r.getInt(2) === 17)
    assert(r.getString(5) === "619c1dae4b21200001952449")
    assert(r.getString(6) === "pepediaz@gmail.com")
    assert(r.getInt(7) === 3)
  }

  test("plain inventario message leaves reservation columns null") {
    val df = Seq(q(eventoDoc)).toDF("value")
    val r = CdcCodec.parseInventario(df).collect().head
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("reserva message parses") {
    val df = Seq(q(reservaDoc)).toDF("value")
    val r = CdcCodec.parseReserva(df).collect().head
    assert(r.getString(0) === "619c1dae4b21200001952449")
    assert(r.getString(1) === "Opera Boheme")
    assert(r.getString(2) === "X")
    assert(r.getInt(4) === 3)
  }

  test("classification matches inventario/main.go dispatch") {
    val cases = Seq(
      (null.asInstanceOf[Integer], "A", "drop_creation_echo"),
      (Integer.valueOf(0), "A", "drop_creation_echo"),
      (Integer.valueOf(3), "A", "insert_reservation"),
      (Integer.valueOf(-1), "A", "drop_return_echo"),
      (Integer.valueOf(3), "C", "cascade_cancel"))
    cases.foreach { case (canres, estado, expected) =>
      val df = Seq((Option(canres).map(_.intValue), estado))
        .toDF("canres", "estado")
        .select(CdcCodec.classifyInventario(col("canres"), col("estado")).as("c"))
      assert(df.collect().head.getString(0) === expected,
        s"canres=$canres estado=$estado")
    }
  }

  test("adversarial: escaped quotes and backslashes inside values survive unquoting") {
    // nombre = say "hi" to c:\tmp — the connector JSON-escapes the doc,
    // then string-quotes the whole message; q() replays both layers
    val doc =
      """{"_id": {"$oid": "619c1b9190812c00013e29c1"}, "nombre": "say \"hi\" to c:\\tmp", "capacidad": 7, "categoria": "Opera", "estado": "A"}"""
    val r = CdcCodec.parseEvento(Seq(q(doc)).toDF("value")).collect().head
    assert(r.getString(1) === """say "hi" to c:\tmp""")
    assert(r.getInt(2) === 7)
  }

  test("adversarial: control-char and unicode escapes decode like strconv.Unquote") {
    // handcrafted WIRE value (not q(), which only escapes \ and "):
    // the connector emits \n for a newline and may \u-escape non-ASCII
    val wire =
      "\"{\\\"_id\\\": {\\\"$oid\\\": \\\"619c1b9190812c00013e29c1\\\"}, " +
        "\\\"nombre\\\": \\\"line1\\\\nCaf\\\\u00e9\\\\tEnd\\\", " +
        "\\\"capacidad\\\": 3, \\\"categoria\\\": \\\"Opera\\\", \\\"estado\\\": \\\"A\\\"}\""
    val r = CdcCodec.parseEvento(Seq(wire).toDF("value")).collect().head
    assert(r.getString(1) === "line1\nCaf\u00e9\tEnd")
    assert(r.getInt(2) === 3)
  }

  test("adversarial: $oid nested in unknown array fields is ignored, known fields parse") {
    val doc =
      """{"_id": {"$oid": "619c1b9190812c00013e29c1"}, "tags": [{"$oid": "ffffffffffffffffffffffff"}, {"$oid": "eeeeeeeeeeeeeeeeeeeeeeee"}], "nombre": "Opera Boheme", "capacidad": 20, "categoria": "Opera", "estado": "A"}"""
    val r = CdcCodec.parseEvento(Seq(q(doc)).toDF("value")).collect().head
    assert(r.getString(0) === "619c1b9190812c00013e29c1") // top-level $oid, not the array's
    assert(r.getString(1) === "Opera Boheme")
    assert(r.getInt(2) === 20)
  }

  test("adversarial: non-string-quoted or truncated values dead-letter instead of corrupting") {
    val cases = Seq(
      """{"nombre": "not quoted at all"}""", // raw JSON, no outer quoting
      "\"{\\\"nombre\\\": \\\"trunc", // truncated mid-escape
      "42", "", "\"\"") // not documents at all
    val parsed = CdcCodec.parseEvento(cases.toDF("value"))
    assert(CdcCodec.deadLetter(parsed).count() === cases.length)
  }

  test("outbox round-trip: quote is the exact inverse of unquote on adversarial payloads") {
    val payloads = Seq(
      eventoDoc,
      """{"nombre": "say \"hi\" to c:\\tmp"}""",
      "line1\nline2\ttabbed",
      "Caf\u00e9 \u2603 unicode",
      "", "plain")
    val df = payloads.toDF("p")
      .select(col("p"), CdcCodec.unquote(CdcCodec.quote(col("p"))).as("rt"))
    assert(df.filter(col("p") =!= col("rt")).count() === 0)
    // null payloads quote to null (never to the string "null")
    val n = Seq[Option[String]](None).toDF("p")
      .select(CdcCodec.quote(col("p")).as("q")).collect().head
    assert(n.isNullAt(0))
    // and a quoted post-image is wire-compatible with the parse path:
    // quote(doc) == what the connector would put on the topic
    val wire = Seq(eventoDoc).toDF("doc")
      .select(CdcCodec.quote(col("doc")).as("value"))
    val r = CdcCodec.parseEvento(wire).collect().head
    assert(r.getString(0) === "619c1b9190812c00013e29c1")
    assert(r.getString(1) === "Opera Boheme")
    // simple payloads match the fixtures' hand-rolled quoting exactly
    val simple = Seq(eventoDoc).toDF("doc")
      .select(CdcCodec.quote(col("doc")).as("q")).collect().head.getString(0)
    assert(simple === q(eventoDoc))
  }

  test("property: unquote(quote(s)) === s over the full escape set + surrogate pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // codepoint mix biased toward the JSON escape set: quotes,
    // backslashes, control chars (\n \t \r and the \u00XX tail), BMP
    // unicode, and astral codepoints that encode as UTF-16 surrogate
    // PAIRS. Lone surrogates are excluded — they are not valid UTF-8,
    // so no parquet/Kafka payload can carry one.
    val codepoint: Gen[Int] = Gen.frequency(
      5 -> Gen.choose(0x20, 0x7e),
      2 -> Gen.oneOf('"'.toInt, '\\'.toInt, '/'.toInt, '}'.toInt),
      2 -> Gen.choose(0x00, 0x1f),
      2 -> Gen.choose(0x80, 0xffff)
        .suchThat(c => !Character.isSurrogate(c.toChar)),
      1 -> Gen.choose(0x10000, 0x10ffff))
    val strGen: Gen[String] = Gen.listOf(codepoint).map(_
      .foldLeft(new java.lang.StringBuilder) { (sb, cp) =>
        sb.appendCodePoint(cp)
      }.toString)
    // deterministic corpus from a pinned seed, round-tripped in ONE
    // Spark job (per-sample jobs would turn 500 samples into 500 jobs)
    val params = Gen.Parameters.default
    val corpus = Gen.listOfN(500, strGen)
      .apply(params, Seed(20260813L))
      .getOrElse(fail("generator exhausted")) ++ Seq(
      "😀😀", // astral pairs back to back
      "\u0000nul and del\u007f", "ends with brace}", "{\"v\":already}")
    val rt = corpus.toDF("p")
      .select(col("p"), CdcCodec.unquote(CdcCodec.quote(col("p"))).as("rt"))
      .collect()
    rt.foreach { r =>
      assert(!r.isNullAt(1), s"payload ${r.getString(0)} decoded to null")
      assert(r.getString(1) === r.getString(0))
    }
  }

  test("malformed payload routes to dead letter, not a poison loop") {
    val df = Seq(q("{not json"), q(eventoDoc)).toDF("value")
    val parsed = CdcCodec.parseEvento(df)
    assert(CdcCodec.deadLetter(parsed).count() === 1)
    assert(parsed.filter(col("id").isNotNull).count() === 1)
  }
}
