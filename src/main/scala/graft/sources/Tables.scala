package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table access layer.
 *
 * Analytic tables are the driver-generated parquet fixtures
 * (TESTDATA.md). The Boletia domain tables mirror the reference's
 * MongoDB collections (schemas from
 * /root/reference/clientes-go/contratos/contratos.go:7-37; the widened
 * inventario schema per reservas/main.go:151-159). They are built
 * in-memory from the FIXTURES.md §2 seed rows that replay the README
 * transcript, so both the engine and the DuckDB oracle (via VALUES
 * CTEs) see identical content.
 *
 * At scale these would be real Parquet/Delta tables partitioned by a
 * natural key; the loader keeps a single `table(name)` entry point so
 * the storage layout can change without touching query code.
 */
object Tables {
  val analytic: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Fixture vintages differ on events.ts: it has shipped both as
      // INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
      // nanosAsLong surfaces it as a raw long) and as TIMESTAMP(MICROS)
      // with isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Branch on the
      // type the reader actually produces so either vintage yields a
      // session-TZ TimestampType column: nanos are floor-truncated to µs
      // (the truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP),
      // and NTZ is cast to LTZ — instant-preserving because every engine
      // session pins spark.sql.session.timeZone=UTC.
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every analytic table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    analytic.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  // ---------------------------------------------------------------------
  // Boletia domain fixture (FIXTURES.md §2). estado: A=active,
  // C=cancelled-by-organizer, X=cancelled-by-customer (README.md:400).
  // ---------------------------------------------------------------------

  final case class Evento(id: String, nombre: String, capacidad: Int,
      categoria: String, estado: String)
  final case class Inventario(id: String, nombre: String, capacidad: Int,
      categoria: String, estado: String, idres: String, email: String,
      canres: Int)
  final case class Reserva(id: String, evento: String, estado: String,
      email: String, cantidad: Int)

  val eventosSeed: Seq[Evento] = Seq(
    Evento("619c1b9190812c00013e29c1", "Opera Boheme", 20, "Opera", "A"),
    Evento("619c1b9190812c00013e29c2", "Opera Rigoletto", 30, "Opera", "A"),
    Evento("619c1b9190812c00013e29c5", "Final Futbol", 100, "Sport", "C"))

  // capacidad = original − Σ cantidad(active reservas)  (B2 invariant);
  // idres/email/canres carry the last reservation echo (README.md:443-454).
  val inventarioSeed: Seq[Inventario] = Seq(
    Inventario("619c1ca490812c00013e29c3", "Opera Boheme", 17, "Opera", "A",
      "619c1dae4b21200001952449", "pepediaz@gmail.com", 3),
    Inventario("619c1ca490812c00013e29c4", "Opera Rigoletto", 27, "Opera", "A",
      "61a2a4c9a80e2a0001a93f36", "ana@gmail.com", 3),
    Inventario("619c1ca490812c00013e29c6", "Final Futbol", 96, "Sport", "C",
      "61a2a4c9a80e2a0001a93f37", "luis@gmail.com", 4))

  val reservasSeed: Seq[Reserva] = Seq(
    Reserva("619c1dae4b21200001952449", "Opera Boheme", "A", "pepediaz@gmail.com", 3),
    Reserva("619c1dae4b2120000195244a", "Opera Boheme", "X", "pepediaz@gmail.com", 2),
    Reserva("61a2a4c9a80e2a0001a93f36", "Opera Rigoletto", "A", "ana@gmail.com", 3),
    Reserva("61a2a4c9a80e2a0001a93f37", "Final Futbol", "C", "luis@gmail.com", 4))

  def eventos(spark: SparkSession): DataFrame = {
    import spark.implicits._
    eventosSeed.toDF()
  }
  def inventario(spark: SparkSession): DataFrame = {
    import spark.implicits._
    inventarioSeed.toDF()
  }
  def reservas(spark: SparkSession): DataFrame = {
    import spark.implicits._
    reservasSeed.toDF()
  }

  /** DuckDB VALUES-CTE rendering of the same seed rows, so the oracle SQL
    * is self-contained (the domain tables are engine-created, not part of
    * the parquet fixture directory). */
  object OracleCte {
    private def row(vs: Seq[Any]): String = vs.map {
      case s: String => "'" + s.replace("'", "''") + "'"
      case x => x.toString
    }.mkString("(", ", ", ")")

    val inventario: String =
      "inventario(id, nombre, capacidad, categoria, estado, idres, email, canres) AS (VALUES " +
        inventarioSeed.map(i => row(Seq(i.id, i.nombre, i.capacidad,
          i.categoria, i.estado, i.idres, i.email, i.canres))).mkString(", ") + ")"

    val reservas: String =
      "reservas(id, evento, estado, email, cantidad) AS (VALUES " +
        reservasSeed.map(r => row(Seq(r.id, r.evento, r.estado, r.email,
          r.cantidad))).mkString(", ") + ")"

    val eventos: String =
      "eventos(id, nombre, capacidad, categoria, estado) AS (VALUES " +
        eventosSeed.map(e => row(Seq(e.id, e.nombre, e.capacidad,
          e.categoria, e.estado))).mkString(", ") + ")"
  }
}
