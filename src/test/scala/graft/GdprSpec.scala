package graft

import java.nio.file.Files
import graft.tables.{Gdpr, TableStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-subject erasure: PII gone from every table, seat accounting
  * untouched, idempotent, history expirable via vacuum. */
class GdprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pii = "pepediaz@gmail.com"

  private def seeded(): TableStore = {
    import spark.implicits._
    val store =
      new TableStore(spark, Files.createTempDirectory("graft-gdpr").toString)
    store.init("inventario",
      Seq(("Opera Boheme", 96, "Cultural", "A"), ("Rock Fest", 200, "Musica", "A"))
        .toDF("nombre", "capacidad", "categoria", "estado"))
    store.init("reservas",
      Seq(("r1", "Opera Boheme", pii, 4L, "A"),
        ("r2", "Opera Boheme", "ana@x.com", 2L, "A"),
        ("r3", "Rock Fest", pii, 1L, "X"))
        .toDF("id", "evento", "email", "cantidad", "estado"))
    store.init("notificaciones",
      Seq(("r1", pii, "Confirmación de reserva", "Su reserva r1 ..."),
        ("r2", "ana@x.com", "Confirmación de reserva", "Su reserva r2 ..."))
        .toDF("id", "email", "subject", "body"))
    store.init("dead_letter",
      Seq(("consumer", s"""{"email":"$pii","broken""""),
        ("consumer", """{"email":"other@x.com"}"""),
        // SUPERSTRING subject: contains pii as a substring — an
        // unanchored match would erase this unrelated subject's row
        ("consumer", s"""{"email":"super$pii","x":1}"""))
        .toDF("flow", "raw"))
    store
  }

  private def activeSeats(store: TableStore): Map[String, Long] =
    store.load("reservas").filter(col("estado") === "A")
      .groupBy("evento").agg(sum("cantidad").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("purge erases PII from every table without touching seat accounting") {
    val store = seeded()
    val seatsBefore = activeSeats(store)
    val rep = Gdpr.purgeSubject(store, pii)
    assert(rep.redactedReservas === 2L)
    assert(rep.deletedNotificaciones === 1L)
    assert(rep.deletedDeadLetter === 1L)
    // the subject's email appears (as a whole address — the anchored
    // notion erasure uses) in NO string column of any table
    val anchored = s"(^|[^A-Za-z0-9._%+@-])${java.util.regex.Pattern.quote(pii)}([^A-Za-z0-9._%+@-]|$$)"
    for (t <- Seq("reservas", "notificaciones", "dead_letter")) {
      val df = store.load(t)
      val strCols = df.schema.fields
        .filter(_.dataType.typeName == "string").map(_.name)
      val hits = df.filter(strCols.map(c => col(c).rlike(anchored))
        .reduce(_ || _)).count()
      assert(hits === 0L, s"$t still contains the subject's email")
    }
    // accounting rows survive, redacted: same count, same seat math
    assert(store.load("reservas").count() === 3L)
    assert(activeSeats(store) === seatsBefore)
    assert(store.load("reservas").filter(col("email") === Gdpr.Tombstone)
      .count() === 2L)
    // other subjects untouched — including the SUPERSTRING address
    // whose payload contains this subject's email as a substring
    assert(store.load("notificaciones").count() === 1L)
    assert(store.load("dead_letter").count() === 2L)
    assert(store.load("dead_letter")
      .filter(col("raw").contains(s"super$pii")).count() === 1L,
      "superstring subject's quarantine row was erased")
  }

  test("purge matches case-insensitively: Ana@X.com does not survive a purge of ana@x.com") {
    import spark.implicits._
    val store =
      new TableStore(spark, Files.createTempDirectory("graft-gdprci").toString)
    store.init("reservas",
      Seq(("r1", "Opera Boheme", "PepeDiaz@Gmail.COM", 4L, "A"),
        ("r2", "Opera Boheme", "ana@x.com", 2L, "A"))
        .toDF("id", "evento", "email", "cantidad", "estado"))
    store.init("notificaciones",
      Seq(("r1", "PEPEDIAZ@gmail.com", "s", "b"))
        .toDF("id", "email", "subject", "body"))
    store.init("dead_letter",
      Seq(("consumer", """{"email":"PepeDiaz@GMAIL.com","broken"""))
        .toDF("flow", "raw"))
    val rep = Gdpr.purgeSubject(store, pii) // all-lowercase request
    assert(rep === Gdpr.PurgeReport(1L, 1L, 1L))
    assert(store.load("reservas").filter(lower(col("email"))
      .contains("pepediaz")).isEmpty)
    assert(store.load("notificaciones").isEmpty)
    assert(store.load("dead_letter").isEmpty)
    // the OTHER subject is untouched
    assert(store.load("reservas").filter(col("email") === "ana@x.com")
      .count() === 1L)
  }

  test("purge is idempotent and history expires with vacuum") {
    val store = seeded()
    Gdpr.purgeSubject(store, pii)
    val vAfter = store.version("notificaciones")
    // pre-erasure snapshot still time-travels (retention window)...
    assert(store.loadVersion("notificaciones", vAfter - 1)
      .filter(col("email") === pii).count() === 1L)
    // ...until vacuum force-expires it
    store.vacuum("notificaciones", keepVersions = 1)
    intercept[IllegalArgumentException](
      store.loadVersion("notificaciones", vAfter - 1))
    // second purge: nothing matches, nothing publishes
    val rep2 = Gdpr.purgeSubject(store, pii)
    assert(rep2.total === 0L)
    assert(store.version("notificaciones") === vAfter)
  }
}
