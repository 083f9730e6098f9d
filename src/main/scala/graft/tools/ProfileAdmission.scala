package graft.tools

import java.nio.file.Files
import graft.tables.{MergeOps, TableStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for the admission-flow batch body: times each
  * stage of what admissionFlow does per micro-batch so the streaming
  * e2e bottleneck is measured, not guessed. Not part of the engine. */
object ProfileAdmission {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val root = Files.createTempDirectory("graft-prof").toString
    val store = new TableStore(spark, root)
    store.init("inventario", spark.read.parquet(s"$sfDir/part.parquet").select(
      col("p_partkey").cast("string").as("id"),
      col("p_partkey").cast("string").as("nombre"),
      (col("p_size") * 1000).as("capacidad"),
      lit("Cat").as("categoria"), lit("A").as("estado"),
      lit(null).cast("string").as("idres"),
      lit(null).cast("string").as("email"),
      lit(null).cast("int").as("canres")))
    store.init("reservas", graft.sources.Tables.reservas(spark).limit(0))

    val rawBatch = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      lower(md5(concat(col("l_orderkey"), lit("-"), col("l_linenumber"),
        lit("-"), col("l_partkey")))).substr(1, 24).as("id"),
      col("l_partkey").cast("string").as("evento"),
      lit("e@y.z").as("email"),
      col("l_quantity").cast("int").as("cantidad"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"))
      .persist()
    t("materialize input")(rawBatch.count())

    val validated = rawBatch.withColumn("__invalid",
      when(col("cantidad").isNull || col("cantidad") <= 0, "cantidad_invalida")
        .when(col("id").isNull || !col("id").rlike("^[0-9a-f]{24}$"),
          "id_invalido"))
    t("rechazos invalid append")(
      store.appendUnique("rechazos",
        validated.filter(col("__invalid").isNotNull)
          .select(col("id"), col("evento"), col("email"), col("cantidad"),
            col("__invalid").as("motivo")), Seq("id", "motivo")))
    val wDup = Window.partitionBy(col("id")).orderBy(col("seq"))
    val batch = validated.filter(col("__invalid").isNull).drop("__invalid")
      .withColumn("__rn", row_number().over(wDup))
      .filter(col("__rn") === 1).drop("__rn")
      .join(store.load("reservas").select(col("id")), Seq("id"), "left_anti")
      .persist()
    t("batch dedup+antijoin materialize")(batch.count())
    val inv = store.load("inventario")
    val (updatedInv, log0) = MergeOps.admitReservations(inv, batch)
    val log = log0.persist()
    t("log materialize (cogroup fold)")(log.count())
    val admitted = log.filter(col("admitted"))
    val w = Window.partitionBy(col("evento")).orderBy(col("seq").desc)
    val lastPerKey = admitted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("evento").as("nombre"), col("id").as("__idres"),
        col("email").as("__email"), col("cantidad").as("__canres"))
    val widened = MergeOps.guardedUpdate(updatedInv, lastPerKey,
      Seq("nombre"), guard = lit(true),
      sets = Map(
        "idres" -> col("__b___idres"), "email" -> col("__b___email"),
        "canres" -> col("__b___canres")),
      batchCols = Seq("__idres", "__email", "__canres"))
    t("inventario replace (widen)")(store.replace("inventario", widened))
    val newRows = admitted.select(col("id"), col("evento"),
      lit("A").as("estado"), col("email"), col("cantidad"))
    t("reservas appendUnique")(store.appendUnique("reservas", newRows, Seq("id")))
    val rejected = log.filter(!col("admitted"))
      .select(col("id"), col("evento"), col("email"), col("cantidad"),
        lit("sin_capacidad").as("motivo"))
      .unionByName(MergeOps.unknownEventRequests(inv, batch)
        .select(col("id"), col("evento"), col("email"), col("cantidad"),
          lit("no_existe").as("motivo")))
    t("rechazos rejected append")(
      store.appendUnique("rechazos", rejected, Seq("id", "motivo")))
    batch.unpersist(); log.unpersist()
    println("[prof] done")
    spark.stop()
  }
}
