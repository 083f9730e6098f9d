package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a DataFrame builder plus (optionally) the
  * equivalent DuckDB SQL the driver hash-checks it against. Queries with
  * no SQL-expressible oracle (probabilistic sketches etc.) set
  * `oracle = None` and get a rows-only check. */
final case class Query(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Query {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Query =
    Query(name, build, Some(oracle))

  def unchecked(name: String)(
      build: (SparkSession, String) => DataFrame): Query =
    Query(name, build, None)
}
