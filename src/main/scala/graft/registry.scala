package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark query plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable:
  *   - every computed column aliased identically on both sides;
  *   - doubles rounded identically (round(x, 4)) on both sides;
  *   - results totally ordered by explicit keys on both sides.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++
      functions.TransformQueries.queries ++
      table.IcebergQueries.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      streaming.StreamingQueries.queries

  lazy val byName: Map[String, GraftQuery] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}

/** Shared helpers for reading driver-generated test tables. */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
