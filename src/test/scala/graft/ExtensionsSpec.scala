package graft

import graft.functions.{GraftExtensions, IcebergHash}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration path: a session built with GraftExtensions can
  * call the transform functions from plain SQL.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("iceberg_bucket is callable from SQL via SparkSessionExtensions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      Seq(34L, 0L, 99L).toDF("v").createOrReplaceTempView("ext_t")
      val out = spark.sql("SELECT iceberg_bucket(16, v) AS b FROM ext_t")
        .collect().map(_.getInt(0)).toSeq
      val expected = Seq(34L, 0L, 99L)
        .map(v => (IcebergHash.hashLong(v) & Int.MaxValue) % 16)
      assert(out == expected)
      // misuse: non-literal bucket count is rejected with a clear message
      val e = intercept[Exception](
        spark.sql("SELECT iceberg_bucket(v, v) FROM ext_t").collect())
      assert(e.getMessage.contains("integer literal"))
    } finally spark.stop()
  }
}
