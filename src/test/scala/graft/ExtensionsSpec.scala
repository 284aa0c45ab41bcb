package graft

import graft.functions.{GraftExtensions, IcebergHash, LshOps}
import org.apache.spark.sql.functions._

/** SQL registration: GraftExtensions.install registers the transform
  * functions on the (shared) live session — never builds or stops its own
  * session, since getOrCreate would return the session other suites are
  * using and stopping it would kill them (suites run in parallel).
  */
class ExtensionsSpec extends SparkSpec {

  test("iceberg_bucket and lsh_bucket are callable from SQL") {
    GraftExtensions.install(spark)
    import spark.implicits._
    Seq(34L, 0L, 99L).toDF("v").createOrReplaceTempView("ext_t")
    val out = spark.sql("SELECT iceberg_bucket(16, v) AS b FROM ext_t")
      .collect().map(_.getInt(0)).toSeq
    val expected = Seq(34L, 0L, 99L)
      .map(v => (IcebergHash.hashLong(v) & Int.MaxValue) % 16)
    assert(out == expected)

    Seq(Seq.fill(64)(1.0f)).toDF("vec").createOrReplaceTempView("ext_v")
    val b = spark.sql("SELECT lsh_bucket(vec, 8, 64) AS b FROM ext_v")
      .head().getInt(0)
    assert(b >= 0 && b < 256)

    // misuse: non-literal bucket count is rejected with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT iceberg_bucket(v, v) FROM ext_t").collect())
    assert(e.getMessage.contains("integer literal"))
  }
}
