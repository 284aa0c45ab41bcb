package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Guards the events-ingestion seam against testdata regeneration: the
  * driver has shipped events.ts as BOTH parquet TIMESTAMP(NANOS) (int64
  * nanos, readable only via nanosAsLong) and timestamp[us] (loads as
  * TIMESTAMP_NTZ). Tables.normalizeTs must produce identical session-tz
  * timestamps from every encoding — round 10 lost 10 queries to a
  * hardcoded nanos assumption.
  */
class TablesSpec extends SparkSpec {

  // one wall-clock instant, three physical encodings
  private val micros = Seq(
    1700000000000000L, 1700003600123456L, 1700007200999999L)

  private def writeDf(rows: Seq[Row], schema: StructType): String = {
    val dir = java.nio.file.Files.createTempDirectory("enc").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def readNorm(dir: String): Seq[Long] =
    Tables.normalizeTs(Tables.rawEvents(spark, dir))
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("normalizeTs yields identical instants from long/NTZ/TZ encodings") {
    // (a) plain int64 column named ts holding epoch NANOS — the shape a
    // TIMESTAMP(NANOS) file presents under nanosAsLong
    val longDir = writeDf(
      micros.map(m => Row(m * 1000L)),
      StructType(Seq(StructField("ts", LongType))))
    // (b) TIMESTAMP_NTZ — the shape a timestamp[us] (no tz) file presents
    val ntzDir = writeDf(
      micros.map(m => Row(java.time.LocalDateTime.ofEpochSecond(
        m / 1000000L, (m % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    // (c) session-tz timestamp — already normalized, must pass through
    val tzDir = writeDf(
      micros.map(m => Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L)))),
      StructType(Seq(StructField("ts", TimestampType))))

    val fromLong = readNorm(longDir)
    val fromNtz = readNorm(ntzDir)
    val fromTz = readNorm(tzDir)
    assert(fromLong == micros.sorted)
    assert(fromNtz == fromLong)
    assert(fromTz == fromLong)
    // normalized type is always session-tz TimestampType
    Seq(longDir, ntzDir, tzDir).foreach { d =>
      val t = Tables.normalizeTs(Tables.rawEvents(spark, d)).schema("ts").dataType
      assert(t == TimestampType, s"$d normalized to $t")
    }
  }

  test("Tables.tbl reads the current events testdata with timestamp ts") {
    val df = Tables.tbl(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
    // sane epoch range — catches unit mix-ups (a nanos/micros confusion
    // lands in 1970 or year 50000+)
    val yrs = df.select(year(col("ts"))).distinct()
      .collect().map(_.getInt(0))
    assert(yrs.forall(y => y >= 2000 && y <= 2100), yrs.mkString(","))
  }
}
