package graft

import graft.functions.{transforms, IcebergBucket, IcebergHash}
import org.apache.spark.sql.functions._
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

class TransformSpec extends SparkSpec {

  test("murmur3_x86_32 agrees with Guava's reference implementation") {
    val rnd = new scala.util.Random(7)
    for (len <- 0 to 40) {
      val bytes = Array.fill(len)(rnd.nextInt().toByte)
      val guava = com.google.common.hash.Hashing.murmur3_32_fixed(0)
        .hashBytes(bytes).asInt()
      assert(IcebergHash.hashBytes(bytes) == guava,
        s"len=$len mismatch vs guava")
    }
    // hashLong must equal hashing the 8 little-endian bytes
    for (v <- Seq(0L, 34L, -1L, Long.MaxValue, Long.MinValue, 123456789L)) {
      val le = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(IcebergHash.hashLong(v) == IcebergHash.hashBytes(le))
    }
  }

  test("Iceberg spec Appendix B hash vectors") {
    assert(IcebergHash.hashLong(34L) == 2017239379)                  // int 34
    assert(IcebergHash.hashBytes("iceberg".getBytes("UTF-8")) == 1210000089)
    assert(IcebergHash.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    // date 2017-11-16 → days since epoch, hashed as long
    val days = LocalDate.of(2017, 11, 16).toEpochDay
    assert(IcebergHash.hashLong(days) == -653330422)
    // timestamp 2017-11-16T22:31:08 → micros since epoch
    val micros = LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(IcebergHash.hashLong(micros) == -2047944441)
    // decimal 14.20 → unscaled 1420 minimal two's-complement bytes
    val unscaled = java.math.BigDecimal.valueOf(1420, 2)
      .unscaledValue.toByteArray
    assert(IcebergHash.hashBytes(unscaled) == -500754589)
    // float/double 1.0 → hashLong(doubleToLongBits(1.0))
    assert(IcebergHash.hashDouble(1.0) == -142385009)
  }

  test("bucket expression: interpreted and codegen paths agree") {
    import spark.implicits._
    val df = Seq(34L, 0L, -5L, 987654321L).toDF("v")
    val out = df.select(transforms.bucket(16, col("v")).as("b")).collect()
      .map(_.getInt(0))
    val expected = Seq(34L, 0L, -5L, 987654321L)
      .map(v => (IcebergHash.hashLong(v) & Int.MaxValue) % 16)
    assert(out.toSeq == expected)
    assert(out.forall(b => b >= 0 && b < 16))
    // string input goes through UTF8 bytes
    val sb = Seq("iceberg").toDF("s")
      .select(transforms.bucket(32, col("s")).as("b")).head().getInt(0)
    assert(sb == (1210000089 & Int.MaxValue) % 32)
  }

  test("bucket handles TimestampNTZ columns end-to-end") {
    import spark.implicits._
    // Spark 4 infers parquet timestamps as NTZ and the model maps Iceberg
    // `timestamp` → NTZ, so bucket-partitioning an NTZ column must work
    val micros = LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
    val df = Seq("2017-11-16 22:31:08").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val b = df.select(transforms.bucket(16, col("ts")).as("b")).head().getInt(0)
    assert(b == (IcebergHash.hashLong(micros) & Int.MaxValue) % 16)
    // write-time partitioning over the NTZ column (codegen path) + scan
    val src = spark.range(100).toDF("id").select(col("id"),
      to_timestamp_ntz(concat(lit("2017-11-"),
        lpad((col("id") % 28 + 1).cast("string"), 2, "0"),
        lit(" 10:00:00"))).as("ts"))
    val t = graft.table.GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("ntz-bucket").toString + "/t",
      src.schema,
      partitionBy = Seq(("ts", graft.model.TBucket(4), "ts_bucket")))
    t.append(src, repartitionByPartition = true)
    assert(t.scan().count() == 100)
    val probe = to_timestamp_ntz(lit("2017-11-05 10:00:00"))
    assert(t.scan(Some(col("ts") === probe)).count() ==
      src.filter(col("ts") === probe).count())
  }

  test("calendar transform ordinals match the spec epoch origins") {
    import spark.implicits._
    val df = Seq("2017-11-16 22:31:08").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val row = df.select(
      transforms.years(col("ts")).as("y"),
      transforms.months(col("ts")).as("m"),
      transforms.days(col("ts")).as("d"),
      transforms.hours(col("ts")).as("h")).head()
    assert(row.getInt(0) == 47)      // 2017 - 1970
    assert(row.getInt(1) == 47 * 12 + 10)
    assert(row.getInt(2) == LocalDate.of(2017, 11, 16).toEpochDay.toInt)
    val hours = LocalDateTime.of(2017, 11, 16, 22, 0)
      .toInstant(ZoneOffset.UTC).getEpochSecond / 3600
    assert(row.getInt(3) == hours.toInt)
  }

  test("truncate transforms: ints floor toward -inf, strings take prefixes") {
    import spark.implicits._
    val df = Seq((17, "abcdef"), (-3, "ab"), (20, "xyzw")).toDF("i", "s")
    val rows = df.select(
      transforms.truncateInt(10, col("i")).as("ti"),
      transforms.truncateString(4, col("s")).as("ts")).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(10, -10, 20))
    assert(rows.map(_.getString(1)).toSeq == Seq("abcd", "ab", "xyzw"))
  }
}
