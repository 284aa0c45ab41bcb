package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Randomized schema-evolution sequences checked against a driver-side
  * model: after any mix of renames, adds, and appends, the table must
  * show every row with the model's expected column names, old rows must
  * read null for later-added columns, and renamed columns must keep
  * serving data written under their old name (field-id resolution).
  */
class EvolutionFuzzSpec extends SparkSpec {

  test("fuzz: random rename/add/append sequences keep reads consistent") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xeade11L)

    // one round per data-file format: field-id alignment must hold
    // through the parquet, ORC, and avro readers alike
    val formats = Seq("parquet", "orc", "avro")
    for (round <- 1 to 3) {
      val loc = java.nio.file.Files
        .createTempDirectory(s"evofuzz$round").toString + "/t"
      val t = GraftTable.create(spark, loc, StructType(Seq(
        StructField("id", LongType), StructField("a", StringType))),
        properties = Map(
          GraftTable.WriteFormatProp -> formats(round - 1)))

      // model state: current column names and, per append, which columns
      // existed when those rows were written
      var cols = Vector("id", "a")
      var defaults = Map.empty[String, String] // initial-defaults
      var nextRowId = 0L
      // (rowIds, columns-present-at-write)
      var appended = Vector.empty[(Seq[Long], Set[String])]
      var nAdds = 0

      (1 to 8).foreach { step =>
        rnd.nextInt(3) match {
          case 0 => // append a small batch with the CURRENT schema
            val ids = (nextRowId until nextRowId + 5L)
            nextRowId += 5
            val base = ids.toDF("id")
            val df = cols.filterNot(_ == "id").foldLeft(base) { (d, c) =>
              d.withColumn(c, concat(lit(s"$c-"), col("id")))
            }.select(cols.map(col): _*)
            t.append(df)
            appended :+= ((ids, cols.toSet))
          case 1 => // rename a non-id column
            val from = cols(1 + rnd.nextInt(cols.size - 1))
            val to = s"${from}_r$step"
            t.renameColumn(from, to)
            val idx = cols.indexOf(from)
            // renamed column serves the same field id: rows written under
            // the OLD name must still be visible under the new one, so
            // carry the membership forward in the model
            appended = appended.map { case (ids, present) =>
              (ids, if (present.contains(from)) present - from + to else present)
            }
            // a renamed column keeps its declared default
            defaults = defaults.map { case (k, v) =>
              (if (k == from) to else k) -> v }
            cols = cols.updated(idx, to)
          case _ if nAdds < 3 => // add a fresh optional column —
            // sometimes with a v3 initial-default (old rows read it)
            nAdds += 1
            val name = s"c$step"
            val dflt =
              if (rnd.nextBoolean()) Some(s"dflt-$step") else None
            t.addColumn(name, StringType, dflt, None)
            cols :+= name
            dflt.foreach(d => defaults += name -> d)
          case _ => ()
        }
      }
      if (appended.isEmpty) {
        val ids = (0L until 5L)
        val df = cols.filterNot(_ == "id").foldLeft(ids.toDF("id")) {
          (d, c) => d.withColumn(c, concat(lit(s"$c-"), col("id")))
        }.select(cols.map(col): _*)
        t.append(df)
        appended :+= ((ids, cols.toSet))
      }

      val out = t.scan()
      assert(out.columns.toSeq == cols, s"round $round: columns diverged")
      assert(out.count() == appended.map(_._1.size).sum)
      // the DSv2 connector must agree with scan() on every history —
      // its native batch path re-implements field-id alignment
      val dsv2 = spark.read.format("graft").load(loc)
      assert(dsv2.columns.toSeq == cols, s"round $round: DSv2 columns")
      assert(dsv2.exceptAll(out).isEmpty && out.exceptAll(dsv2).isEmpty,
        s"round $round: DSv2 read diverged from scan()")
      val rows = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
      appended.foreach { case (ids, present) =>
        ids.foreach { id =>
          val r = rows(id)
          cols.filterNot(_ == "id").foreach { c =>
            val v = Option(r.getAs[String](c))
            if (present.contains(c))
              // the VALUE was written under the column's name at write
              // time (some prefix), so it must be non-null
              assert(v.isDefined,
                s"round $round: row $id lost value for $c (present=$present)")
            else defaults.get(c) match {
              case Some(d) => assert(v.contains(d),
                s"round $round: row $id should read default '$d' " +
                  s"for $c, got $v")
              case None => assert(v.isEmpty,
                s"round $round: row $id has ghost value for $c")
            }
          }
        }
      }
    }
  }

  test("fuzz: type promotion interleaved with appends keeps values exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x9e0407L)

    for (round <- 1 to 3) {
      val loc = java.nio.file.Files
        .createTempDirectory(s"promofuzz$round").toString + "/t"
      val t = GraftTable.create(spark, loc, StructType(Seq(
        StructField("id", LongType), StructField("n", IntegerType),
        StructField("f", FloatType),
        StructField("d", DecimalType(9, 2)))))

      var promoted = false
      var ids = Vector.empty[Long]
      var nextId = 0L
      def batch(k: Int): org.apache.spark.sql.DataFrame = {
        val rows = (nextId until nextId + k)
        nextId += k
        ids ++= rows
        val base = rows.toDF("id")
          .withColumn("n", (col("id") % 1000).cast("int"))
          .withColumn("f", (col("id") % 97).cast("float"))
          .withColumn("d", (col("id") % 503).cast("decimal(9,2)"))
        if (!promoted) base
        else base.select(col("id"), col("n").cast("long").as("n"),
          col("f").cast("double").as("f"),
          col("d").cast("decimal(18,2)").as("d"))
      }
      val promoteAt = 2 + rnd.nextInt(5)
      (1 to 8).foreach { step =>
        if (step == promoteAt) {
          t.promoteColumn("n", LongType)
          t.promoteColumn("f", DoubleType)
          t.promoteColumn("d", DecimalType(18, 2))
          promoted = true
        } else t.append(batch(3 + rnd.nextInt(4)))
      }

      // expected: exact widening — no value changes across promotion
      val expected = ids.toDF("id")
        .withColumn("n", col("id") % 1000)
        .withColumn("f", (col("id") % 97).cast("float").cast("double"))
        .withColumn("d", (col("id") % 503).cast("decimal(18,2)"))
      val out = t.scan()
      assert(out.schema("n").dataType == LongType &&
        out.schema("f").dataType == DoubleType &&
        out.schema("d").dataType == DecimalType(18, 2),
        s"round $round: promoted schema wrong: ${out.schema}")
      assert(out.exceptAll(expected).isEmpty &&
        expected.exceptAll(out).isEmpty,
        s"round $round: engine scan diverged after promotion")
      // the DSv2 columnar path must agree (it reads old files through
      // the parquet reader's widening, not the engine's align cast)
      val dsv2 = spark.read.format("graft").load(loc)
      assert(dsv2.schema("n").dataType == LongType)
      assert(dsv2.exceptAll(expected).isEmpty &&
        expected.exceptAll(dsv2).isEmpty,
        s"round $round: DSv2 read diverged after promotion")
      // a predicate over the promoted column plans old int-bounded
      // files correctly (no silent row loss from stats pruning)
      val cut = 500L
      val want = ids.count(_ % 1000 >= cut)
      assert(t.scan().filter(col("n") >= cut).count() == want)
      assert(dsv2.filter(col("n") >= cut).count() == want)
    }
  }

  test("promotion composes with equality deletes and bucket partitioning") {
    import spark.implicits._
    import graft.model.TBucket
    val loc = java.nio.file.Files
      .createTempDirectory("promo-eq").toString + "/t"
    val df0 = (0L until 40L).map(i => (i, (i % 100).toInt)).toDF("id", "n")
    val t = GraftTable.create(spark, loc, df0.schema,
      partitionBy = Seq(("n", TBucket(4), "n_bucket")))
    t.append(df0)
    // equality deletes keyed on the INT column, before promotion
    t.deleteWhereEq(Seq(5, 7).toDF("n"))
    t.promoteColumn("n", LongType)
    // the old delete files carry int keys; the promoted read joins them
    // against the long column — Spark's widening coercion is exact, so
    // pre-promotion deletes keep applying after the promotion
    t.append(Seq((100L, 5L), (101L, 9L)).toDF("id", "n"))
    t.deleteWhereEq(Seq(9L).toDF("n"))
    val got = t.scan().select("id").collect().map(_.getLong(0)).toSet
    val expect = (0L until 40L).toSet -- Set(5L, 7L, 9L) + 100L
    assert(got == expect, s"diff: ${got.diff(expect)} / ${expect.diff(got)}")
    // bucket[4] hashes int AS long (Iceberg spec): partition pruning on
    // the promoted column stays correct AND effective across files
    // written under both types
    assert(t.scan().filter(col("n") === 12L).count() == 1)
    val all = t.planFiles().size
    val kept = t.planFiles(Some(col("n") === 12L)).size
    assert(kept < all,
      s"bucket pruning ineffective after promotion: $kept/$all files")
  }

  test("promotion of an identity partition source keeps pruning exact " +
      "across mixed-typed partition values") {
    import spark.implicits._
    import graft.model.TIdentity
    val loc = java.nio.file.Files
      .createTempDirectory("promo-idp").toString + "/t"
    val df0 = (0L until 40L).map(i => (i, (i % 4).toInt)).toDF("id", "n")
    val t = GraftTable.create(spark, loc, df0.schema,
      partitionBy = Seq(("n", TIdentity, "n_p")))
    t.append(df0) // manifests record INT-typed identity partition values
    t.promoteColumn("n", LongType)
    t.append(Seq((100L, 2L), (101L, 4L)).toDF("id", "n")) // LONG values
    val expected = (0L until 40L).map(i => (i, i % 4)).toDF("id", "n")
      .union(Seq((100L, 2L), (101L, 4L)).toDF("id", "n"))
    val out = t.scan()
    assert(out.schema("n").dataType == LongType)
    assert(out.exceptAll(expected).isEmpty &&
      expected.exceptAll(out).isEmpty, "values diverged after promotion")
    // grouping/filtering over a partition value present under BOTH types
    assert(t.scan().filter(col("n") === 2L).count() == 11)
    assert(t.scan().filter(col("n") >= 3L).count() == 11)
    // planFiles pruning is EXACT on the mixed-typed identity values:
    // kept files are precisely those whose recorded value is 2 — a file
    // wrongly pruned (old int rendering vs long predicate) would show
    // up as a set mismatch, not just a count
    val all = t.planFiles()
    val kept = t.planFiles(Some(col("n") === 2L))
    val matching = all.filter(_.partition.get("n_p").flatten.contains("2"))
    assert(matching.nonEmpty && kept.map(_.path).toSet ==
      matching.map(_.path).toSet,
      s"identity pruning drifted: kept=${kept.size} match=${matching.size}")
    assert(kept.size < all.size, "identity pruning ineffective")
    // the distributed planning path agrees file-for-file
    val dkept = t.planFilesDistributed(Some(col("n") === 2L))
      .collect().map(_.getString(0)).toSet
    assert(dkept == kept.map(_.path).toSet,
      "distributed planning diverged on mixed-typed identity values")
    val dsv2 = spark.read.format("graft").load(loc)
    assert(dsv2.filter(col("n") === 2L).count() == 11)
  }

  test("bloom sidecars built on int columns keep pruning after " +
      "promotion to long") {
    import spark.implicits._
    import graft.table.Blooms
    val loc = java.nio.file.Files
      .createTempDirectory("promo-bloom").toString + "/t"
    // round-robin layout: every file spans the whole n range, so min/max
    // stats prune nothing — any skipping observed is the bloom's
    val df = (0L until 8000L).map(i => (i, i.toInt)).toDF("id", "n")
    val t = GraftTable.create(spark, loc, df.schema,
      properties = Map(Blooms.ColumnsProp -> "n", Blooms.ItemsProp -> "2000"))
    t.append(df.repartition(8))
    t.promoteColumn("n", LongType)
    t.append(Seq((9000L, 9000L)).toDF("id", "n")) // bloom built on LONG
    val all = t.planFiles().size
    // a pre-promotion value probed as a LONG literal: the sidecar hashed
    // the value as int at write time — Blooms canonicalizes integrals to
    // long on both sides, so the probe must still hit exactly
    assert(t.scan().filter(col("n") === 123L).count() == 1)
    val kept = t.planFiles(Some(col("n") === 123L)).size
    assert(kept <= 3 && kept < all,
      s"bloom pruning ineffective across promotion: $kept/$all files")
    // and a post-promotion long value behaves identically
    assert(t.scan().filter(col("n") === 9000L).count() == 1)
    assert(t.planFiles(Some(col("n") === 9000L)).size <= 3)
  }

  test("metadata-only MIN/MAX stays exact across int->long promoted files") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("promo-mm").toString + "/t"
    val df = (10L until 50L).map(i => (i, i.toInt)).toDF("id", "n")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df) // int-typed stats bounds
    t.promoteColumn("n", LongType)
    t.append(Seq((100L, 5L)).toDF("id", "n")) // long-typed stats bounds
    // MIN lands in the new long file, MAX in an old int file: both sides
    // of the mixed-typed stats domain must decode under the promoted type
    assert(t.columnExtreme("n", isMin = true).contains(5L))
    assert(t.columnExtreme("n", isMin = false).contains(49L))
    // the public DSv2 aggregate surface agrees
    val r = spark.read.format("graft").load(loc)
      .agg(min("n"), max("n")).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 49L)
  }
}
