package graft

import graft.table.{GraftTable, IcebergInterop}
import graft.model.TBucket
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based fuzz of the ADOPTION path: a random mutation history on a
  * native table → export to the Iceberg Avro layout → adoptTable → the
  * adopted table keeps mutating NATIVELY, checked against a driver-side
  * model after every step. Adoption is load-bearing for interop (it is
  * how an external table becomes writable), so it gets the same fuzz
  * treatment as the DV/lineage surface (DvLineageFuzzSpec). Pinned
  * seeds — failures replay.
  */
class AdoptionFuzzSpec extends SparkSpec {

  test("fuzz: export→adopt mid-history, keep mutating — model stays exact") {
    import spark.implicits._
    for (round <- 1 to 10) {
      val rnd = new scala.util.Random(0xada9f00dL + round)
      val srcLoc = java.nio.file.Files
        .createTempDirectory(s"adoptfuzz$round-src").toString + "/t"
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("grp", LongType),
        StructField("v", LongType)))
      // half the rounds partitioned: adoption must carry partition
      // tuples and spec ids, not just flat entries
      val t0 =
        if (round % 2 == 0)
          GraftTable.create(spark, srcLoc, schema,
            partitionBy = Seq(("grp", TBucket(3), "grp_bucket")))
        else GraftTable.create(spark, srcLoc, schema)

      // model: k (unique) -> (grp, v)
      var model = Map.empty[Long, (Long, Long)]
      var nextK = 0L

      def check(t: GraftTable, step: String): Unit = {
        val got = t.scan().select("k", "grp", "v").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got == model,
          s"round $round after $step: engine=${got.size} model=${
            model.size}; diff=${(got.toSet diff model.toSet).take(3)} / ${
            (model.toSet diff got.toSet).take(3)}")
        assert(t.countRows() == model.size.toLong,
          s"round $round after $step: countRows != model")
      }

      def mutate(t: GraftTable, steps: Int, tag: String): Unit =
        (1 to steps).foreach { step =>
          val op = if (model.isEmpty) 0 else rnd.nextInt(9)
          op match {
            case 0 | 1 => // append
              val n = 15 + rnd.nextInt(40)
              val rows = (0 until n).map { _ =>
                val k = nextK; nextK += 1
                (k, k % 5, rnd.nextInt(1000).toLong)
              }
              t.append(rows.toDF("k", "grp", "v")
                .repartition(1 + rnd.nextInt(3)))
              rows.foreach(r => model += r._1 -> (r._2, r._3))
            case 2 => // DV delete
              val g = rnd.nextInt(5).toLong
              t.deleteWhereDv(col("grp") === g)
              model = model.filterNot(_._2._1 == g)
            case 3 => // parquet MoR delete
              val cut = rnd.nextInt(1000).toLong
              t.deleteWhereMoR(col("v") < cut && col("grp") === 1L)
              model = model.filterNot(e => e._2._2 < cut && e._2._1 == 1L)
            case 4 => // CoW delete
              val cut = rnd.nextInt(1000).toLong
              t.deleteWhere(col("v") >= cut && col("grp") === 2L)
              model = model.filterNot(e => e._2._2 >= cut && e._2._1 == 2L)
            case 5 => // EQUALITY delete by key (content=2 manifests)
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(3 + rnd.nextInt(8))
              t.deleteWhereEq(victims.toDF("k"))
              model = model.removedAll(victims)
            case 6 => // UPDATE
              val g = rnd.nextInt(5).toLong
              t.updateWhere(col("grp") === g, Map("v" -> lit(g)))
              model = model.map { case (k, (grp, v)) =>
                k -> (grp, if (grp == g) g else v) }
            case 7 => if (rnd.nextBoolean()) t.compact()
              else t.rewriteManifests(64L)
            case 8 => // MERGE upsert
              val existing = rnd.shuffle(model.keys.toSeq)
                .take(4 + rnd.nextInt(8))
              val fresh = (0 until 4).map { _ =>
                val k = nextK; nextK += 1; k }
              val srcRows = (existing ++ fresh).map(k =>
                (k, k % 5, 5000L + rnd.nextInt(1000)))
              t.mergeInto(srcRows.toDF("k", "grp", "v"), Seq("k"))
              srcRows.foreach(r => model += r._1 -> (r._2, r._3))
          }
          check(t, s"$tag step $step op $op")
        }

      // phase 1: random native history
      mutate(t0, 3 + rnd.nextInt(3), "pre-adopt")

      // phase 2: export the layout and ADOPT it as a new native table
      val layout = java.nio.file.Files
        .createTempDirectory(s"adoptfuzz$round-layout").toString
      IcebergInterop.exportTable(t0, layout)
      val adopted = IcebergInterop.adoptTable(spark, layout,
        java.nio.file.Files
          .createTempDirectory(s"adoptfuzz$round-adopted").toString + "/t")
      check(adopted, "adoption")
      val seqAtAdoption = adopted.metadata.lastSequenceNumber
      val snapAtAdoption = adopted.metadata.currentSnapshotId.get
      val modelAtAdoption = model

      // phase 3: the ADOPTED table keeps mutating natively
      mutate(adopted, 3 + rnd.nextInt(3), "post-adopt")

      // history remains linear past the adoption point: sequence numbers
      // advanced, and time travel to the adoption snapshot still returns
      // the exact adopted state
      assert(adopted.metadata.lastSequenceNumber > seqAtAdoption)
      val back = adopted.scan(asOf = Some(snapAtAdoption))
        .select("k", "grp", "v").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(back == modelAtAdoption,
        s"round $round: time travel to the adoption snapshot diverged")

      // and the mutated adopted table survives a SECOND export→adopt
      val layout2 = java.nio.file.Files
        .createTempDirectory(s"adoptfuzz$round-layout2").toString
      IcebergInterop.exportTable(adopted, layout2)
      val adopted2 = IcebergInterop.adoptTable(spark, layout2,
        java.nio.file.Files
          .createTempDirectory(s"adoptfuzz$round-adopted2")
          .toString + "/t")
      check(adopted2, "re-adoption")
    }
  }
}
