package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based fuzz over the deletion-vector + row-lineage surface:
  * random interleavings of appends, MoR / DV / CoW deletes, updates and
  * every maintenance rewrite, checked after each step against a driver-
  * side model of (row id → row value). Pinned seeds — failures replay.
  */
class DvLineageFuzzSpec extends SparkSpec {

  test("fuzz: mutation/maintenance interleavings preserve ids and rows") {
    import spark.implicits._
    for (round <- 1 to 3) {
      val rnd = new scala.util.Random(0xd1ead00L + round)
      val loc = java.nio.file.Files
        .createTempDirectory(s"dvlinfuzz$round").toString + "/t"
      val t = GraftTable.create(spark, loc, StructType(Seq(
        StructField("k", LongType), StructField("grp", LongType),
        StructField("v", LongType))),
        properties = Map(GraftTable.RowLineageProp -> "true"))

      // model: row id -> (k, grp, v); ids assigned densely per append
      var model = Map.empty[Long, (Long, Long, Long)]
      var nextK = 0L

      def check(step: String): Unit = {
        val got = t.scanWithLineage()
          .select(col("_row_id"), col("k"), col("grp"), col("v"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            r.getLong(3))).toMap
        assert(got == model,
          s"round $round after $step: engine=${got.size} rows, " +
            s"model=${model.size}; diff=${
              (got.toSet diff model.toSet).take(3)} / ${
              (model.toSet diff got.toSet).take(3)}")
        assert(t.countRows() == model.size.toLong,
          s"round $round after $step: countRows")
      }

      (1 to 14).foreach { step =>
        val op = if (model.isEmpty) 0 else rnd.nextInt(11)
        op match {
          case 0 | 1 => // append a batch (ids continue densely)
            val n = 20 + rnd.nextInt(60)
            val base = t.metadata.nextRowId.getOrElse(0L)
            val rows = (0 until n).map { i =>
              val k = nextK; nextK += 1
              (k, k % 7, rnd.nextInt(1000).toLong)
            }
            // writeFiles may split rows across shards in any order; the
            // id → row binding must be recovered from the engine itself,
            // so bind by k (unique) after the commit
            t.append(rows.toDF("k", "grp", "v").repartition(
              1 + rnd.nextInt(3)))
            val appended = t.scanWithLineage()
              .filter(col("_row_id") >= base)
              .select(col("_row_id"), col("k"), col("grp"), col("v"))
              .collect()
            assert(appended.length == n)
            appended.foreach(r => model += r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3)))
          case 2 => // DV delete by group
            val g = rnd.nextInt(7).toLong
            t.deleteWhereDv(col("grp") === g)
            model = model.filterNot(_._2._2 == g)
          case 3 => // parquet MoR delete by value band
            val cut = rnd.nextInt(1000).toLong
            t.deleteWhereMoR(col("v") < cut && col("grp") === 1L)
            model = model.filterNot(e => e._2._3 < cut && e._2._2 == 1L)
          case 4 => // CoW delete (id-preserving rewrite)
            val cut = rnd.nextInt(1000).toLong
            t.deleteWhere(col("v") >= cut && col("grp") === 2L)
            model = model.filterNot(e => e._2._3 >= cut && e._2._2 == 2L)
          case 5 => // UPDATE (ids survive, values change)
            val g = rnd.nextInt(7).toLong
            t.updateWhere(col("grp") === g, Map("v" -> lit(g)))
            model = model.map { case (id, (k, grp, v)) =>
              id -> (k, grp, if (grp == g) g else v) }
          case 6 => t.compact()
          case 7 => t.compactBinPack(targetFileBytes = 1L << 20)
          case 8 =>
            if (rnd.nextBoolean()) t.rewriteManifests(64L)
            else { try t.rewritePositionDeletes(1000L)
              catch { case _: IllegalStateException => () } } // empty table
          case 9 => // MERGE upsert: updates keep ids, inserts get fresh
            val existing = rnd.shuffle(model.values.map(_._1).toSeq)
              .take(5 + rnd.nextInt(10))
            val newKeys = (0 until 5).map { _ => val k = nextK; nextK += 1; k }
            val srcRows = (existing ++ newKeys).map(k =>
              (k, k % 7, 5000L + rnd.nextInt(1000)))
            t.mergeInto(srcRows.toDF("k", "grp", "v"), Seq("k"))
            val byK = srcRows.map(r => r._1 -> r).toMap
            // updates: same id, source values
            model = model.map { case (id, (k, grp, v)) =>
              byK.get(k) match {
                case Some((_, g2, v2)) => id -> (k, g2, v2)
                case None => id -> (k, grp, v)
              }
            }
            // inserts: bind engine-assigned ids by (unique) key
            val inserted = t.scanWithLineage()
              .filter(col("k").isin(newKeys: _*))
              .select(col("_row_id"), col("k"), col("grp"), col("v"))
              .collect()
            assert(inserted.length == newKeys.size)
            inserted.foreach(r => model += r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3)))
          case 10 => // INSERT OVERWRITE: replaced rows get FRESH ids,
            // survivors (same file, cond false) keep theirs
            val g = rnd.nextInt(7).toLong
            val n = 5 + rnd.nextInt(10)
            val base = t.metadata.nextRowId.getOrElse(0L)
            val rows = (0 until n).map { _ =>
              val k = nextK; nextK += 1
              (k, g, 9000L + rnd.nextInt(1000))
            }
            t.overwriteWhere(col("grp") === g,
              rows.toDF("k", "grp", "v"))
            model = model.filterNot(_._2._2 == g)
            val added = t.scanWithLineage()
              .filter(col("_row_id") >= base)
              .select(col("_row_id"), col("k"), col("grp"), col("v"))
              .collect()
            assert(added.length == n,
              s"overwrite should add $n fresh-id rows, got ${added.length}")
            added.foreach(r => model += r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3)))
        }
        check(s"step $step op $op")
      }

      // end-of-round interop invariant: the table survives a FULL
      // export → adopt round-trip with identical rows and lineage ids
      // (DV blobs, materialized and virtual lineage, whatever state
      // the random walk left behind)
      val layout = java.nio.file.Files
        .createTempDirectory(s"dvlinfuzz-layout$round").toString
      graft.table.IcebergInterop.exportTable(t, layout)
      val adopted = graft.table.IcebergInterop.adoptTable(spark, layout,
        java.nio.file.Files
          .createTempDirectory(s"dvlinfuzz-adopt$round").toString + "/t")
      val adoptedRows = adopted.scanWithLineage()
        .select(col("_row_id"), col("k"), col("grp"), col("v"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3))).toMap
      assert(adoptedRows == model,
        s"round $round: adopted table diverged from the model")
    }
  }
}
