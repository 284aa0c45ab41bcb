package graft

import graft.table.{Blooms, GraftTable}
import graft.model._
import org.apache.spark.sql.functions._

/** Randomized MUTATION-history fuzz against a driver-side model: any mix
  * of appends, CoW/MoR/equality deletes, partial overwrites, compaction,
  * manifest consolidation, snapshot expiry, and WAP branch cycles must
  * leave the table reading EXACTLY the model's rows — through scan() and
  * through the DSv2 connector — with metadata counts agreeing. Blooms on
  * the key column keep the bloom paths in the mix. Fixed seed.
  */
class MutationFuzzSpec extends SparkSpec {

  test("fuzz: random mutation histories read back the model exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed5L)

    for (round <- 1 to 3) {
      val loc = java.nio.file.Files
        .createTempDirectory(s"mutfuzz$round").toString + "/t"
      val schema = Seq((1L, 1.0, "x")).toDF("id", "v", "g").schema
      val partitioned = round % 2 == 0
      val t = GraftTable.create(spark, loc, schema,
        partitionBy =
          if (partitioned) Seq(("g", TIdentity, "g_p")) else Seq.empty,
        properties = Map(Blooms.ColumnsProp -> "id",
          Blooms.ItemsProp -> "4000"))

      // the model: id -> (v, g)
      var model = Map.empty[Long, (Double, String)]
      var nextId = 0L
      def freshBatch(n: Int): Seq[(Long, Double, String)] = {
        val rows = (0 until n).map { _ =>
          val id = nextId
          nextId += 1
          (id, id * 1.5, s"g${id % 3}")
        }
        rows
      }
      def df(rows: Seq[(Long, Double, String)]) = rows.toDF("id", "v", "g")

      val init = freshBatch(40)
      t.append(df(init))
      model ++= init.map(r => r._1 -> (r._2, r._3))

      (1 to 10).foreach { step =>
        rnd.nextInt(11) match {
          case 0 => // append
            val rows = freshBatch(10 + rnd.nextInt(20))
            t.append(df(rows))
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          case 1 => // CoW delete by residue
            val k = 3 + rnd.nextInt(4)
            val r = rnd.nextInt(k)
            t.deleteWhere(col("id") % k === r)
            model = model.filter { case (id, _) => id % k != r }
          case 2 => // MoR delete by range
            val cut = if (model.isEmpty) 0L else model.keys.max / 2
            t.deleteWhereMoR(col("id") > cut && col("id") % 5 === 1)
            model = model.filter { case (id, _) =>
              !(id > cut && id % 5 == 1) }
          case 3 => // equality delete on sampled keys
            val keys = model.keys.toSeq.sorted
              .filter(_ => rnd.nextInt(10) == 0).take(15)
            if (keys.nonEmpty) {
              t.deleteWhereEq(keys.map(Tuple1(_)).toDF("id"))
              model --= keys
            }
          case 4 => // partial overwrite of one group
            val g = s"g${rnd.nextInt(3)}"
            val rows = freshBatch(8).map(r => (r._1, r._2, g))
            t.overwriteWhere(col("g") === g, df(rows))
            model = model.filter { case (_, (_, mg)) => mg != g } ++
              rows.map(r => r._1 -> (r._2, r._3))
          case 5 => t.compactBinPack(); ()
          case 6 => t.rewriteManifests(); ()
          case 7 => t.expireSnapshots(keepLast = 2); ()
          // the MoR maintenance rewrites are semantic NO-OPS: the model
          // is untouched and every subsequent step must still agree
          case 8 => t.rewritePositionDeletes(); ()
          case 9 => t.convertEqualityDeletes(); ()
          case _ => // WAP cycle: stage 2 appends, publish or abandon
            val br = s"wap$step"
            t.createBranch(br, t.metadata.currentSnapshotId.get)
            val r1 = freshBatch(6)
            val r2 = freshBatch(6)
            t.appendToBranch(br, df(r1))
            t.appendToBranch(br, df(r2))
            if (rnd.nextBoolean()) {
              t.fastForward(br)
              model ++= (r1 ++ r2).map(r => r._1 -> (r._2, r._3))
            } // else: abandoned audit — main never sees the staged rows
        }

        // full-state check every step: scan() == model == DSv2 read
        val got = t.scan().collect()
          .map(r => r.getAs[Long]("id") ->
            (r.getAs[Double]("v"), r.getAs[String]("g"))).toMap
        assert(got == model,
          s"round $round step $step: scan diverged " +
            s"(missing=${(model.keySet -- got.keySet).take(5)}, " +
            s"extra=${(got.keySet -- model.keySet).take(5)})")
        assert(t.countRows() == model.size.toLong,
          s"round $round step $step: countRows diverged")
      }

      val viaScan = t.scan().orderBy("id")
      val viaDsv2 = spark.read.format("graft").load(loc)
        .select("id", "v", "g").orderBy("id")
      assert(viaDsv2.exceptAll(viaScan.select("id", "v", "g")).isEmpty &&
        viaScan.select("id", "v", "g").exceptAll(viaDsv2).isEmpty,
        s"round $round: DSv2 read diverged from scan")
      // a bloom'd point lookup on a surviving key still finds it
      model.keys.headOption.foreach { id =>
        assert(t.scan(Some(col("id") === id)).count() == 1)
      }
    }
  }
}
