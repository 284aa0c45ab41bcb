package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Hour buckets the 1-hour watermark finalizes: window end ≤ max(ts) − 1h. */
  private def finalizedHours(evs: org.apache.spark.sql.DataFrame) = {
    val mx = evs.agg(max(col("ts").cast("long"))).head().getLong(0)
    evs.filter(
      (floor(col("ts").cast("long") / 3600L) * 3600L) + 3600L <= mx - 3600L)
  }

  test("s_window_agg equals the batch aggregation over finalized windows") {
    val streamed = Registry.byName("s_window_agg").fn(spark, dir).collect()
    val batch = finalizedHours(Tables.tbl(spark, dir, "events"))
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour_start", "event_type")
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[String]("hour_start") == b.getAs[String]("hour_start"))
      assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
    }
  }

  private def sessionTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
      r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet

  test("s_sessionize: emitted sessions match the batch oracle exactly") {
    import org.apache.spark.sql.expressions.Window
    val out = sessionTuples(
      Registry.byName("s_sessionize").fn(spark, dir).collect())
    // batch-side sessionization oracle: split per-user event times at
    // >30-min gaps via lag + running sum
    val evs = Tables.tbl(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("long").as("t"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val all = evs.withColumn("prev", lag("t", 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("t") - col("prev") > 1800L, 1).otherwise(0))
      .withColumn("sid", sum("ns").over(w))
      .groupBy("user_id", "sid")
      .agg(min("t").as("s"), max("t").as("e"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s"),
        r.getAs[Long]("e"), r.getAs[Long]("n")))
    assert(out.nonEmpty && out.subsetOf(all.toSet))
    // a session is emitted iff the final watermark (max ts − 2h) passed
    // session_end + 30min — the only point at which NO admissible late
    // event could still extend or merge it (an earlier emission would
    // overclaim finality: an in-watermark late event in a later batch
    // can fall within gap of it). ±5s boundary band skipped.
    val maxSec = evs.agg(max("t")).head().getLong(0)
    val cut = maxSec - 7200L - 1800L
    all.foreach { s =>
      if (s._3 < cut - 5) assert(out.contains(s), s"final session $s missing")
      if (s._3 > cut + 5) assert(!out.contains(s), s"non-final $s emitted")
    }
  }

  test("s_sessionize: identical output from 1-batch and 3-batch runs") {
    // normalized read (encoding-agnostic); split on epoch micros and stage
    // files whose ts is a plain timestamp — sessionizeDir takes its schema
    // from the staged files
    val raw = Tables.tbl(spark, dir, "events")
      .withColumn("tsm", unix_micros(col("ts")))
    val staging = java.nio.file.Files.createTempDirectory("sess-batches")
    val Array(q1, q2) =
      raw.stat.approxQuantile("tsm", Array(0.33, 0.66), 0.0)
    val splits = Seq(
      raw.filter(col("tsm") < q1),
      raw.filter(col("tsm") >= q1 && col("tsm") < q2),
      raw.filter(col("tsm") >= q2)).map(_.drop("tsm"))
    splits.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"sess-part$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          val dst = staging.resolve(f"$i%03d.parquet")
          java.nio.file.Files.move(p, dst)
          // strictly increasing mod times fix the micro-batch order
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
          moved = true
        }
      }
      assert(moved, s"no parquet written for split $i")
    }
    val multi = sessionTuples(graft.streaming.StreamingQueries
      .sessionizeDir(spark, staging.toString, maxFiles = 1).collect())
    val single = sessionTuples(graft.streaming.StreamingQueries
      .sessionizeDir(spark, staging.toString, maxFiles = 3).collect())
    assert(multi.nonEmpty)
    assert(multi == single,
      s"multi-batch diverged: only-multi=${(multi -- single).take(5)} " +
        s"only-single=${(single -- multi).take(5)}")

    // Stream-stream join over the SAME ordered thirds: the attribution
    // pair set must be identical whether the feed arrives in one
    // micro-batch or three — view-side state survives across batches
    // until the purchase-side watermark passes view_ts + 24h, so a
    // purchase in batch 3 still finds its batch-1 views.
    def pairTuples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val jMulti = pairTuples(graft.streaming.StreamingQueries
      .streamJoinDir(spark, staging.toString, maxFiles = 1).collect())
    val jSingle = pairTuples(graft.streaming.StreamingQueries
      .streamJoinDir(spark, staging.toString, maxFiles = 3).collect())
    assert(jMulti.nonEmpty)
    assert(jMulti == jSingle,
      s"stream-join diverged: only-multi=${(jMulti -- jSingle).take(5)} " +
        s"only-single=${(jSingle -- jMulti).take(5)}")
    // and the streaming answer equals the batch join restatement
    val batch = {
      val e = Tables.tbl(spark, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      pairTuples(v.join(p, col("user_id") === col("pu") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          expr("(unix_micros(purchase_ts) - unix_micros(view_ts)) " +
            "div 1000000").as("lag_sec"))
        .collect())
    }
    assert(jSingle == batch, "streaming pairs differ from the batch join")

    // LEFT OUTER variant: same 1-vs-3-batch equality. The final
    // watermark is identical either way (same max event times per
    // side), so the finalized-unmatched set is too; intermediate
    // evictions must emit the same rows, just earlier.
    def outerTuples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val oMulti = outerTuples(graft.streaming.StreamingQueries
      .streamOuterJoinDir(spark, staging.toString, maxFiles = 1).collect())
    val oSingle = outerTuples(graft.streaming.StreamingQueries
      .streamOuterJoinDir(spark, staging.toString, maxFiles = 3).collect())
    assert(oMulti.exists(_._3 == -1L), "no null-extended rows emitted")
    assert(oMulti == oSingle,
      s"outer stream-join diverged: only-multi=${(oMulti -- oSingle).take(5)}" +
        s" only-single=${(oSingle -- oMulti).take(5)}")
    // matched subset agrees with the inner join
    assert(oSingle.filter(_._3 != -1L) == jSingle
      .map(t => (t._1, t._2, t._3)), "outer matched rows != inner join")
  }

  test("batch-boundary invariance under random time-ordered feeds (5 seeds)") {
    // Property form of the 1-vs-3-batch equality tests (round-14 verdict
    // #7): the SAME output must emerge however the feed is chopped into
    // time-ordered micro-batches, because state (open sessions, join
    // sides) survives across batch boundaries until the watermark
    // retires it. Each pinned seed picks a random batch count k ∈ [2,6]
    // and k−1 random cut timestamps; the feed is staged as k ascending-
    // range files with ascending mtimes (one file per micro-batch) and
    // every stateful operator must reproduce the single-batch reference.
    import java.nio.file.Files
    val raw = Tables.tbl(spark, dir, "events")
      .withColumn("tsm", unix_micros(col("ts")))
    val tsVals = raw.select("tsm").distinct().orderBy("tsm")
      .collect().map(_.getLong(0))

    def writeRange(df: org.apache.spark.sql.DataFrame,
        staging: java.nio.file.Path, i: Int): Unit = {
      val tmp = Files.createTempDirectory("fuzz-part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      var moved = false
      try {
        val part = ls.iterator()
        while (part.hasNext && !moved) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet")) {
            val dst = staging.resolve(f"$i%03d.parquet")
            Files.move(p, dst)
            Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime
                .fromMillis(1000000L + i * 60000L))
            moved = true
          }
        }
      } finally ls.close()
      assert(moved, s"no parquet written for range $i")
    }

    def stage(cuts: Seq[Long]): String = {
      val staging = Files.createTempDirectory("fuzz-feed")
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      bounds.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          writeRange(
            raw.filter(col("tsm") >= lo && col("tsm") < hi).drop("tsm"),
            staging, i)
        case _ => ()
      }
      staging.toString
    }

    def pairTuples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    def outerTuples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // reference: the whole feed as ONE file = one micro-batch
    val refDir = stage(Seq.empty)
    val refSess = sessionTuples(graft.streaming.StreamingQueries
      .sessionizeDir(spark, refDir, maxFiles = 1).collect())
    val refJoin = pairTuples(graft.streaming.StreamingQueries
      .streamJoinDir(spark, refDir, maxFiles = 1).collect())
    val refOuter = outerTuples(graft.streaming.StreamingQueries
      .streamOuterJoinDir(spark, refDir, maxFiles = 1).collect())
    assert(refSess.nonEmpty && refJoin.nonEmpty)
    assert(refOuter.exists(_._3 == -1L), "reference has no unmatched views")

    for (seed <- Seq(11, 23, 37, 41, 59)) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(5)
      // cuts exclude the minimum so every range is non-empty; distinct
      // timestamps (asserted by the generator data: 1000/1000 unique)
      // mean no tie ever straddles a file boundary
      val cuts = rnd.shuffle(tsVals.toList.drop(1)).take(k - 1).sorted
      val feed = stage(cuts)
      val sess = sessionTuples(graft.streaming.StreamingQueries
        .sessionizeDir(spark, feed, maxFiles = 1).collect())
      assert(sess == refSess,
        s"sessionize diverged at seed=$seed k=$k: " +
          s"only-fuzz=${(sess -- refSess).take(3)} " +
          s"only-ref=${(refSess -- sess).take(3)}")
      val join = pairTuples(graft.streaming.StreamingQueries
        .streamJoinDir(spark, feed, maxFiles = 1).collect())
      assert(join == refJoin,
        s"stream-join diverged at seed=$seed k=$k: " +
          s"only-fuzz=${(join -- refJoin).take(3)} " +
          s"only-ref=${(refJoin -- join).take(3)}")
      val outer = outerTuples(graft.streaming.StreamingQueries
        .streamOuterJoinDir(spark, feed, maxFiles = 1).collect())
      assert(outer == refOuter,
        s"outer join diverged at seed=$seed k=$k: " +
          s"only-fuzz=${(outer -- refOuter).take(3)} " +
          s"only-ref=${(refOuter -- outer).take(3)}")
    }
  }

  test("s_stream_merge_upsert converges to batch last-event-per-user") {
    import org.apache.spark.sql.expressions.Window
    val streamed = Registry.byName("s_stream_merge_upsert").fn(spark, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = Tables.tbl(spark, dir, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("event_id").as("last_event_id"))
      .orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("s_dedup_stream restores exact per-type counts after doubling") {
    val deduped = Registry.byName("s_dedup_stream").fn(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events"))
      .toMap
    // the doubled copies vanish; counts match the batch aggregation over
    // exactly the watermark-finalized hour buckets
    val batch = finalizedHours(Tables.tbl(spark, dir, "events"))
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .toMap
    assert(deduped == batch)
  }

  test("multimodal features are deterministic and complete") {
    import org.apache.spark.sql.functions.{col, round}
    val out = graft.operators.Multimodal.multimodalFeatures(spark, dir)
      .select(col("doc_id"), col("detected_format"), col("width"),
        col("n_bytes"), round(col("byte_entropy"), 4).as("byte_entropy"))
      .collect()
    val nDocs = Tables.tbl(spark, dir, "documents").count()
    assert(out.length == nDocs)
    assert(out.forall(_.getAs[Long]("n_bytes") > 0))
    val e = out.map(_.getAs[Double]("byte_entropy"))
    assert(e.forall(x => x >= 0.0 && x <= 4.0)) // 16 bins → max 4 bits
    // planted PNG-headed assets are sniffed as png with parsed dims;
    // plain text payloads sniff as unknown regardless of declared format
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 3 == 0) {
        assert(r.getAs[String]("detected_format") == "png")
        assert(r.getAs[Long]("width") == 640L)
      } else assert(r.getAs[String]("detected_format") == "unknown")
    }
  }

  test("public DSv2 streaming sink: per-epoch appends, partitioned " +
      "fanout, exactly-once replay guard") {
    import spark.implicits._
    import graft.table.GraftTable
    import org.apache.spark.sql.types._
    val srcDir = java.nio.file.Files.createTempDirectory("sink-src")
    val srcSchema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType)))
    def stage(i: Int, rows: Seq[(Long, String)]): Unit = {
      import scala.jdk.CollectionConverters._
      val tmp = srcDir.resolve(s"tmp-$i")
      rows.toDF("id", "g").coalesce(1).write.parquet(tmp.toString)
      val ls = java.nio.file.Files.list(tmp)
      val part = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      java.nio.file.Files.move(part, srcDir.resolve(s"f-$i.parquet"))
      java.nio.file.Files.setLastModifiedTime(
        srcDir.resolve(s"f-$i.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000L + i * 60000L))
    }
    stage(0, (0L until 50L).map(i => (i, s"g${i % 3}")))
    stage(1, (50L until 100L).map(i => (i, s"g${i % 3}")))
    val loc = java.nio.file.Files
      .createTempDirectory("sink-t").toString + "/t"
    GraftTable.create(spark, loc, srcSchema,
      partitionBy = Seq(("g", graft.model.TIdentity, "g_p")))
    val ckpt = java.nio.file.Files
      .createTempDirectory("sink-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
        .writeStream.format("graft").option("path", loc)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val t = GraftTable.load(spark, loc)
    assert(t.scan().count() == 100)
    assert(t.scan().select("id").distinct().count() == 100)
    // one append commit per non-empty epoch
    assert(t.metadata.snapshots.get.size == 2,
      s"expected 2 epoch commits, got ${t.metadata.snapshots.get.size}")
    // fanout wrote hive-style partition dirs the planner prunes on
    val all = t.planFiles()
    val kept = t.planFiles(Some(col("g") === "g1"))
    assert(kept.nonEmpty && kept.size < all.size,
      s"no partition pruning on the streamed files: ${kept.size}/${all.size}")
    assert(kept.forall(_.partition.get("g_p").flatten.contains("g1")))
    assert(t.scan().filter(col("g") === "g1").count() ==
      (0L until 100L).count(_ % 3 == 1))
    // restart from the SAME checkpoint with one new file: only the new
    // epoch commits (the stream id rides the query id, which the
    // checkpoint pins across restarts)
    stage(2, (100L until 120L).map(i => (i, s"g${i % 3}")))
    run()
    val t2 = GraftTable.load(spark, loc)
    assert(t2.scan().count() == 120)
    assert(t2.scan().select("id").distinct().count() == 120)
    assert(t2.metadata.snapshots.get.size == 3)
    // a drained restart commits nothing (no phantom empty snapshots)
    run()
    assert(GraftTable.load(spark, loc).metadata.snapshots.get.size == 3)
    // replay guard at the commit layer: re-delivering an ALREADY
    // COMMITTED epoch sweeps its staged files and commits nothing
    val queryId = {
      val metaFile = java.nio.file.Paths.get(ckpt, "metadata")
      graft.model.Json.parse(java.nio.file.Files.readString(metaFile))
        .path("id").asText
    }
    val epochDir = java.nio.file.Files.createTempDirectory("sink-replay")
    (900L until 910L).map(i => (i, "gX")).toDF("id", "g")
      .coalesce(1).write.mode("overwrite")
      .parquet(epochDir.resolve("files").toString)
    val rels = {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(epochDir.resolve("files"))
      try ls.iterator().asScala.map(p => s"files/${p.getFileName}")
        .filter(_.endsWith(".parquet")).toSeq
      finally ls.close()
    }
    t2.commitStreamedFiles(epochDir.toString, rels, batchId = 0L,
      streamId = queryId)
    val t3 = GraftTable.load(spark, loc)
    assert(t3.metadata.snapshots.get.size == 3,
      "replayed epoch must not double-commit")
    assert(t3.scan().filter(col("g") === "gX").count() == 0)
    assert(!java.nio.file.Files.exists(epochDir),
      "replayed epoch's staged files must be swept")
  }

  test("DSv2 sink caps per-task open writers: >64 partition tuples in " +
      "one task evict LRU, reopen fresh files, commit exactly") {
    import spark.implicits._
    import graft.table.GraftTable
    import graft.connector.GraftStreamTaskWriter
    import org.apache.spark.sql.types._
    val nTuples = 200
    require(nTuples > GraftStreamTaskWriter.MaxOpenWriters)
    // row order is the stress: one pass through 200 tuples GROUPED (so
    // the working set stays small and finished tuples age out), then a
    // revisit of the first 10 tuples long after their writers were
    // evicted — each revisit must reopen a FRESH file, never a handle
    val pass1 = (0 until nTuples).flatMap(g =>
      (0 until 20).map(r => ((g * 20 + r).toLong, f"g$g%03d")))
    val revisit = (0 until 10).flatMap(g =>
      (0 until 5).map(r => ((100000 + g * 5 + r).toLong, f"g$g%03d")))
    val rows = pass1 ++ revisit
    val srcDir = java.nio.file.Files.createTempDirectory("cap-src")
    rows.toDF("id", "g").coalesce(1).write.mode("overwrite")
      .parquet(srcDir.resolve("f").toString)
    val srcSchema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType)))
    val loc = java.nio.file.Files
      .createTempDirectory("cap-t").toString + "/t"
    GraftTable.create(spark, loc, srcSchema,
      partitionBy = Seq(("g", graft.model.TIdentity, "g_p")))
    val ckpt = java.nio.file.Files
      .createTempDirectory("cap-ckpt").toString
    GraftStreamTaskWriter.maxOpenGauge.set(0)
    val q = spark.readStream.schema(srcSchema)
      .parquet(srcDir.resolve("f").toString) // one small file → one task
      .writeStream.format("graft").option("path", loc)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the gauge saw real pressure AND never exceeded the cap
    val peak = GraftStreamTaskWriter.maxOpenGauge.get
    assert(peak == GraftStreamTaskWriter.MaxOpenWriters,
      s"expected the writer pool pinned at the cap under $nTuples " +
        s"tuples, peak open was $peak")
    val t = GraftTable.load(spark, loc)
    val files = t.planFiles()
    // every tuple has a file; the 10 revisited tuples have a SECOND one
    assert(files.size == nTuples + 10,
      s"expected ${nTuples + 10} files (one per tuple + one per " +
        s"evicted-then-revisited tuple), got ${files.size}")
    assert(t.scan().count() == rows.size)
    assert(t.scan().select("id").distinct().count() == rows.size)
    // revisited tuples hold both their files' rows
    assert(t.scan().filter(col("g") === "g005").count() == 25)
    assert(t.scan().filter(col("g") === "g150").count() == 20)
  }

  test("writeStream.toTable streams into a graft catalog table") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("sink-cat-wh")
    spark.conf.set("spark.sql.catalog.gsink", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsink.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsink.db")
    spark.sql("CREATE TABLE gsink.db.s (id BIGINT, g STRING)")
    val srcDir = java.nio.file.Files.createTempDirectory("sink-cat-src")
    (0L until 40L).map(i => (i, s"g${i % 2}")).toDF("id", "g")
      .coalesce(1).write.mode("overwrite")
      .parquet(srcDir.resolve("f").toString)
    val ckpt = java.nio.file.Files
      .createTempDirectory("sink-cat-ckpt").toString
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType))))
      .parquet(srcDir.resolve("f").toString)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("gsink.db.s")
    q.awaitTermination()
    assert(spark.sql("SELECT COUNT(*) FROM gsink.db.s").head.getLong(0)
      == 40L)
    assert(spark.sql("SELECT COUNT(DISTINCT id) FROM gsink.db.s")
      .head.getLong(0) == 40L)
  }

  test("streaming minhash dedup equals the batch keep-first rule") {
    import spark.implicits._
    import graft.operators.Dedup
    val baseA = ("the quick brown fox jumps over the lazy dog " +
      "and runs far away across the wide green field today ") * 3
    val baseB = ("deep rivers carve slow canyons through ancient " +
      "stone while silent owls watch from hollow midnight trees ") * 3
    val docs = Seq(
      (1L, "a", baseA + "alpha beta gamma"),
      (2L, "a", "completely different words entirely here nothing " +
        "shared with any other document one two three four five six"),
      (3L, "b", baseB + "delta epsilon zeta"),
      (5L, "a", baseA + "alpha beta gamma extra"), // near-dup of 1
      (7L, "b", baseB + "delta epsilon zeta tail"), // near-dup of 3
      (9L, "c", baseA + "alpha beta gamma")) // exact text of 1
      .toDF("doc_id", "source", "text")
    // stage as three doc_id-ordered files: {1,2} -> {3,5} -> {7,9}, so
    // near-dup pairs SPAN micro-batches (5 vs 1, 7 vs 3, 9 vs 1)
    val staging = java.nio.file.Files.createTempDirectory("mh-spec")
    Seq(col("doc_id") <= 2, col("doc_id") > 2 && col("doc_id") <= 5,
      col("doc_id") > 5).zipWithIndex.foreach { case (p, i) =>
      import scala.jdk.CollectionConverters._
      val tmp = staging.resolve(s"tmp-$i")
      docs.filter(p).coalesce(1).write.parquet(tmp.toString)
      val ls = java.nio.file.Files.list(tmp)
      val src = try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
      val dst = staging.resolve(s"docs-$i.parquet")
      java.nio.file.Files.move(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000L + i * 60000L))
    }
    val root = java.nio.file.Files
      .createTempDirectory("mh-spec-out").toString
    graft.streaming.StreamingQueries
      .runMinhashDedupStream(spark, staging.toString, root)
    val kept = graft.table.GraftTable
      .load(spark, s"$root/db/kept").scan()
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // batch expectation from the SAME pair machinery: drop every doc
    // that pairs with a smaller id
    val dropped = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    val expected = Set(1L, 2L, 3L, 5L, 7L, 9L) -- dropped
    assert(kept == expected, s"kept $kept != expected $expected")
    assert(Set(1L, 2L, 3L).subsetOf(kept) &&
      Set(5L, 7L, 9L).intersect(kept).isEmpty,
      s"planted near-dups not dropped: $kept")

    // the accumulated index must NEVER re-shuffle: rebuild the probe
    // joins over the drained idx/seen catalog tables with a synthetic
    // next batch and require zero ShuffleExchange above any graft scan
    // in BOTH plans (the batch side alone exchanges into the tables'
    // KeyGroupedPartitioning)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val sq = graft.streaming.StreamingQueries
    val cat = sq.dedupCatalog(spark, root)
    val saved = sq.dedupSpjConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    sq.dedupSpjConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sigs = docs.limit(2)
        .select(col("doc_id") + 100L as "doc_id", col("source"),
          Dedup.shingleHashes(col("text"), 3).as("sh"))
        .withColumn("sig", Dedup.minhashSigFromHashes(col("sh"), 64))
      val banded = sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(15)),
          j => xxhash64(j, slice(col("sig"), j * 4 + 1, lit(4)))))
          .as("band_hash"))
      val (cand, drop2) = sq.minhashProbeJoins(
        spark.table(s"$cat.db.idx"), spark.table(s"$cat.db.seen"),
        banded, sigs)
      // a graft scan feeding an Exchange WITHOUT an intervening join or
      // aggregate means the raw index rows themselves were re-shuffled
      // (an Exchange above a join's output only moves the candidate
      // pairs, which is the intended O(cand) shape)
      def rawScanFeeds(p: SparkPlan): Boolean = p match {
        case b: BatchScanExec => b.toString.contains("graft")
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _: org.apache.spark.sql.execution.aggregate
          .BaseAggregateExec => false
        case other => other.children.exists(rawScanFeeds)
      }
      def indexShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
        p.collect {
          case e: ShuffleExchangeExec if rawScanFeeds(e.child) => e
        }
      val candPlan = cand.queryExecution.executedPlan
      assert(indexShuffles(candPlan).isEmpty,
        s"idx scan re-shuffled in the candidate join:\n$candPlan")
      drop2.count() // materialize so the verify plan is the executed one
      val dropPlan = drop2.queryExecution.executedPlan
      assert(indexShuffles(dropPlan).isEmpty,
        s"seen scan re-shuffled in the verify join:\n$dropPlan")
      // and the SPJ actually engaged: the batch side DID exchange into
      // the tables' bucket layout (otherwise the zero-shuffle reading
      // would just mean the join degenerated)
      assert(candPlan.toString.contains("keygroupedpartitioning"),
        s"candidate join is not storage-partitioned:\n$candPlan")
      cand.unpersist()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sessionizer merges late in-watermark events without splitting") {
    import graft.streaming.{SessState, SessionOut, Sessionizer}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def ev(sec: Long) = (7L, new java.sql.Timestamp(sec * 1000L))
    def stateOf(wmSec: Long, ss: SessionOut*) = TestGroupState.create[SessState](
      if (ss.isEmpty) Optional.empty[SessState]() else Optional.of(SessState(ss)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(wmSec * 1000L)), false)
    // open session [10000,10600]; batch mixes a late event inside the
    // span, a late bridge just before the start, and an on-time extension
    val st = stateOf(5000L, SessionOut(7L, 10000L, 10600L, 3L))
    val out = Sessionizer.apply(7L,
      Iterator(ev(10300L), ev(9000L), ev(11000L)), st).toSeq
    assert(out.isEmpty, s"no session is final at wm=5000, got $out")
    assert(st.get == SessState(Seq(SessionOut(7L, 9000L, 11000L, 6L))))
    // an event more than a gap before the open session forms its own
    // earlier session — HELD in state (not emitted) until the watermark
    // passes its end+gap: an admissible late event could still extend it
    val st2 = stateOf(5000L, SessionOut(7L, 10000L, 10600L, 3L))
    val out2 = Sessionizer.apply(7L, Iterator(ev(7000L), ev(10700L)), st2).toSeq
    assert(out2.isEmpty, s"pre-session is not final at wm=5000, got $out2")
    assert(st2.get == SessState(Seq(
      SessionOut(7L, 7000L, 7000L, 1L), SessionOut(7L, 10000L, 10700L, 4L))))
    // a later late event within gap of the held pre-session EXTENDS it —
    // the previous emit-immediately behavior fragmented exactly here
    val st3 = stateOf(5000L, SessionOut(7L, 7000L, 7000L, 1L),
      SessionOut(7L, 10000L, 10700L, 4L))
    val out3 = Sessionizer.apply(7L, Iterator(ev(8000L)), st3).toSeq
    assert(out3.isEmpty)
    assert(st3.get == SessState(Seq(
      SessionOut(7L, 7000L, 8000L, 2L), SessionOut(7L, 10000L, 10700L, 4L))))
    // once the watermark passes end+gap the pre-session emits exactly
    // once; the still-open trailing session stays
    val st4 = stateOf(11000L, SessionOut(7L, 7000L, 8000L, 2L),
      SessionOut(7L, 10000L, 10700L, 4L))
    val out4 = Sessionizer.apply(7L, Iterator.empty, st4).toSeq
    assert(out4 == Seq(SessionOut(7L, 7000L, 8000L, 2L)))
    assert(st4.get == SessState(Seq(SessionOut(7L, 10000L, 10700L, 4L))))
    // a bridging late event can MERGE two held sessions into one
    val st5 = stateOf(5000L, SessionOut(7L, 7000L, 7000L, 1L),
      SessionOut(7L, 10000L, 10700L, 4L))
    val out5 = Sessionizer.apply(7L, Iterator(ev(8500L)), st5).toSeq
    assert(out5.isEmpty)
    assert(st5.get == SessState(Seq(SessionOut(7L, 7000L, 10700L, 6L))))
  }

  test("media codec seam: registered codecs take over their formats") {
    import graft.operators.Multimodal
    import Multimodal.MediaCodec
    object FixedPng extends Multimodal.MediaCodec {
      val formats = Set("png")
      def decodeFeatures(p: Array[Byte]): (Double, Array[Long]) =
        (42.0, Array.fill(16)(7L))
    }
    try {
      MediaCodec.register(FixedPng)
      val png = Multimodal.decode(1L, "png", Multimodal.pngHeader(10, 10), MediaCodec.snapshot())
      assert(png.byte_entropy == 42.0 && png.histogram.forall(_ == 7L))
      // non-matching formats still fall back to the byte-stats stub
      val txt = Multimodal.decode(2L, "txt", "hello".getBytes, MediaCodec.snapshot())
      assert(txt.byte_entropy != 42.0)
      assert(txt.histogram.sum == 5L)
    } finally MediaCodec.clear()
    // with nothing registered the fallback serves every format
    val plain = Multimodal.decode(3L, "png", Multimodal.pngHeader(10, 10), MediaCodec.snapshot())
    assert(plain.byte_entropy != 42.0)
  }

  test("format sniffer: real magic bytes drive the per-format branch") {
    import graft.operators.Multimodal
    // genuine header bytes for each container
    val jpegSof0 = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x01, 0x00, 0x02, 0x00, 0x03, 0x01)
      .map(_.toByte)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xf0, 0x00).map(_.toByte) // 320x240 LE
    val webp = "RIFF".getBytes ++ Array.fill(4)(0.toByte) ++ "WEBP".getBytes
    val wav = "RIFF".getBytes ++ Array.fill(4)(0.toByte) ++ "WAVE".getBytes
    val mp4 = Array.fill(4)(0.toByte) ++ "ftypisom".getBytes
    val pdf = "%PDF-1.7".getBytes
    assert(Multimodal.sniffFormat(Multimodal.pngHeader(640, 480)) == "png")
    assert(Multimodal.sniffFormat(jpegSof0) == "jpeg")
    assert(Multimodal.sniffFormat(gif) == "gif")
    assert(Multimodal.sniffFormat(webp) == "webp")
    assert(Multimodal.sniffFormat(wav) == "wav")
    assert(Multimodal.sniffFormat(mp4) == "mp4")
    assert(Multimodal.sniffFormat(pdf) == "pdf")
    assert(Multimodal.sniffFormat("hello world".getBytes) == "unknown")
    // header parsers pull real dimensions per format
    val png = Multimodal.decode(1L, "png", Multimodal.pngHeader(123, 77), Nil)
    assert(png.detected_format == "png" &&
      png.width.contains(123L) && png.height.contains(77L))
    val jp = Multimodal.decode(2L, "jpeg", jpegSof0, Nil)
    assert(jp.detected_format == "jpeg" &&
      jp.width.contains(512L) && jp.height.contains(256L))
    val gf = Multimodal.decode(3L, "gif", gif, Nil)
    assert(gf.detected_format == "gif" &&
      gf.width.contains(320L) && gf.height.contains(240L))
    // declared format is carried but never trusted
    val lying = Multimodal.decode(4L, "png", "plain text".getBytes, Nil)
    assert(lying.format == "png" && lying.detected_format == "unknown")
    // 0xff fill bytes between segments must not derail the SOF walk
    val jpegFill = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x0b,
      0x08, 0x00, 0x40, 0x00, 0x20, 0x03).map(_.toByte)
    val jf = Multimodal.decode(5L, "jpeg", jpegFill, Nil)
    assert(jf.detected_format == "jpeg" &&
      jf.width.contains(32L) && jf.height.contains(64L))
  }
}
