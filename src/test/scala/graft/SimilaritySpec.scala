package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine matches hand-computed values") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f), 1.0 / math.sqrt(2.0)))
      .toDF("a", "b", "expected")
    df.select((abs(Similarity.cosine(col("a"), col("b")) -
        col("expected")) < 1e-9).as("ok"))
      .collect().foreach(r => assert(r.getBoolean(0)))
  }

  test("brute-force top-k is exact against a driver-side computation") {
    val emb = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val data = emb.collect().map(r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val spark2 = Registry.byName("d_embed_cosine_topk")
      .fn(spark, "/root/testdata/sf0.001").collect()
    val got = spark2.filter(_.getAs[Long]("q_id") == 0L)
      .map(_.getAs[Long]("neighbor_id")).toSeq
    val expected = data.filter(_._1 != 0L).toSeq
      .map { case (id, v) => (id, cos(data(0L), v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(got == expected)
  }

  test("registered ANN queries: one row per twin base, top-1 is the twin") {
    Seq("d_ann_lsh", "d_ann_ivf", "d_ann_pq", "d_ann_ivfpq").foreach { q =>
      val out = Registry.byName(q)
        .fn(spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("neighbor_id"))
      assert(out.map(_._1).toSeq.sorted == (0L until 70L by 7L).toSeq,
        s"$q: expected one row per twin base, got ${out.map(_._1).toSeq}")
      out.foreach { case (qid, n) =>
        assert(n == qid + 1000000000L, s"$q: top-1 of $qid is $n, not its twin")
      }
    }
  }

  test("ANN recall >= 0.8 on planted near-duplicates vs brute force") {
    val base = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = Similarity.withPlantedTwins(base, "vec_id", "embedding", 1)
    // each original vector queries the corpus; its twin (cosine ~0.9999)
    // is the true top-1 — brute force would always return it
    val q = base.limit(100).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    val hits = Similarity.annTopK(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1, tables = 8, planes = 12, dims = 64, cap = 1024)
      .filter(col("neighbor_id") === col("q_id") + 1000000000L)
      .count()
    assert(hits >= 80L, s"ANN found $hits/100 planted twins")
    // the dedup flavor recovers the planted pairs through the same tables
    val pairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.95, tables = 8, planes = 12, dims = 64, cap = 1024)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val planted = base.count()
    val recovered = pairs.count { case (a, b) => b == a + 1000000000L }
    assert(recovered >= (planted * 8) / 10,
      s"dedup recovered $recovered of $planted planted pairs")
  }

  test("IVF ANN recall >= 0.8 on planted twins with corpus-scaled parameters") {
    val base = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = Similarity.withPlantedTwins(base, "vec_id", "embedding", 1)
    val q = base.limit(100).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    // auto parameters: cells ≈ √N, scaled nprobe, capped cells
    val hits = Similarity.annTopKIvf(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1)
      .filter(col("neighbor_id") === col("q_id") + 1000000000L)
      .count()
    assert(hits >= 80L, s"IVF found $hits/100 planted twins")
    // the quantizer is deterministic and every vector lands in one cell
    val cents = Similarity.trainIvf(corpus, "vec_id", "embedding", 16)
    val cents2 = Similarity.trainIvf(corpus, "vec_id", "embedding", 16)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
    assert(cents.length == 16)
  }

  test("PQ ANN finds planted twins and codebooks are deterministic") {
    val base = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = Similarity.withPlantedTwins(base, "vec_id", "embedding", 1)
    val q = base.limit(100).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    val hits = Similarity.annTopKPq(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1)
      .filter(col("neighbor_id") === col("q_id") + 1000000000L)
      .count()
    assert(hits >= 80L, s"PQ found $hits/100 planted twins")
    // codebooks deterministic; codes compress 64 floats to 8 small ids
    val cb = Similarity.trainPq(corpus, "vec_id", "embedding", 8, 16)
    val cb2 = Similarity.trainPq(corpus, "vec_id", "embedding", 8, 16)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
    val row = codes.head()
    val code = row.getAs[scala.collection.Seq[Int]]("code")
    assert(code.length == 8 && code.forall(c => c >= 0 && c < 16))
  }

  test("IVFADC finds planted twins with the scan bounded to probed cells") {
    val base = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = Similarity.withPlantedTwins(base, "vec_id", "embedding", 1)
    val q = base.limit(100).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    val ann = Similarity.annTopKIvfPq(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1, nprobe = 8)
    val hits = ann
      .filter(col("neighbor_id") === col("q_id") + 1000000000L)
      .count()
    assert(hits >= 80L, s"IVFADC found $hits/100 planted twins")
    // the plan must NOT contain the exhaustive per-query scan shape: the
    // shortlist join is an equi-join on cell, never a cross join of
    // query tables against every code
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "IVFADC plan fell back to a cartesian scan")
    // determinism across runs (models train on id-ordered samples)
    val again = Similarity.annTopKIvfPq(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1, nprobe = 8)
    assert(ann.exceptAll(again).isEmpty && again.exceptAll(ann).isEmpty)
  }

  test("IVF per-cell cap bounds candidates under a clustered corpus") {
    import spark.implicits._
    // 5000 identical vectors collapse into ONE cell — uncapped, every
    // query probing it would verify the whole corpus
    val vec = Seq.fill(64)(0.5f)
    val corpus = spark.range(5000).toDF("vec_id")
      .withColumn("embedding", typedLit(vec))
    val cents = Similarity.trainIvf(corpus, "vec_id", "embedding", 4)
    val capped = Similarity.ivfAssign(corpus, "vec_id", "embedding",
      cents, cellCap = 100)
    val maxCell = capped.groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell <= 100L, s"cell of $maxCell exceeds cap 100")
  }

  test("ANN outputs carry a recall column pinned >= 0.8 on planted twins") {
    val base = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = Similarity.withPlantedTwins(base, "vec_id", "embedding", 1)
    val q = base.limit(50).select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    val ann = Similarity.annTopK(corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1, tables = 8, planes = 12, dims = 64, cap = 1024)
    val out = Similarity.withRecall(ann, corpus, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 1)
    val meanRecall = out.select("q_id", "recall").distinct()
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(meanRecall >= 0.8, s"mean recall@1 $meanRecall below 0.8")
  }

  test("per-bucket cap bounds candidate generation under adversarial skew") {
    import spark.implicits._
    // 5000 identical vectors: every table hashes them to ONE bucket —
    // uncapped candidate pairs would be C(5000,2) ≈ 12.5M per table
    val vec = Seq.fill(64)(0.5f)
    val corpus = spark.range(5000).toDF("vec_id")
      .withColumn("embedding", typedLit(vec))
    val cap = 100
    val ids = Similarity.bucketedIds(corpus, "vec_id", "embedding",
      tables = 8, planes = 12, dims = 64, cap = cap)
    val maxGroup = ids.groupBy("tbl", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxGroup <= cap, s"bucket group of $maxGroup exceeds cap $cap")
    // candidate pair volume is capped at tables * C(cap, 2), not C(N, 2)
    val pairCount = Similarity.nearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.0, tables = 8, planes = 12, dims = 64, cap = cap).count()
    assert(pairCount <= 8L * cap * (cap - 1) / 2)
  }

  test("LSH buckets are deterministic, in range, table-independent") {
    val emb = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b"))
      .collect().map(_.getInt(0))
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), 8, 64).as("b"))
      .collect().map(_.getInt(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
    assert(b1.distinct.length > 10) // spread across buckets
    // a different table uses an independent hash family
    val t1 = emb.select(Similarity.lshBucket(col("embedding"), 8, 64, 1).as("b"))
      .collect().map(_.getInt(0))
    assert(t1.toSeq != b1.toSeq)
  }

  test("distributed k-means recovers planted clusters") {
    import spark.implicits._
    // 4 orthogonal prototypes + small deterministic noise: k-means must
    // reassemble the generating groups (purity 1.0 on this separation)
    val dims = 16
    val protos = Array.tabulate(4, dims)((c, d) =>
      if (d == c * 4) 1.0f else 0.0f)
    val data = (0L until 400L).map { id =>
      val c = (id % 4).toInt
      val noise = Array.tabulate(dims)(d =>
        (((id * 31 + d * 7) % 13).toFloat - 6f) / 100f)
      (id, protos(c).zip(noise).map { case (p, n) => p + n })
    }
    val df = data.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding", 4, iters = 5)
    val assigned = Similarity
      .kmeansAssign(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.size == 400)
    // every generating group lands in ONE cluster, all groups distinct
    val byGroup = (0 until 4).map(g =>
      (0L until 400L).filter(_ % 4 == g).map(assigned).distinct)
    assert(byGroup.forall(_.size == 1), s"split groups: $byGroup")
    assert(byGroup.flatten.distinct.size == 4, s"merged groups: $byGroup")
  }

  test("k-means init never duplicates a centroid on zero vectors") {
    import spark.implicits._
    // one all-zero embedding (failed/padded row): its self-dot is 0,
    // so without an explicit used-mask the farthest-point init would
    // re-pick it every iteration and collapse the centroid set
    val dims = 8
    val data = (0L until 30L).map { id =>
      if (id == 5L) (id, Array.fill(dims)(0.0f))
      else (id, Array.tabulate(dims)(d =>
        (((id * 17 + d * 3) % 11).toFloat - 5f) / 10f))
    }
    val df = data.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, "vec_id", "embedding", 6, iters = 2)
    assert(cents.length == 6)
    assert(cents.map(_.toSeq).distinct.length == 6,
      "duplicate centroids chosen by init")
  }

  test("trainIvf trains on the full corpus, not a driver sample") {
    import spark.implicits._
    // structure the OLD 2000-row driver sample could never see: ids
    // 0..2999 hold three clusters, ids 3000..3999 a fourth — seeds all
    // come from the id-ordered head, so only distributed Lloyd over the
    // whole corpus can pull a centroid to the late cluster
    val dims = 16
    val protos = Array.tabulate(4, dims)((c, d) =>
      if (d == c * 4) 1.0f else 0.0f)
    val data = (0L until 4000L).map { id =>
      val c = if (id < 3000L) (id % 3).toInt else 3
      val noise = Array.tabulate(dims)(d =>
        (((id * 31 + d * 7) % 13).toFloat - 6f) / 100f)
      (id, protos(c).zip(noise).map { case (p, n) => p + n })
    }
    val df = data.toDF("vec_id", "embedding").repartition(8)
    val cents = Similarity.trainIvf(df, "vec_id", "embedding", k = 4)
    val late = protos(3).map(_.toDouble)
    val bestDot = cents.map { ct =>
      ct.zip(late).map { case (a, b) => a * b }.sum /
        math.sqrt(ct.map(x => x * x).sum)
    }.max
    assert(bestDot > 0.9,
      f"no centroid near the late cluster (best cosine $bestDot%.3f) — " +
        "quantizer trained on a head sample only")
  }

  test("trainIvf cost is O(iters) distributed aggregates at k >= 1000") {
    import spark.implicits._
    val dims = 8
    val df = (0L until 3000L).map { id =>
      (id, Array.tabulate(dims)(d =>
        (((id * 17 + d * 3) % 29).toFloat - 14f) / 14f))
    }.toDF("vec_id", "embedding").repartition(8)
    df.count() // materialize plan-side warmup outside the counted window
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val iters = 3
      val cents = Similarity.trainIvf(df, "vec_id", "embedding", k = 1000,
        iters = iters)
      assert(cents.length == 1000)
      // let the async listener bus drain before reading the counter
      val deadline = System.nanoTime() + 5000000000L
      var last = -1
      while (jobs != last && System.nanoTime() < deadline) {
        last = jobs; Thread.sleep(100)
      }
      // one seed collect + one aggregate per iteration (an aggregate may
      // plan as a couple of jobs under AQE) — NEVER O(k) or O(N) jobs,
      // and no k×N driver work hiding behind a small job count
      assert(jobs <= 2 + 3 * iters, s"$jobs jobs for $iters Lloyd iters")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("k-means is deterministic and improves cohesion over init") {
    val emb = Tables.tbl(spark, "/root/testdata/sf0.001", "embeddings")
    val c1 = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, iters = 4)
    val c2 = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, iters = 4)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val c0 = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, iters = 0)
    def cohesion(cs: Array[Array[Double]]): Double =
      Similarity.kmeansAssign(emb, "vec_id", "embedding", cs)
        .agg(avg("sim")).head.getDouble(0)
    assert(cohesion(c1) >= cohesion(c0) - 1e-9,
      "Lloyd iterations must not reduce mean cosine to centroid")
    // every vector is assigned exactly once
    val total = Similarity.kmeansAssign(emb, "vec_id", "embedding", c1).count()
    assert(total == emb.count())
  }
}
