package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.4 similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * d_embed_cosine_topk is the exact brute-force baseline: the (small)
  * query set is broadcast, so the scan over the corpus is map-only — the
  * cost is O(Q×N) compute with NO shuffle of the corpus, which is the
  * right brute-force shape at scale but still linear in N.
  *
  * d_ann_lsh / d_dedup_embed are the scale path: MULTI-TABLE
  * random-hyperplane LSH (L independent tables of P sign bits each, the
  * same banding architecture as MinHash dedup). Candidate generation is
  * id-only — vectors are fetched back by key AFTER the bucket join — and
  * every (table, bucket) group is capped, so a skewed bucket (e.g. a
  * constant-vector attack) bounds work instead of going quadratic.
  * Per-item work is O(L·N/2^P) with a hard per-bucket ceiling; recall
  * comes from table count, precision from planes per table. IVF (k-means
  * coarse quantizer) is the next refinement at 100 TB.
  */
object Similarity {

  /** Exact cosine similarity between two float-array columns, computed in
    * double precision left-to-right (deterministic across engines).
    */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val ad = d(a); val bd = d(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** LSH bucket id for one table: sign bits of the vector against that
    * table's hyperplanes. Backed by the native codegen expression —
    * interpreted HOF pipelines pay per-element lambda dispatch on 25M+
    * multiply-adds at sf0.1.
    */
  def lshBucket(v: Column, planes: Int, dims: Int, table: Int = 0): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.HyperplaneLshBucket(
        org.apache.spark.sql.graft.Bridge.expression(v), planes, dims, table))

  /** One row per (table, item): `tbl`, `bucket`, `id`. Single corpus scan
    * (posexplode over the L per-table signatures, all codegen), then each
    * (table, bucket) group is capped at `cap` members (deterministic
    * keep-lowest-id) — the hard bound that keeps a pathological bucket
    * from turning candidate generation quadratic.
    */
  def bucketedIds(corpus: DataFrame, idCol: String, vecCol: String,
      tables: Int, planes: Int, dims: Int, cap: Int): DataFrame = {
    val buckets = array((0 until tables).map(t =>
      lshBucket(col(vecCol), planes, dims, t)): _*)
    val exploded = corpus.select(col(idCol).as("id"), posexplode(buckets))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val w = Window.partitionBy("tbl", "bucket").orderBy("id")
    exploded.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** All pairs with cosine ≥ threshold, candidates from the multi-table
    * bucket self-join (never all-pairs). Output: id_a < id_b, sim.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int, planes: Int, dims: Int,
      cap: Int): DataFrame = {
    val ids = bucketedIds(corpus, idCol, vecCol, tables, planes, dims, cap)
    val a = ids.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val b = ids.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val vb = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Approximate top-k: each query probes its own bucket in every table;
    * candidate ids union across tables, verified by exact cosine. The
    * query side is broadcast, the corpus is never shuffled.
    */
  def annTopK(corpus: DataFrame, queriesDf: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, k: Int,
      tables: Int, planes: Int, dims: Int, cap: Int): DataFrame = {
    val corpusIds = bucketedIds(corpus, idCol, vecCol, tables, planes, dims, cap)
    val qBuckets = array((0 until tables).map(t =>
      lshBucket(col(qVecCol), planes, dims, t)): _*)
    val qIds = queriesDf.select(col(qIdCol).as("q_id"), posexplode(qBuckets))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val cand = broadcast(qIds).join(corpusIds, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id").distinct()
    val qVecs = queriesDf.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("q_vec"))
    val cVecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    broadcast(cand.join(broadcast(qVecs), "q_id")).join(cVecs, "id")
      .withColumn("sim", cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  // ------------------------------------------------------------- IVF ----

  /** Coarse quantizer for IVF: K centroids on the unit sphere. Seeding
    * is a deterministic spread over an id-ordered bounded sample (seeds
    * only — O(max(k, sampleN)) driver rows); refinement is the shared
    * DISTRIBUTED Lloyd step ([[lloydIterate]]), so the quantizer trains
    * on the FULL corpus — the old fixed 2000-row driver sample
    * under-trained it once k ≈ √N grew past a few hundred cells (at
    * 100 TB the model itself needs the distributed path). Driver memory
    * stays the model: K×dims doubles.
    */
  def trainIvf(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      sampleN: Int = 2000, iters: Int = 5): Array[Array[Double]] = {
    val seedN = math.max(k, sampleN)
    val sample = corpus.select(idCol, vecCol).orderBy(idCol).limit(seedN)
      .collect().map(r => normalizeVec(
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val init = Array.tabulate(k)(i => sample(i * sample.length / k))
    lloydIterate(corpus, vecCol, init, iters, normalizeBeforeSum = true)
  }

  /** The distributed Lloyd refinement shared by [[trainIvf]] and
    * [[kmeansFit]]: per iteration, assignment is map-only against
    * broadcast centroids and the new means arrive via ONE
    * partition-pre-aggregated shuffle — each task folds its rows into a
    * local k×D sum table and emits at most k rows, so shuffle volume is
    * O(partitions × k) and only K×D doubles ever reach the driver,
    * never vectors. Empty cells keep their centroid. `normalizeBeforeSum`
    * preserves the two callers' historical variants (IVF sums unit
    * vectors; k-means sums raw vectors, both renormalize the mean —
    * equivalent up to per-vector magnitude weighting).
    *
    * DETERMINISTIC: cross-partition partials merge in partition-id
    * order (mapGroups buffers a cell's ≤ numPartitions contributions —
    * tiny vs the vectors themselves), so float-sum order never depends
    * on task completion order.
    */
  private[operators] def lloydIterate(corpus: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int,
      normalizeBeforeSum: Boolean): Array[Array[Double]] = {
    val s = corpus.sparkSession
    import s.implicits._
    var cents = init
    val dims = init(0).length
    val k = init.length
    // the loop re-reads the SAME projected vectors `iters` times —
    // persist them for the training's duration (in-run only; the
    // standard iterative-training shape, spills at scale) instead of
    // re-scanning and re-decoding the corpus parquet every iteration
    val vecs = corpus.select(col(vecCol)).as[Array[Float]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try for (_ <- 1 to iters) {
      val bc = s.sparkContext.broadcast(cents)
      val agg = vecs
        .mapPartitions { it =>
          val cs = bc.value
          val sums = Array.ofDim[Double](k, dims)
          val counts = new Array[Long](k)
          it.foreach { raw =>
            val u = normalizeVec(raw.map(_.toDouble))
            val c = nearestCell(u, cs)
            val v = if (normalizeBeforeSum) u
              else raw.map(_.toDouble)
            val sc = sums(c)
            var i = 0
            val n = math.min(dims, v.length)
            while (i < n) { sc(i) += v(i); i += 1 }
            counts(c) += 1
          }
          val pid = org.apache.spark.TaskContext.getPartitionId()
          Iterator.range(0, k).filter(counts(_) > 0L)
            .map(c => (c, pid, sums(c), counts(c)))
        }
        .groupByKey(_._1)
        .mapGroups { (cell, it) =>
          val parts = it.toArray.sortBy(_._2)
          val m = new Array[Double](dims)
          var n = 0L
          parts.foreach { p =>
            var i = 0
            while (i < dims) { m(i) += p._3(i); i += 1 }
            n += p._4
          }
          (cell, m, n)
        }
        .collect()
      val next = cents.map(_.clone())
      agg.foreach { case (c, sum, n) =>
        if (n > 0L) next(c) = normalizeVec(sum)
      }
      cents = next
      bc.destroy()
    } finally vecs.unpersist()
    cents
  }

  private def normalizeVec(v: Array[Double]): Array[Double] = {
    var n = 0.0
    v.foreach(x => n += x * x)
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  /** Index of the centroid with the highest dot product (unit vectors →
    * cosine order). Tight JVM loop, runs inside mapPartitions.
    */
  def nearestCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { dot += v(i) * ct(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest cells for a query vector (descending dot). */
  def nearestCells(v: Array[Double], cents: Array[Array[Double]],
      nprobe: Int): Seq[Int] =
    cents.indices.map { c =>
      val ct = cents(c)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { dot += v(i) * ct(i); i += 1 }
      c -> dot
    }.sortBy(-_._2).take(nprobe).map(_._1)

  /** Cell assignment for IVF: map-only (the centroid model broadcasts in
    * the closure), then each cell is CAPPED at `cellCap` members
    * (deterministic keep-lowest-id row_number) — the hard bound that
    * keeps one dense cell (clustered/adversarial corpus) from dominating
    * the candidate join, mirroring the LSH per-bucket cap.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], cellCap: Int): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val assigned = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        (id, nearestCell(normalizeVec(v.map(_.toDouble)), cents))
      }).toDF("id", "cell")
    val w = Window.partitionBy("cell").orderBy("id")
    assigned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cellCap).drop("__rn")
  }

  /** IVF approximate top-k: corpus vectors are assigned to their nearest
    * centroid cell (map-only pass, no shuffle of the corpus); each query
    * probes its `nprobe` nearest cells and verifies candidates by exact
    * cosine. Work per query ≈ nprobe × N/K instead of N — the coarse-
    * quantizer scale path past hyperplane LSH.
    *
    * Parameters SCALE WITH THE CORPUS unless pinned: cells ≈ √N (per-
    * query candidates ≈ nprobe·√N, not N/const), nprobe grows with the
    * cell count, and every cell is capped at ~8× the average cell size —
    * the fixed 16-cell demo parameterization would probe N/4 of a 100 TB
    * corpus per query and let one dense cell dominate the join.
    */
  def annTopKIvf(corpus: DataFrame, queriesDf: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, k: Int,
      cells: Int = 0, nprobe: Int = 0, cellCap: Int = 0): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    // the corpus count feeds only the defaulted parameters — callers
    // pinning all three skip the extra pass entirely
    lazy val n = corpus.count()
    val nCells =
      if (cells > 0) cells
      else math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nProbe = if (nprobe > 0) nprobe else math.max(4, nCells / 8)
    val nCap =
      if (cellCap > 0) cellCap
      else math.max(64, 8 * math.ceil(n.toDouble / nCells).toInt)
    val cents = trainIvf(corpus, idCol, vecCol, nCells,
      sampleN = math.max(2000, 20 * nCells))
    val corpusCells = ivfAssign(corpus, idCol, vecCol, cents, nCap)
    val qCells = queriesDf
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (qid, v) =>
        nearestCells(normalizeVec(v.map(_.toDouble)), cents, nProbe)
          .map(c => (qid, c))
      }).toDF("q_id", "cell")
    val cand = broadcast(qCells).join(corpusCells, "cell")
      .filter(col("q_id") =!= col("id"))
      .select("q_id", "id").distinct()
    val qVecs = queriesDf.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("q_vec"))
    val cVecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    broadcast(cand.join(broadcast(qVecs), "q_id")).join(cVecs, "id")
      .withColumn("sim", cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Attach per-query recall@k vs the EXACT brute-force top-k as a
    * `recall` column, so the output itself (and any gate reading it)
    * surfaces a recall collapse. The exact side broadcasts the bounded
    * query set over one map-only corpus scan — O(Q×N) compute, no
    * shuffle of the corpus, affordable even at 100 TB for the audit-
    * sized query sets this travels with.
    */
  def withRecall(ann: DataFrame, corpus: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    val exact = broadcast(queriesDf.select(col(qIdCol).as("q_id"),
        col(qVecCol).as("q_vec")))
      .crossJoin(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .filter(col("q_id") =!= col("id"))
      .withColumn("sim", cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("neighbor_id"), lit(1L).as("__hit"))
    val recalls = ann.select("q_id", "neighbor_id")
      .join(exact, Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(round(sum(coalesce(col("__hit"), lit(0L))) / lit(k), 4)
        .as("recall"))
    ann.join(broadcast(recalls), Seq("q_id"), "left")
  }

  // --------------------------------------------------------- k-means ----

  /** FULLY distributed spherical k-means (same [[lloydIterate]] core as
    * trainIvf): per iteration, assignment is map-only against broadcast
    * centroids and the new means come from ONE partition-pre-aggregated
    * shuffle — K×D doubles reach the driver, never vectors. This is the
    * shape that survives 100 TB: driver memory is the model (K×D
    * doubles), executor work is linear per pass, and the iteration count
    * is fixed.
    *
    * Deterministic: a bounded sample (the max(4k, 64) vectors with the
    * lowest xxhash64(id), ties by id) seeds a greedy FARTHEST-POINT
    * init — start from the sample head, then repeatedly add the sample
    * vector whose max cosine to the chosen set is smallest (ties by
    * sample order). On well-separated clusters this picks one seed per
    * cluster, where a plain hash-order pick routinely lands two seeds
    * in one cluster and splits it; driver cost is O(sample × k × D).
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5): Array[Array[Double]] = {
    val s = corpus.sparkSession
    import s.implicits._
    val sample = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(math.max(4 * k, 64))
      .as[(Long, Array[Float])].collect()
      .map(r => normalizeVec(r._2.map(_.toDouble)))
    require(sample.length >= k, s"corpus smaller than k=$k")
    val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
    // explicit used-mask: a chosen vector must never be re-picked. The
    // self-dot usually excludes it (cosine 1.0), but an all-zero vector
    // (failed/padded embedding row) has self-dot 0 and would otherwise
    // be re-chosen every iteration, collapsing the centroid set.
    val used = Array.fill(sample.length)(false)
    used(0) = true
    val maxDot = Array.fill(sample.length)(Double.MinValue)
    while (chosen.size < k) {
      var best = -1
      var bestVal = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        val last = chosen.last
        var dot = 0.0
        var d = 0
        while (d < last.length) { dot += sample(i)(d) * last(d); d += 1 }
        if (dot > maxDot(i)) maxDot(i) = dot
        if (!used(i) && maxDot(i) < bestVal - 1e-12) {
          bestVal = maxDot(i); best = i
        }
        i += 1
      }
      used(best) = true
      chosen += sample(best)
    }
    // refinement: the shared distributed Lloyd step. The old inline
    // shape posexploded every vector into (cell, dim, x) rows before the
    // aggregate — shuffle O(partitions × k × D) scalar rows; the shared
    // step pre-folds per task and shuffles O(partitions × k) array rows.
    lloydIterate(corpus, vecCol, chosen.toArray, iters,
      normalizeBeforeSum = false)
  }

  /** Map-only cluster assignment: (id, cluster, cosine to its centroid). */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          val u = normalizeVec(v.map(_.toDouble))
          val c = nearestCell(u, cs)
          var dot = 0.0
          var i = 0
          while (i < u.length) { dot += u(i) * cs(c)(i); i += 1 }
          (id, c, dot)
        }
      }.toDF("id", "cluster", "sim")
  }

  // -------------------------------------------- product quantization ----

  /** Per-subspace PQ codebooks: the embedding splits into `m` contiguous
    * subvectors, each quantized against its own `k` centroids fit by
    * Lloyd iterations over a bounded driver-side sample (the offline
    * training step; the whole model is m×k×(d/m) doubles). Vectors are
    * normalized FIRST, so PQ L2 distance ranks like cosine.
    */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, sampleN: Int = 2000, iters: Int = 10)
      : Array[Array[Array[Double]]] = {
    val sample = corpus.select(idCol, vecCol).orderBy(idCol).limit(sampleN)
      .collect().map(r => normalizeVec(
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val d = sample(0).length
    require(d % m == 0, s"dims $d not divisible by m=$m")
    val dsub = d / m
    Array.tabulate(m) { sub =>
      val vecs = sample.map(_.slice(sub * dsub, (sub + 1) * dsub))
      var cents = Array.tabulate(k)(i => vecs(i * vecs.length / k))
      for (_ <- 1 to iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        vecs.foreach { v =>
          val c = nearestSub(v, cents)
          val s = sums(c)
          var i = 0
          while (i < dsub) { s(i) += v(i); i += 1 }
          counts(c) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0L) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
  }

  /** Index of the L2-nearest subspace centroid (tight JVM loop). */
  private def nearestSub(v: Array[Double],
      cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d2 = 0.0
      var i = 0
      while (i < v.length) { val x = v(i) - ct(i); d2 += x * x; i += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Map-only PQ encoding: each vector becomes `m` small centroid ids —
    * the stored index is m bytes/vector, ~(4·d/m)× smaller than the
    * float vectors, which is the reason PQ survives RAM at 100 TB.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(codebooks)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        val m = cb.length
        it.map { case (id, v) =>
          val u = normalizeVec(v.map(_.toDouble))
          val dsub = u.length / m
          (id, Array.tabulate(m)(sub =>
            nearestSub(u.slice(sub * dsub, (sub + 1) * dsub), cb(sub))))
        }
      }.toDF("id", "code")
  }

  /** PQ approximate top-k: asymmetric distance computation over the
    * compressed domain, then exact re-rank of the shortlist.
    *
    * Each query precomputes an m×k table of exact subvector→centroid
    * distances; scoring a candidate is m TABLE LOOKUPS over its code —
    * a pure column expression (codegen'd), no float vectors move during
    * the scan. The top `refine·k` shortlist per query is then re-ranked
    * by exact cosine (only shortlist vectors are fetched) — the
    * standard ADC+refine pipeline: quantization noise picks the
    * shortlist, exact math picks the winners. Exhaustive over codes
    * (the compressed-domain scan); compose with IVF cells to bound
    * candidates when N is extreme. Unit vectors make PQ-L2 and cosine
    * order identical: sim ≈ 1 − d²/2.
    */
  def annTopKPq(corpus: DataFrame, queriesDf: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, k: Int,
      m: Int = 8, kCents: Int = 16, refine: Int = 24): DataFrame = {
    val cb = trainPq(corpus, idCol, vecCol, m, kCents)
    val codes = pqEncode(corpus, idCol, vecCol, cb)
    val qTables = pqQueryTables(queriesDf, qIdCol, qVecCol, cb)
    val wPq = Window.partitionBy("q_id").orderBy(col("pq_sim").desc, col("id"))
    val shortlist = broadcast(qTables).crossJoin(codes)
      .filter(col("q_id") =!= col("id"))
      .withColumn("pq_sim", lit(1.0) - adcD2(m, kCents) / 2.0)
      .withColumn("__rn", row_number().over(wPq))
      .filter(col("__rn") <= refine * k)
      .select("q_id", "id")
    exactReRank(shortlist, corpus, queriesDf, idCol, vecCol, qIdCol,
      qVecCol, k)
  }

  /** IVFADC: the PQ compressed-domain scan bounded by the IVF coarse
    * quantizer — the composition that survives extreme N. Vectors are
    * assigned to their nearest IVF cell AND PQ-encoded in ONE map-only
    * pass (both models broadcast); each query ADC-scans only its
    * `nprobe` probed cells, so the per-query shortlist join touches
    * ≈ nprobe · N/cells codes instead of all N (the exhaustive
    * `annTopKPq` scan), and the exact re-rank stays refine·k vectors.
    * Codes quantize the raw (normalized) vectors, not cell residuals —
    * one shared codebook, cheaper training, recall audited in-band.
    */
  def annTopKIvfPq(corpus: DataFrame, queriesDf: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, k: Int,
      cells: Int = 0, nprobe: Int = 0, cellCap: Int = 0,
      m: Int = 8, kCents: Int = 16, refine: Int = 24): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    // coarse-quantizer parameters scale with the corpus (see annTopKIvf)
    lazy val n = corpus.count()
    val nCells =
      if (cells > 0) cells
      else math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nProbe = if (nprobe > 0) nprobe else math.max(4, nCells / 8)
    val nCap =
      if (cellCap > 0) cellCap
      else math.max(64, 8 * math.ceil(n.toDouble / nCells).toInt)
    val cents = trainIvf(corpus, idCol, vecCol, nCells,
      sampleN = math.max(2000, 20 * nCells))
    val cb = trainPq(corpus, idCol, vecCol, m, kCents)
    val bcCents = s.sparkContext.broadcast(cents)
    val bcCb = s.sparkContext.broadcast(cb)
    // one pass over the corpus: cell assignment + PQ code per vector
    val assigned = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        val cbv = bcCb.value
        val mm = cbv.length
        it.map { case (id, v) =>
          val u = normalizeVec(v.map(_.toDouble))
          val dsub = u.length / mm
          (id, nearestCell(u, cs), Array.tabulate(mm)(sub =>
            nearestSub(u.slice(sub * dsub, (sub + 1) * dsub), cbv(sub))))
        }
      }.toDF("id", "cell", "code")
    // per-cell cap: one dense cell must not dominate the candidate join
    val wCap = Window.partitionBy("cell").orderBy("id")
    val codes = assigned.withColumn("__rn", row_number().over(wCap))
      .filter(col("__rn") <= nCap).drop("__rn")
    val qCells = queriesDf
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (qid, v) =>
          nearestCells(normalizeVec(v.map(_.toDouble)), cs, nProbe)
            .map(c => (qid, c))
        }
      }.toDF("q_id", "cell")
    val qTables = pqQueryTables(queriesDf, qIdCol, qVecCol, cb)
    // candidates bounded to probed cells: the broadcast query side joins
    // codes ON CELL (no per-query full-corpus scan or window)
    val wPq = Window.partitionBy("q_id").orderBy(col("pq_sim").desc, col("id"))
    val shortlist = broadcast(qCells.join(qTables, "q_id"))
      .join(codes, "cell")
      .filter(col("q_id") =!= col("id"))
      .withColumn("pq_sim", lit(1.0) - adcD2(m, kCents) / 2.0)
      .withColumn("__rn", row_number().over(wPq))
      .filter(col("__rn") <= refine * k)
      .select("q_id", "id")
    exactReRank(shortlist, corpus, queriesDf, idCol, vecCol, qIdCol,
      qVecCol, k)
  }

  /** Per-query flattened ADC distance table: entry sub·k + c =
    * ||q_sub − centroid_c||² (built in a tight loop, the model
    * broadcast).
    */
  private def pqQueryTables(queriesDf: DataFrame, qIdCol: String,
      qVecCol: String, cb: Array[Array[Array[Double]]]): DataFrame = {
    val s = queriesDf.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cb)
    queriesDf
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cbv = bc.value
        it.map { case (qid, v) =>
          val u = normalizeVec(v.map(_.toDouble))
          val dsub = u.length / cbv.length
          val table = new Array[Double](cbv.length * cbv(0).length)
          var sub = 0
          while (sub < cbv.length) {
            var c = 0
            while (c < cbv(sub).length) {
              var d2 = 0.0
              var i = 0
              while (i < dsub) {
                val x = u(sub * dsub + i) - cbv(sub)(c)(i)
                d2 += x * x
                i += 1
              }
              table(sub * cbv(0).length + c) = d2
              c += 1
            }
            sub += 1
          }
          (qid, table)
        }
      }.toDF("q_id", "table")
  }

  /** ADC scoring as a pure column expression (codegen'd):
    * d² = Σ_sub table[sub·k + code[sub]].
    */
  private def adcD2(m: Int, kCents: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, sub) => acc + element_at(col("table"),
        sub * kCents + element_at(col("code"), sub + 1) + 1))

  /** Exact cosine re-rank of a (q_id, id) candidate shortlist: only
    * shortlist vectors are fetched; output is the standard
    * (q_id, rank, neighbor_id, sim) shape.
    */
  private def exactReRank(shortlist: DataFrame, corpus: DataFrame,
      queriesDf: DataFrame, idCol: String, vecCol: String, qIdCol: String,
      qVecCol: String, k: Int): DataFrame = {
    val qVecs = queriesDf.select(col(qIdCol).cast("long").as("q_id"),
      col(qVecCol).as("q_vec"))
    val cVecs = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
    broadcast(shortlist.join(broadcast(qVecs), "q_id")).join(cVecs, "id")
      .withColumn("sim", cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "embeddings")

  /** Deterministic near-duplicate twins of every `every`-th vector: same
    * direction with a small first-component nudge (cosine ≈ 0.9999),
    * ids offset by 10^9. The test corpus is uniform-random (no natural
    * near-dups), so the dedup operator demonstrates detection on pairs it
    * plants itself — a real pipeline reads both sides from the lake.
    */
  def withPlantedTwins(corpus: DataFrame, idCol: String, vecCol: String,
      every: Int): DataFrame = {
    val twins = corpus.filter(col(idCol) % every === 0)
      .select((col(idCol) + 1000000000L).as(idCol),
        transform(col(vecCol), (x, i) =>
          when(i === 0, x + lit(0.05f)).otherwise(x)).as(vecCol))
    corpus.select(col(idCol), col(vecCol)).unionByName(twins)
  }

  /** DuckDB form of a planted twin's cosine against its base: the twin
    * adds 0.05f to dimension 0 IN FLOAT (matching `withPlantedTwins`),
    * then both sides compute cosine in double — the same float→double
    * ladder the Spark `cosine` column walks, so rounded values match.
    */
  private val twinSimSql =
    """ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
      list_prepend(CAST(CAST(embedding[1] + 0.05::REAL AS REAL) AS DOUBLE),
                   CAST(embedding[2:] AS DOUBLE[]))), 4)"""

  /** Oracle for the ANN family on the planted-twin corpus: every query
    * (the first ten twin bases) must report its twin as the top-1
    * neighbor with the exact twin cosine — any bucketing/quantization
    * loss of a near-identical pair goes red.
    */
  private val twinTop1Oracle: String =
    s"""SELECT vec_id AS q_id, vec_id + 1000000000 AS neighbor_id,
        $twinSimSql AS sim
      FROM embeddings WHERE vec_id < 70 AND vec_id % 7 = 0
      ORDER BY q_id"""

  def queries: Seq[GraftQuery] = Seq(
    // Brute-force exact top-k: query set = vec_id < 10, k = 5.
    GraftQuery(
      "d_embed_cosine_topk",
      (s, dir) => {
        val corpus = emb(s, dir)
        val q = corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id"))
        broadcast(q).crossJoin(corpus)
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("sim", cosine(col("q_vec"), col("embedding")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      Some("""WITH q AS (
          SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
          WHERE vec_id < 10),
        pairs AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
            list_cosine_similarity(
              CAST(q.q_vec AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
          FROM q, embeddings e WHERE q.q_id <> e.vec_id),
        ranked AS (
          SELECT q_id, neighbor_id, sim,
            ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY sim DESC, neighbor_id) AS rank
          FROM pairs)
        SELECT q_id, rank, neighbor_id, round(sim, 4) AS sim
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // Bucketed ANN: 8 tables × 12 planes (4096 buckets/table), capped
    // groups; queries probe one bucket per table. Demonstrated on the
    // planted-twin corpus (the uniform corpus has NO neighbor
    // structure, making natural recall meaningless): each query's
    // top-1 must be its twin — a deterministic, oracle-checkable
    // result that goes red the moment bucketing loses a near-identical
    // pair. Full top-k recall stays pinned by SimilaritySpec.
    GraftQuery(
      "d_ann_lsh",
      (s, dir) => {
        val corpus = withPlantedTwins(emb(s, dir), "vec_id", "embedding",
          every = 7)
        val q = corpus
          .filter(col("vec_id") < 70 && col("vec_id") % 7 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        annTopK(corpus, q, "vec_id", "embedding", "q_id", "q_vec",
          k = 3, tables = 8, planes = 12, dims = 64, cap = 1024)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), col("sim"))
          .orderBy("q_id")
      },
      Some(twinTop1Oracle)),

    // IVF ANN: k-means coarse quantizer, cells ≈ √N with a per-cell cap
    // and nprobe scaled to the cell count — per-query work ≈ nprobe×√N.
    // Planted-twin corpus, top-1-is-the-twin oracle (see d_ann_lsh);
    // SimilaritySpec pins full recall and the cap on a clustered corpus.
    GraftQuery(
      "d_ann_ivf",
      (s, dir) => {
        val corpus = withPlantedTwins(emb(s, dir), "vec_id", "embedding",
          every = 7)
        val q = corpus
          .filter(col("vec_id") < 70 && col("vec_id") % 7 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        annTopKIvf(corpus, q, "vec_id", "embedding", "q_id",
          "q_vec", k = 3)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), col("sim"))
          .orderBy("q_id")
      },
      Some(twinTop1Oracle)),

    // PQ ANN: 8 subspaces × 16 centroids — the memory-bounded layer of
    // the ANN stack (codes are 8 small ints/vector vs 256 float bytes);
    // query scoring is table lookups in the compressed domain. The scan
    // here is EXHAUSTIVE over codes (the correct compressed-domain
    // baseline); d_ann_ivfpq is the cell-bounded composition for
    // extreme N. Rows-only (approximate); the recall column audits each
    // query, SimilaritySpec pins planted-twin recall.
    GraftQuery(
      "d_ann_pq",
      (s, dir) => {
        val corpus = withPlantedTwins(emb(s, dir), "vec_id", "embedding",
          every = 7)
        val q = corpus
          .filter(col("vec_id") < 70 && col("vec_id") % 7 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        annTopKPq(corpus, q, "vec_id", "embedding", "q_id",
          "q_vec", k = 3)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), col("sim"))
          .orderBy("q_id")
      },
      Some(twinTop1Oracle)),

    // IVFADC: PQ codes scanned only within each query's nprobe probed
    // IVF cells — per-query ADC work ≈ nprobe·√N instead of N, with the
    // same m-byte memory story and exact re-rank. The 100 TB shape of
    // the ANN stack. Rows-only (approximate); in-band recall column,
    // SimilaritySpec pins planted-twin recall on a clustered corpus.
    GraftQuery(
      "d_ann_ivfpq",
      (s, dir) => {
        val corpus = withPlantedTwins(emb(s, dir), "vec_id", "embedding",
          every = 7)
        val q = corpus
          .filter(col("vec_id") < 70 && col("vec_id") % 7 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        annTopKIvfPq(corpus, q, "vec_id", "embedding", "q_id",
          "q_vec", k = 3, nprobe = 8)
          .filter(col("rank") === 1)
          .select(col("q_id"), col("neighbor_id"), col("sim"))
          .orderBy("q_id")
      },
      Some(twinTop1Oracle)),

    // Embedding-cosine near-dup pairs at a REAL dedup threshold (0.95).
    // The uniform test corpus has no natural near-dups (max pairwise
    // cosine ~0.5), so deterministic twins are planted for every 7th
    // vector — the operator must recover exactly those pairs through the
    // banded LSH, never via all-pairs.
    GraftQuery(
      "d_dedup_embed",
      (s, dir) => {
        val corpus = withPlantedTwins(emb(s, dir), "vec_id", "embedding",
          every = 7)
        nearDupPairs(corpus, "vec_id", "embedding", threshold = 0.95,
          tables = 8, planes = 12, dims = 64, cap = 1024)
          .orderBy("id_a", "id_b")
      },
      // the pair set is fully determined: only (base, twin) pairs clear
      // τ=0.95 (natural max pairwise cosine ≈ 0.5), and the twin cosine
      // recomputes exactly in SQL — a hash-checked near-dup pair list
      Some(s"""SELECT vec_id AS id_a, vec_id + 1000000000 AS id_b,
          $twinSimSql AS sim
        FROM embeddings WHERE vec_id % 7 = 0 ORDER BY id_a, id_b""")),

    // Distributed spherical k-means — the clustering step a training
    // pipeline uses for semantic sharding, diversity sampling and
    // curriculum mixes. Every stage is map-only or a K×D-sized
    // aggregate, so the same plan runs at 100 TB. Demonstrated on a
    // PLANTED-cluster corpus (the raw embeddings are uniform random —
    // clustering them is engine noise, the same reasoning that moved
    // the ANN family to planted twins): 8 orthogonal prototypes with
    // deterministic per-id noise, derived from the table's vec_ids so
    // the oracle replays group sizes. The output is per-GROUP recovery
    // — size, purity (majority-cluster fraction) and how many groups
    // share that cluster — all exactly 1.0/1 when k-means reassembles
    // the generating partition, which the oracle pins. Raw-corpus
    // cohesion behavior stays covered by SimilaritySpec.
    GraftQuery(
      "d_kmeans_embed",
      (s, dir) => {
        val g = 8
        val dims = 16
        // proto[c][d] = 1 at d = 2c, else 0; noise in [-0.06, 0.06]
        // from (id, d) — well-separated tight clusters, fully
        // deterministic from vec_id
        val vec = transform(sequence(lit(0), lit(dims - 1)), d => {
          val proto = when(d === (col("vec_id") % g).cast("int") * 2,
            lit(1.0f)).otherwise(lit(0.0f))
          val noise = (((col("vec_id") * 31 + d * 7) % 13).cast("float")
            - lit(6.0f)) / lit(100.0f)
          proto + noise
        })
        val corpus = emb(s, dir).filter(col("vec_id") < 400)
          .select(col("vec_id"), vec.cast("array<float>").as("embedding"))
        val cents = kmeansFit(corpus, "vec_id", "embedding", g, iters = 5)
        val assigned = kmeansAssign(corpus, "vec_id", "embedding", cents)
          .withColumn("group_id", col("id") % g)
        val counts = assigned.groupBy("group_id", "cluster")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("group_id")
          .orderBy(col("n").desc, col("cluster"))
        val majority = counts
          .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("group_id"), col("cluster").as("maj_cluster"),
            col("n").as("maj_n"))
        val sizes = assigned.groupBy("group_id")
          .agg(count(lit(1)).as("n_members"))
        val shared = majority.groupBy("maj_cluster")
          .agg(count(lit(1)).as("groups_in_cluster"))
        sizes.join(majority, "group_id").join(shared, "maj_cluster")
          .select(col("group_id"), col("n_members"),
            round(col("maj_n").cast("double") /
              col("n_members").cast("double"), 4).as("purity"),
            col("groups_in_cluster"))
          .orderBy("group_id")
      },
      // perfect recovery is the DETERMINED answer on this separation:
      // every group one pure cluster (purity 1.0), no two groups merged
      // (groups_in_cluster 1), sizes straight from the generation rule
      Some("""SELECT CAST(vec_id % 8 AS BIGINT) AS group_id,
          COUNT(*) AS n_members,
          CAST(1.0 AS DOUBLE) AS purity,
          CAST(1 AS BIGINT) AS groups_in_cluster
        FROM embeddings WHERE vec_id < 400
        GROUP BY 1 ORDER BY group_id"""))
  )
}
