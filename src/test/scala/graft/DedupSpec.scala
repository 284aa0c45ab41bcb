package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private val base = ("the quick brown fox jumps over the lazy dog while " +
    "a distant train whistles through the cold valley night and the river " +
    "keeps moving slowly past the old stone bridge toward the open sea")
  // d0~d1: one word changed (near-dup). d2==d3 modulo whitespace/case
  // (exact dup after normalization). d4..d9: distinct texts.
  private val fixture: Seq[(Long, String, String, String, Long)] = Seq(
    (0L, base, "en", "s", base.length.toLong),
    (1L, base.replace("lazy dog", "sleepy dog"), "en", "s", 0L),
    (2L, "Data engines shuffle partitions across executors every day", "en", "s", 0L),
    (3L, "  data   engines shuffle Partitions across executors EVERY day ", "en", "s", 0L),
    (4L, "completely different content about gardening tomatoes in spring soil", "en", "s", 0L),
    (5L, "yet another unrelated document mentioning orchestras and violins tonight", "en", "s", 0L),
    (6L, "streaming watermarks bound state for session windows in processing time", "en", "s", 0L),
    (7L, "partition pruning skips files using min max statistics per column", "en", "s", 0L),
    (8L, "broadcast joins avoid shuffling the large fact table entirely", "en", "s", 0L),
    (9L, "metadata snapshots enable time travel across table versions cheaply", "en", "s", 0L))

  private lazy val dir = docsDir(fixture)

  private def run(name: String) =
    Registry.byName(name).fn(spark, dir)

  test("d_dedup_exact groups whitespace/case-normalized duplicates") {
    val rows = run("d_dedup_exact").collect()
    assert(rows.length == 9) // 10 docs, one exact-dup pair collapses
    val dup = rows.filter(_.getAs[Long]("n_copies") == 2L)
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keeper_id") == 2L)
  }

  test("d_dedup_minhash finds the planted near-dup pair and nothing else") {
    val pairs = run("d_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L))) // exact dups are also near-dups
    assert(!pairs.exists(p => p._1 >= 4L))
  }

  test("d_dedup_simhash hamming distance: 0 for exact dups, small for near") {
    val rows = run("d_dedup_simhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(rows((2L, 3L)) == 0L)
    assert(rows((0L, 1L)) <= 3L)
  }

  test("d_ngram_jaccard reports high similarity for planted pairs") {
    val rows = run("d_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jac")).toMap
    assert(rows((2L, 3L)) == 1.0)
    assert(rows((0L, 1L)) > 0.8)
  }

  test("connectedComponents closes chains transitively, keeps islands apart") {
    import spark.implicits._
    // chain 1-2-3-4 plus island 10-11: min-label propagation must close
    // the 4-chain (diameter 3) and must NOT leak across components
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L).forall(labels(_) == 10L))
  }

  test("connectedComponents fails LOUDLY when a chain outruns maxIter") {
    import spark.implicits._
    // a 25-node path has diameter 24: with maxIter=5 the labels cannot
    // converge, and silence would mean split clusters downstream
    val chain = (1L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val err = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 5).collect()
    }
    assert(err.getMessage.contains("did not converge"))
    // with enough rounds the same chain resolves to one component
    val labels = Dedup.connectedComponents(chain, maxIter = 30).collect()
      .map(r => r.getAs[Long]("label")).distinct
    assert(labels.toSeq == Seq(1L))
  }

  test("d_dedup_cluster groups transitive near-dups into one cluster") {
    // doc 20 bridges 0 and 1 even if (0,1) alone were below threshold:
    // clusters come from components, not raw pairs
    val clusters = run("d_dedup_cluster").collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_members"))
      .toMap
    // exact-dup pair (2,3) is its own cluster; near-dup pair (0,1) another
    assert(clusters(0L) == 2L)
    assert(clusters(2L) == 2L)
    assert(!clusters.keySet.exists(_ >= 4L))
  }

  test("jaccard helper matches set arithmetic") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(df.head().getDouble(0) == 0.5)
  }
}
