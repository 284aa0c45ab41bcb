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
  * d_ann_lsh is the scale path: random-hyperplane signatures bucket the
  * corpus (map-only), queries probe only their own bucket — per-bucket
  * candidate lists are bounded, turning top-k into a bucket-local join.
  * IVF (k-means coarse quantizer) is the next refinement at 100 TB.
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

  /** LSH bucket id: sign bits of the vector against each hyperplane.
    * Backed by the native codegen expression — interpreted HOF pipelines
    * pay per-element lambda dispatch on 25M+ multiply-adds at sf0.1.
    */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.HyperplaneLshBucket(
        org.apache.spark.sql.graft.Bridge.expression(v), planes, dims))

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "embeddings")

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

    // Bucketed ANN: 8 hyperplanes → 256 buckets; queries probe their own
    // bucket only. Rows-only (approximate by construction); SimilaritySpec
    // checks recall against the brute-force baseline.
    GraftQuery(
      "d_ann_lsh",
      (s, dir) => {
        val planes = 8
        // persisted: the bucketed corpus feeds both sides of the probe join
        val corpus = emb(s, dir)
          .withColumn("bucket", lshBucket(col("embedding"), planes, 64))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val q = corpus.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("bucket"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id"))
        broadcast(q).join(corpus, "bucket")
          .filter(col("q_id") =!= col("vec_id"))
          .withColumn("sim", cosine(col("q_vec"), col("embedding")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 4).as("sim"))
          .orderBy("q_id", "rank")
      },
      None),

    // Embedding-cosine similarity pairs above a threshold (the dedup
    // flavor of the ANN machinery) — candidate pairs come from the LSH
    // bucket equi-join only, never all-pairs. The test corpus has no
    // planted embedding near-dups (max pairwise cosine ~0.5), so the
    // threshold is set where genuinely-similar pairs live; a real
    // dedup deployment raises it to ~0.95.
    GraftQuery(
      "d_dedup_embed",
      (s, dir) => {
        val planes = 4
        val corpus = emb(s, dir)
          .withColumn("bucket", lshBucket(col("embedding"), planes, 64))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val a = corpus.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("vec_a"))
        val b = corpus.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("vec_b"))
        a.join(b, "bucket")
          .filter(col("id_a") < col("id_b"))
          .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
          .filter(col("sim") >= 0.3)
          .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
          .orderBy("id_a", "id_b")
      },
      None)
  )
}
