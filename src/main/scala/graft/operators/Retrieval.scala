package graft.operators

import graft.{GraftQuery, Help, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 retrieval & corpus-statistics scoring: BM25 keyword search and
  * hashed-n-gram importance weighting (the DSIR family) — the operators
  * that pick WHICH cleaned documents to train on.
  *
  * Scale design (100 TB): both operators reduce the corpus to a tiny
  * global model first (BM25: N/avgdl/per-term document frequencies — one
  * aggregate row; importance weighting: 256 hashed-bucket log-ratios),
  * then score every document in a single map-only, codegen'd pass with
  * the model inlined as literals/broadcast. No per-token shuffle touches
  * the scoring pass; the only wide operation is the bounded-cardinality
  * count aggregation that builds the model.
  */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "documents")

  private def toks(c: Column): Column = split(TextOps.normText(c), " ")

  /** BM25 parameters (the standard Robertson defaults). */
  private val K1 = 1.2
  private val B = 0.75

  def queries: Seq[GraftQuery] = Seq(
    // BM25 top-k keyword retrieval over the corpus. Per-document term
    // frequencies and length come from column expressions (map-only);
    // the global statistics (N, avgdl, per-term df) are ONE aggregate
    // row, broadcast back into the scoring pass; top-k is a distributed
    // TakeOrdered, never a full sort. Scores are rounded to 4 decimals
    // BEFORE ranking so the result set is stable across engines.
    GraftQuery(
      "d_bm25_topk",
      (s, dir) => {
        val terms = Seq("spark", "hash", "merge")
        val d = docs(s, dir).withColumn("__t", toks(col("text")))
        val per = d.select(Seq(col("doc_id"), col("source"),
          size(col("__t")).cast("double").as("dl")) ++
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__t"), x => x === lit(t)))
              .cast("double").as(s"tf$i")
          }: _*)
        val aggCols = Seq(
          count(lit(1)).cast("double").as("n"),
          avg(col("dl")).as("avgdl")) ++
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
        val global = per.agg(aggCols.head, aggCols.tail: _*)
        val score = terms.indices.map { i =>
          val idf = log(lit(1.0) +
            (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
          idf * col(s"tf$i") * (K1 + 1.0) /
            (col(s"tf$i") +
              lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
        }.reduce(_ + _)
        per.crossJoin(broadcast(global))
          .withColumn("score", round(score, 4))
          .select("doc_id", "source", "score")
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH toksd AS (SELECT doc_id, source,
            string_split(${TextOps.normTextSql}, ' ') AS t FROM documents),
          per AS (SELECT doc_id, source, CAST(len(t) AS DOUBLE) AS dl,
            CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf0,
            CAST(len(list_filter(t, x -> x = 'hash')) AS DOUBLE) AS tf1,
            CAST(len(list_filter(t, x -> x = 'merge')) AS DOUBLE) AS tf2
            FROM toksd),
          g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
            SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
            SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
            SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2 FROM per)
        SELECT doc_id, source, round(
            ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
              / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
          + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
              / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
          + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
              / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS score
        FROM per, g ORDER BY score DESC, doc_id LIMIT 20""")),

    // Hashed-unigram importance weighting (the DSIR shape): score every
    // document by the mean log-likelihood ratio of its tokens' hash
    // buckets under a TARGET domain (here source 'src3') versus the
    // whole corpus, add-one smoothed over 256 md5-prefix buckets. The
    // bucket model is a bounded 256-row aggregate collected once; the
    // scoring pass is map-only with the model inlined as a map literal —
    // the engine-portable recipe (md5 prefixes hash identically
    // everywhere, so resampling decisions reproduce across engines).
    GraftQuery(
      "d_importance_weight",
      (s, dir) => {
        val target = "src3"
        val buckets = 256
        val bt = docs(s, dir)
          .select(col("source"), explode(toks(col("text"))).as("tok"))
          .select(col("source"), substring(md5(col("tok")), 1, 2).as("b"))
        val counts = bt.groupBy("b").agg(
          count(lit(1)).as("cc"),
          sum(when(col("source") === target, 1L).otherwise(0L)).as("ct"))
          .collect()
        val tc = counts.map(_.getAs[Long]("cc")).sum.toDouble
        val tt = counts.map(_.getAs[Long]("ct")).sum.toDouble
        val llr: Map[String, Double] = counts.map { r =>
          r.getAs[String]("b") ->
            (math.log((r.getAs[Long]("ct") + 1.0) / (tt + buckets)) -
              math.log((r.getAs[Long]("cc") + 1.0) / (tc + buckets)))
        }.toMap
        val llrMap = typedLit(llr)
        val docsScored = docs(s, dir).withColumn("__t", toks(col("text")))
          .withColumn("llr_score", round(
            when(size(col("__t")) === 0, 0.0).otherwise(
              aggregate(col("__t"), lit(0.0), (acc, t) =>
                acc + element_at(llrMap, substring(md5(t), 1, 2))) /
                size(col("__t"))), 4))
        Help.sortForGate(
          docsScored.select("doc_id", "source", "llr_score"),
          col("doc_id"))
      },
      Some(s"""WITH toksd AS (SELECT doc_id, source,
            unnest(string_split(${TextOps.normTextSql}, ' ')) AS tok
            FROM documents),
          bt AS (SELECT doc_id, source, substr(md5(tok), 1, 2) AS b
            FROM toksd),
          cc AS (SELECT b, COUNT(*) AS c,
            SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS ctc
            FROM bt GROUP BY b),
          tot AS (SELECT SUM(c) AS tc, SUM(ctc) AS tt FROM cc),
          llr AS (SELECT b,
            ln((ctc + 1.0) / (tt + 256)) - ln((c + 1.0) / (tc + 256)) AS w
            FROM cc, tot),
          per AS (SELECT doc_id, SUM(w) AS sw, COUNT(*) AS nt
            FROM bt JOIN llr USING (b) GROUP BY doc_id)
        SELECT d.doc_id, d.source, round(p.sw / p.nt, 4) AS llr_score
        FROM documents d JOIN per p USING (doc_id) ORDER BY d.doc_id"""))
  )
}
