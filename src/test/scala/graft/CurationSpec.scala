package graft

import org.apache.spark.sql.functions._

/** Invariants for the curation operators that have no SQL oracle. */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def packs = Registry.byName("d_pack_sequences").fn(spark, dir)

  test("d_pack_sequences: every document packed exactly once") {
    val total = Tables.tbl(spark, dir, "documents").count()
    assert(packs.agg(sum("n_docs")).head.getLong(0) == total)
  }

  test("d_pack_sequences: budget respected except single-doc overflow") {
    val budget = 256L
    val over = packs.filter(col("n_tokens") > budget && col("n_docs") > 1)
    assert(over.count() == 0,
      s"multi-doc packs over budget: ${over.collect().mkString(", ")}")
  }

  test("d_pack_sequences: packs are filled, not one doc per pack") {
    // greedy next-fit over ~50-token docs on a 256 budget must pack
    // several docs per sequence; a regression to one-doc-per-pack would
    // show as fill ≈ doc/budget ≈ 0.2
    val stats = packs.agg(avg("fill"), avg("n_docs")).head
    assert(stats.getDouble(0) > 0.6, s"mean fill ${stats.getDouble(0)}")
    assert(stats.getDouble(1) > 2.0, s"mean docs/pack ${stats.getDouble(1)}")
  }

  test("d_pack_sequences: deterministic across runs") {
    assert(packs.collect().toSeq == packs.collect().toSeq)
  }

  test("withRepetitionFracs survives degenerate documents") {
    // docs with <3 tokens used to feed sequence(0, size-3) a DESCENDING
    // range and crash slice(); empty gram lists divided by zero
    import spark.implicits._
    val df = Seq(
      (1L, ""),              // 1 empty token after split
      (2L, "word"),          // 1 token
      (3L, "two words"),     // 2 tokens — still no 3-gram
      (4L, "a a a a a a"),   // fully repeated
      (5L, "all tokens here differ today"))
      .toDF("doc_id", "text")
    val rows = operators.Curation.withRepetitionFracs(df, col("text"))
      .select(col("doc_id"), round(col("dup_token_frac"), 4).as("r1"),
        round(col("dup_3gram_frac"), 4).as("r3"))
      .orderBy("doc_id").collect()
    assert(rows.length == 5)
    // short docs: no 3-grams → defined as 0.0, never null/NaN/crash
    assert(rows.take(3).forall(_.getDouble(2) == 0.0))
    // "a a a a a a": 6 tokens 1 distinct → 1-1/6; 4 identical grams → 1-1/4
    assert(math.abs(rows(3).getDouble(1) - 0.8333) < 1e-9)
    assert(rows(3).getDouble(2) == 0.75)
    // all-distinct doc repeats nothing
    assert(rows(4).getDouble(1) == 0.0 && rows(4).getDouble(2) == 0.0)
  }

  test("d_decontaminate_ngram catches partial overlap exact dedup misses") {
    // the ngram pass must drop at least as many docs as whole-document
    // fingerprint decontamination (every exact copy shares all grams)
    val ngram = Registry.byName("d_decontaminate_ngram").fn(spark, dir)
      .agg(sum("n_clean")).head.getLong(0)
    val exact = Registry.byName("d_decontaminate").fn(spark, dir)
      .agg(sum("n_clean")).head.getLong(0)
    assert(ngram <= exact, s"ngram-clean $ngram > exact-clean $exact")
  }
}
