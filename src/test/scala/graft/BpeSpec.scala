package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Real byte-pair encoding against its pinned merge table: the merge
  * table is deterministic, the fast cached encoder matches a naive
  * reference implementation of the published algorithm, tokens
  * round-trip to the original pre-token stream, no further merge
  * applies at termination, and the codegen'd column expression agrees
  * with the driver-side encoder over real documents at any
  * partitioning.
  */
class BpeSpec extends SparkSpec {

  test("merge table: deterministic, deduplicated, dominant pair first") {
    assert(Bpe.merges.size == Bpe.NumMerges)
    // 'th' dominates the weighted corpus (the/that/this/they/there/...)
    assert(Bpe.merges.head == (("t", "h")))
    assert(Bpe.merges.distinct.size == Bpe.merges.size,
      "a pair must never be learned twice")
  }

  test("encode matches a naive reference implementation") {
    val ranks = Bpe.merges.zipWithIndex.toMap
    def mergeOnce(syms: Vector[String],
        best: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && (syms(i), syms(i + 1)) == best) {
          out += syms(i) + syms(i + 1); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def ref(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector
      var go = syms.length > 1
      while (go) {
        val cands = syms.zip(syms.drop(1)).filter(ranks.contains)
        if (cands.isEmpty) go = false
        else syms = mergeOnce(syms, cands.minBy(ranks))
      }
      syms
    }
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "there", "together", "something",
      "watermelon", "aaaa", "thethethe", "xyzzy", "ththth") ++
      (1 to 300).map(_ => (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    words.foreach { w =>
      assert(Bpe.encode(w) == ref(w), s"encode('$w') diverged")
    }
  }

  test("pinned vectors, roundtrip, and the termination invariant") {
    assert(Bpe.encode("the") == Vector("the"),
      "the most frequent word must collapse to one token")
    val learned = Bpe.merges.toSet
    Seq("the", "their", "throughout", "123", "hello", "weathering",
      "qqq", "a").foreach { w =>
      val t = Bpe.encode(w)
      assert(t.mkString("") == w, s"roundtrip broke for '$w'")
      t.zip(t.drop(1)).foreach(p => assert(!learned.contains(p),
        s"'$w': mergeable pair $p survived termination"))
    }
    // full-text tokenization splits on the pre-tokenizer first
    assert(Bpe.tokens("the cat!").mkString("|").startsWith("the|"))
    assert(Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("the cat!"))
      == Bpe.tokens("the cat!").length.toLong)
  }

  test("column expression == driver encoder over real documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = d.select(col("doc_id"),
      Bpe.bpeTokenCount(col("text")).as("n"),
      Bpe.bpeTokens(col("text"), "").as("toks"),
      col("text")).collect()
    assert(got.length > 0)
    got.foreach { r =>
      val text = r.getAs[String]("text")
      val want = Bpe.tokens(text)
      assert(r.getAs[Long]("n") == want.length.toLong,
        s"doc ${r.get(0)}: count diverged")
      assert(r.getAs[String]("toks") == want.mkString(""),
        s"doc ${r.get(0)}: tokens diverged")
    }
    // deterministic under any partitioning (pure map-side function)
    val a = d.select(col("doc_id"),
      Bpe.bpeTokenCount(col("text")).as("n"))
    val b = d.repartition(7).select(col("doc_id"),
      Bpe.bpeTokenCount(col("text")).as("n"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the registered rows-only key runs green (its in-query require
    // proves the corpus-wide roundtrip)
    val q = Registry.byName("d_bpe_tokenize")
    assert(q.fn(spark, "/root/testdata/sf0.001").count() > 0)
  }
}
