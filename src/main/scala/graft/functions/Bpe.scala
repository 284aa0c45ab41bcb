package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (the published BPE algorithm — Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units", and the byte-level variant popularized by GPT-2's public
  * encoder): a PINNED merge table applied as an iterative lowest-rank
  * pair-merge loop per pre-token. The merge table is trained at class
  * init from a small self-authored frequency-weighted English word list
  * (deterministic — no external artifacts, nothing to download), so the
  * tokenization is reproducible bit-for-bit across sessions, executors,
  * and rounds.
  *
  * Scale shape: tokenization is a pure per-row function — map-only, no
  * shuffle, invoked through a codegen'd StaticInvoke (never a Scala
  * UDF), with a bounded per-JVM word→tokens cache exploiting the Zipf
  * skew of natural text (the hot few thousand words hit the cache; the
  * tail pays the merge loop, which is O(len²·log len) worst case on
  * short pre-tokens). At 100 TB this runs embarrassingly parallel over
  * parquet splits.
  *
  * Not SQL-expressible: the merge loop is iterative and order-sensitive,
  * so `d_bpe_tokenize` is a rows-only key certified by BpeSpec (pinned
  * token vectors, decode-roundtrip over real documents, no-further-merge
  * termination invariant, cross-partitioning determinism) — the same
  * treatment as the murmur3 bucket transform's spec vectors.
  */
object Bpe {

  /** Training corpus: common-English word frequencies (self-authored
    * approximate ranks — the exact numbers only shape WHICH merges are
    * learned; correctness of the tokenizer is independent of them).
    */
  private val corpus: Seq[(String, Int)] = Seq(
    "the" -> 500, "of" -> 300, "and" -> 280, "to" -> 250, "in" -> 200,
    "that" -> 120, "is" -> 110, "was" -> 100, "for" -> 90, "with" -> 80,
    "this" -> 75, "his" -> 70, "her" -> 65, "they" -> 60, "there" -> 55,
    "which" -> 50, "their" -> 48, "would" -> 45, "could" -> 42,
    "about" -> 40, "other" -> 38, "these" -> 36, "water" -> 34,
    "after" -> 32, "where" -> 30, "think" -> 28, "under" -> 26,
    "never" -> 24, "people" -> 22, "little" -> 20, "because" -> 18,
    "through" -> 16, "nothing" -> 14, "together" -> 12,
    "something" -> 10, "ing" -> 150, "tion" -> 90, "ment" -> 60,
    "ers" -> 55, "ation" -> 45, "able" -> 35)

  val NumMerges = 64

  /** The pinned merge table, highest-priority first. Training is the
    * textbook loop: start from characters, repeatedly merge the most
    * frequent adjacent pair (ties broken lexicographically so the table
    * is deterministic), re-segment, repeat.
    */
  val merges: Vector[(String, String)] = {
    var words: Seq[(Vector[String], Int)] =
      corpus.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < NumMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .maxBy { case ((a, b), n) => (n, a, b) } // count, then lexicographic
          ._1
        out += best
        words = words.map { case (syms, n) => (mergePair(syms, best), n) }
        k += 1
      }
    }
    out.result()
  }

  private val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 &&
          syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Bounded per-JVM cache: natural-language word frequency is Zipfian,
    * so a small cache absorbs almost every lookup. Cleared wholesale at
    * capacity — no LRU bookkeeping on the hot path.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
  private val CacheCap = 65536

  /** Tokenize ONE pre-token: iteratively apply the lowest-rank merge
    * present until none applies (the published BPE inference loop).
    */
  def encode(word: String): Vector[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    if (cache.size >= CacheCap) cache.clear()
    cache.put(word, syms)
    syms
  }

  /** The pre-tokenizer (shared shape with d_token_count's regex): runs
    * of letters, runs of digits, single other non-space characters.
    */
  private val PreToken =
    java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  def tokens(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = PreToken.matcher(text)
    while (m.find()) out ++= encode(m.group())
    out.result()
  }

  /** Codegen entry point (StaticInvoke target): BPE token count. */
  def countTokens(text: UTF8String): Long = {
    if (text == null) return 0L
    var n = 0L
    val m = PreToken.matcher(text.toString)
    while (m.find()) n += encode(m.group()).length
    n
  }

  /** Codegen entry point: tokens joined by a separator — lets a demo
    * surface the actual tokenization without an array UDF.
    */
  def tokensJoined(text: UTF8String, sep: UTF8String): UTF8String = {
    if (text == null) return null
    UTF8String.fromString(tokens(text.toString).mkString(sep.toString))
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{LongType, StringType}

  /** BPE token count as a codegen'd column expression. */
  def bpeTokenCount(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        Bpe.getClass, LongType, "countTokens",
        Seq(org.apache.spark.sql.graft.Bridge.expression(c)),
        inputTypes = Seq(StringType), propagateNull = true,
        returnNullable = false))

  /** Joined token string as a codegen'd column expression. */
  def bpeTokens(c: Column, sep: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        Bpe.getClass, StringType, "tokensJoined",
        Seq(org.apache.spark.sql.graft.Bridge.expression(c),
          org.apache.spark.sql.catalyst.expressions.Literal(
            UTF8String.fromString(sep), StringType)),
        inputTypes = Seq(StringType, StringType), propagateNull = true,
        returnNullable = true))
}
