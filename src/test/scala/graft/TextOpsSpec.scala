package graft

class TextOpsSpec extends SparkSpec {

  private val fixture: Seq[(Long, String, String, String, Long)] = Seq(
    (0L, "The cat and the dog ran to the house in the dark.", "en", "s", 0L),
    (1L, "Der Hund und die Katze, das ist der Anfang und das Ende.", "de", "s", 0L),
    (2L, "Le chat et la souris jouent dans les jardins et des rues.", "fr", "s", 0L),
    (3L, "El perro y los gatos corren y las calles del pueblo.", "es", "s", 0L),
    (4L, "我 是 学生 了 在 北京 我 的 朋友", "zh", "s", 0L))

  private lazy val dir = docsDir(fixture)

  private def run(name: String) = Registry.byName(name).fn(spark, dir)

  test("d_lang_id predicts the dominant stopword profile per doc") {
    val preds = run("d_lang_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(preds == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "zh"))
  }

  test("d_token_count counts whitespace and BPE-ish tokens") {
    val r = run("d_token_count").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))).toMap
    assert(r(0L)._1 == 12L)        // 12 whitespace-separated words
    assert(r(0L)._2 == 13L)        // 12 words + trailing period
  }

  test("d_fingerprint is invariant to case and whitespace runs") {
    val dir2 = docsDir(Seq(
      (0L, "Hello   World", "en", "s", 0L),
      (1L, " hello world ", "en", "s", 0L)))
    val fps = Registry.byName("d_fingerprint").fn(spark, dir2)
      .collect().map(_.getAs[String]("fp"))
    assert(fps(0) == fps(1))
  }

  test("d_approx_distinct stays within HLL++ error bounds of exact") {
    val out = Registry.byName("d_approx_distinct")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"${r.getAs[String]("source")}: HLL estimate outside 5% of " +
          s"exact ${r.getAs[Long]("exact_docs")}")
    }
  }

  test("d_quality_score is in [0,1] and penalizes punctuation-heavy text") {
    val dir3 = docsDir(Seq(
      (0L, "a clean simple sentence with many plain common words in it " * 3, "en", "s", 0L),
      (1L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en", "s", 0L)))
    val q = Registry.byName("d_quality_score").fn(spark, dir3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0L) > q(1L))
  }
}
