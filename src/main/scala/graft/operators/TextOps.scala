package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 text-analysis operators over the `documents` table.
  *
  * Everything here is built from codegen'd built-in expressions — no UDFs —
  * so the whole pipeline stays inside WholeStageCodegen and is map-only
  * (embarrassingly parallel at 100 TB: no shuffle except final ORDER BY,
  * which only exists for the correctness gate's total ordering).
  */
object TextOps {

  /** Canonical normalization shared by fingerprint/dedup: lowercase, trim,
    * collapse runs of whitespace. Identical semantics to the DuckDB-side
    * `regexp_replace(lower(trim(text)), '\s+', ' ', 'g')`.
    */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")
  val normTextSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Let-binding for Column expressions: evaluate `body(x)` with `x`
    * bound ONCE per row to `value`. Higher-order lambdas are interpreted
    * with no common-subexpression elimination, so a lambda body that
    * references a non-attribute array (e.g. `slice(tokens, i, n)` where
    * `tokens` is itself a split/regexp expression) re-evaluates that
    * whole expression per array ELEMENT — O(len²) per row, a measured 9×
    * slowdown on gram construction. Routing the array through a
    * single-element transform turns those references into lambda-variable
    * lookups.
    */
  def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Whitespace token count (trim first so empty/blank text counts 0/1
    * identically on both sides).
    */
  def wsTokens(c: Column): Column =
    size(split(trim(c), "\\s+")).cast("long")
  val wsTokensSql = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"

  // BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
  private val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val bpeReSql = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  // Stopword profiles for the language-ID heuristic (word-boundary regex
  // counts; \b is ASCII word boundary in both Java regex and RE2).
  private val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|les|et|des)\\b",
    "es" -> "\\b(el|los|las|y|del)\\b",
    "zh" -> "(的|是|了|在|我)")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "documents")

  def queries: Seq[GraftQuery] = Seq(
    // Normalized content fingerprint (md5 over collapsed whitespace).
    GraftQuery(
      "d_fingerprint",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), md5(normText(col("text"))).as("fp"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5($normTextSql) AS fp
        FROM documents ORDER BY doc_id""")),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    GraftQuery(
      "d_token_count",
      (s, dir) =>
        docs(s, dir)
          .select(
            col("doc_id"),
            wsTokens(col("text")).as("ws_tokens"),
            regexp_count(col("text"), lit(bpeRe)).cast("long").as("bpe_tokens"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, $wsTokensSql AS ws_tokens,
        CAST(len(regexp_extract_all(text, '$bpeReSql')) AS BIGINT) AS bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // REAL byte-pair encoding over a pinned merge table (graft.functions
    // .Bpe): the published iterative lowest-rank merge loop per
    // pre-token, as a codegen'd StaticInvoke expression — map-only at
    // any scale. The merge loop is order-sensitive and iterative, so no
    // single DuckDB SQL reproduces it: rows-only key, certified by
    // BpeSpec (pinned vectors, reference-implementation cross-check,
    // decode roundtrip, termination invariant). The in-query require
    // proves the roundtrip ON the actual corpus: concatenating the BPE
    // tokens of every document reproduces its pre-token stream exactly.
    GraftQuery(
      "d_bpe_tokenize",
      (s, dir) => {
        val pre = regexp_count(col("text"), lit(bpeRe)).cast("long")
        // one tokenization pass: the roundtrip check and the returned
        // rows share the persisted frame (the merge loop is the cost)
        val out = docs(s, dir).select(
          col("doc_id"),
          pre.as("pre_tokens"),
          graft.functions.Bpe.bpeTokenCount(col("text")).as("bpe_tokens"),
          (graft.functions.Bpe.bpeTokens(col("text"), "") ===
            array_join(regexp_extract_all(col("text"), lit(bpeRe),
              lit(0)), "")).as("rt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bad = out.filter(!col("rt") ||
          col("bpe_tokens") < col("pre_tokens")).count()
        require(bad == 0, s"$bad documents fail the BPE roundtrip")
        val res = out.select("doc_id", "pre_tokens", "bpe_tokens")
          .orderBy("doc_id").localCheckpoint()
        out.unpersist()
        res
      },
      None),

    // Quality scoring from length / punctuation / stopword ratios. The
    // score formula is evaluated in identical double arithmetic on both
    // engines, then rounded.
    GraftQuery(
      "d_quality_score",
      (s, dir) => {
        val nTok = wsTokens(col("text"))
        val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))
          .cast("double") / length(col("text")).cast("double")
        val stops = regexp_count(lower(col("text")),
          lit("\\b(the|and|of|to|in|a)\\b")).cast("double") /
          greatest(nTok.cast("double"), lit(1.0))
        docs(s, dir)
          .select(
            col("doc_id"),
            nTok.as("n_tokens"),
            round(punct, 4).as("punct_ratio"),
            round(stops, 4).as("stop_ratio"),
            round(least(nTok.cast("double") / lit(100.0), lit(1.0)) *
              (lit(1.0) - punct) * (lit(1.0) - stops), 4).as("quality_score"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, $wsTokensSql AS n_tokens,
        round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
          / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
        round(CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a)\\b')) AS DOUBLE)
          / greatest(CAST($wsTokensSql AS DOUBLE), 1.0), 4) AS stop_ratio,
        round(least(CAST($wsTokensSql AS DOUBLE) / 100.0, 1.0)
          * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE))
          * (1.0 - CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a)\\b')) AS DOUBLE)
              / greatest(CAST($wsTokensSql AS DOUBLE), 1.0)), 4) AS quality_score
        FROM documents ORDER BY doc_id""")),

    // Sketch-based cardinality: HyperLogLog++ distinct-fingerprint counts
    // per source next to the exact answer. The sketch is mergeable —
    // partial aggregation map-side, constant memory per group at any
    // scale. The compared output pins what IS deterministic: the exact
    // count (DuckDB recomputes it over the same md5 fingerprints) and
    // whether the HLL estimate landed inside a 5% band of it (rsd=2%, so
    // a true estimate always does; TextOpsSpec additionally bounds the
    // raw error).
    GraftQuery(
      "d_approx_distinct",
      (s, dir) =>
        docs(s, dir)
          .select(col("source"), md5(normText(col("text"))).as("fp"))
          .groupBy("source")
          .agg(
            approx_count_distinct(col("fp"), rsd = 0.02).as("approx"),
            countDistinct(col("fp")).as("exact_docs"))
          .select(col("source"), col("exact_docs"),
            (abs(col("approx") - col("exact_docs")).cast("double") <=
              col("exact_docs").cast("double") * 0.05)
              .as("hll_within_5pct"))
          .orderBy("source"),
      Some(s"""SELECT source,
          COUNT(DISTINCT md5($normTextSql)) AS exact_docs,
          TRUE AS hll_within_5pct
        FROM documents GROUP BY source ORDER BY source""")),

    // PII scrubbing: redact emails and phone numbers, report per-doc
    // redaction counts — a standard pre-training curation pass. The test
    // corpus has no natural PII, so deterministic PII is PLANTED per
    // doc_id (both engines build the identical augmented text) and the
    // operator must find exactly it. Map-only codegen'd regexes.
    GraftQuery(
      "d_pii_scrub",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+1 \\d{3}-\\d{3}-\\d{4}"
        val aug = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1 555-"),
          lpad(pmod(col("doc_id"), lit(743L)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("doc_id"), lit(9973L)).cast("string"), 4, "0"))
        docs(s, dir)
          .select(
            col("doc_id"),
            regexp_count(aug, lit(emailRe)).cast("long").as("n_emails"),
            regexp_count(aug, lit(phoneRe)).cast("long").as("n_phones"),
            length(regexp_replace(regexp_replace(aug, emailRe, "[EMAIL]"),
              phoneRe, "[PHONE]")).cast("long").as("clean_len"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (
          SELECT doc_id, text || ' contact user' || doc_id
            || '@mail.example.com or +1 555-'
            || lpad(CAST(doc_id % 743 AS VARCHAR), 3, '0') || '-'
            || lpad(CAST(doc_id % 9973 AS VARCHAR), 4, '0') AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_emails,
          CAST(len(regexp_extract_all(t,
            '\+1 \d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
          CAST(length(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\+1 \d{3}-\d{3}-\d{4}', '[PHONE]', 'g')) AS BIGINT) AS clean_len
        FROM aug ORDER BY doc_id""")),

    // Language ID: stopword-profile scores, argmax with fixed tiebreak
    // order (en > de > fr > es > zh), same CASE order on both sides.
    GraftQuery(
      "d_lang_id",
      (s, dir) => {
        val scores = langProfiles.map { case (l, re) =>
          l -> regexp_count(lower(col("text")), lit(re)).cast("long")
        }
        val best = greatest(scores.map(_._2): _*)
        val pred = scores.tail.foldLeft(
          when(scores.head._2 === best, scores.head._1)) {
          case (acc, (l, sc)) => acc.when(sc === best, l)
        }
        docs(s, dir)
          .select(
            (col("doc_id") +: pred.as("pred_lang") +:
              scores.map { case (l, sc) => sc.as(s"score_$l") }): _*)
          .orderBy("doc_id")
      },
      Some {
        val scoreSql = langProfiles.map { case (l, re) =>
          val dre = re.replace("\\b", "\\b") // same pattern text in RE2
          l -> s"CAST(len(regexp_extract_all(lower(text), '$dre')) AS BIGINT)"
        }
        val bestSql = s"greatest(${scoreSql.map(_._2).mkString(", ")})"
        val caseSql = scoreSql
          .map { case (l, e) => s"WHEN $e = $bestSql THEN '$l'" }
          .mkString("CASE ", " ", " END")
        s"""SELECT doc_id, $caseSql AS pred_lang,
          ${scoreSql.map { case (l, e) => s"$e AS score_$l" }.mkString(", ")}
          FROM documents ORDER BY doc_id"""
      })
  )
}
