package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 dataset-curation operators beyond dedup: mixture sampling,
  * n-gram-level decontamination, and sequence packing — the steps that
  * turn a cleaned corpus into actual training batches.
  *
  * Scale notes (100 TB): mixture sampling is map-only (a deterministic
  * hash threshold per row); n-gram decontamination is a banded semi-join
  * on gram hashes (the eval side is small and broadcast); packing is
  * partition-local streaming fold — one shuffle to co-locate buckets,
  * then constant-memory iteration, never a driver loop.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "documents")

  /** Word n-gram hashes WITHOUT the short-document fallback (documents
    * shorter than n words contribute no grams — matching the SQL oracle,
    * unlike [[Dedup.shingleHashes]] which collapses them to one shingle
    * for near-dup recall).
    */
  private def gramHashes(c: org.apache.spark.sql.Column, n: Int) =
    TextOps.bindOnce(split(TextOps.normText(c), " "), toks =>
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast("array<bigint>")))

  /** Tokens-per-pack budget for d_pack_sequences. */
  private val PackBudget = 256L
  private val PackBuckets = 32

  /** Adds raw `dup_token_frac` / `dup_3gram_frac` columns computed from
    * a text column. Documents with fewer than 3 tokens have no 3-grams —
    * their dup_3gram_frac is defined as 0.0 (nothing can repeat), and the
    * gram construction is guarded so `sequence`/`slice` never see a
    * negative range (an unguarded `sequence(0, size-3)` counts DOWN for
    * short docs and `slice` throws on start 0).
    *
    * Deliberately STAGED projections: the token/gram arrays materialize
    * once per row and the fraction layer reads the counts. Expressed as
    * one flat select, every consumer of the gram array re-inlined its
    * O(tokens) construction (CollapseProject duplicates aliases into
    * each use site) — a measured ~6× slowdown of this operator.
    */
  def withRepetitionFracs(df: DataFrame,
      text: org.apache.spark.sql.Column): DataFrame = {
    val toks = split(TextOps.normText(text), " ")
    // grams slice the MATERIALIZED token column: an attribute reference
    // is O(1) per lambda element where the raw split expression re-runs
    // per element (see TextOps.bindOnce)
    val grams = when(size(col("__toks")) >= 3,
      transform(sequence(lit(0), size(col("__toks")) - 3),
        i => concat_ws(" ", slice(col("__toks"), i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
    df.withColumn("__toks", toks).withColumn("__grams", grams)
      .withColumn("__nt", size(col("__toks")).cast("double"))
      .withColumn("__dt", size(array_distinct(col("__toks"))).cast("double"))
      .withColumn("__ng", size(col("__grams")).cast("double"))
      .withColumn("__dg", size(array_distinct(col("__grams"))).cast("double"))
      .withColumn("dup_token_frac", lit(1.0) - col("__dt") / col("__nt"))
      .withColumn("dup_3gram_frac",
        when(col("__ng") > 0, lit(1.0) - col("__dg") / col("__ng"))
          .otherwise(lit(0.0)))
      .drop("__toks", "__grams", "__nt", "__dt", "__ng", "__dg")
  }

  def queries: Seq[GraftQuery] = Seq(
    // Weighted mixture sampling: each source gets a deterministic target
    // rate (derived from the source name so both engines agree) and rows
    // are kept by an md5-threshold on the doc id — reproducible across
    // runs, engines and partitionings, no RNG state. Map-only; the only
    // shuffle is the reporting aggregate.
    GraftQuery(
      "d_sample_mixture",
      (s, dir) => {
        val k = (ascii(substring(col("source"), 4, 1)) % 5 + 1) * 51
        val thr = lpad(lower(hex(k)), 2, "0")
        val kept =
          substring(md5(col("doc_id").cast("string")), 1, 2) < thr
        docs(s, dir)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
          .withColumn("frac_kept",
            round(col("n_kept").cast("double") /
              col("n_docs").cast("double"), 4))
          .orderBy("source")
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
          CAST(COUNT(*) FILTER (WHERE
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < printf('%02x', (ascii(substr(source, 4, 1)) % 5 + 1) * 51))
            AS BIGINT) AS n_kept,
          round(CAST(COUNT(*) FILTER (WHERE
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < printf('%02x', (ascii(substr(source, 4, 1)) % 5 + 1) * 51))
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS frac_kept
        FROM documents GROUP BY source ORDER BY source""")),

    // N-GRAM-level decontamination (the GPT-3-style pass): a training
    // document is contaminated if it shares ANY word 8-gram with the
    // eval set — catching partial copies the whole-document fingerprint
    // anti-join (d_decontaminate) misses. Gram HASHES travel, never gram
    // strings (xxhash64, ~2^-64 collision per pair); the eval gram set
    // is distinct + broadcast, the train side is an explode + semi-join,
    // both map-side at any corpus size.
    GraftQuery(
      "d_decontaminate_ngram",
      (s, dir) => {
        val d = docs(s, dir)
        val grams = d.select(col("doc_id"), col("source"),
          explode(gramHashes(col("text"), 8)).as("g"))
        val evalG = grams.filter(col("doc_id") % 17 === 0)
          .select("g").distinct()
        val contaminated = grams.join(broadcast(evalG), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        d.join(contaminated, Seq("doc_id"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_clean"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
            string_split(${TextOps.normTextSql}, ' ') AS t FROM documents),
          grams AS (SELECT doc_id, source,
            unnest(list_transform(range(1, len(t) - 7 + 1),
              i -> array_to_string(t[i:i+7], ' '))) AS g FROM toks),
          eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
          contam AS (SELECT DISTINCT doc_id FROM grams
            JOIN eval_g USING (g))
        SELECT source, COUNT(*) AS n_clean FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        GROUP BY source ORDER BY source""")),

    // Intra-document repetition scoring (the Gopher-rule family): the
    // fraction of duplicate tokens and duplicate word 3-grams within
    // each document, plus the resulting keep/drop flag — boilerplate and
    // looped generations score high and get filtered before training.
    // Pure column expressions, map-only, codegen'd end to end.
    GraftQuery(
      "d_repetition_score",
      (s, dir) => {
        withRepetitionFracs(docs(s, dir), col("text"))
          .select(col("doc_id"), col("source"),
            round(col("dup_token_frac"), 4).as("dup_token_frac"),
            round(col("dup_3gram_frac"), 4).as("dup_3gram_frac"),
            (col("dup_3gram_frac") > 0.2).as("flagged"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
            string_split(${TextOps.normTextSql}, ' ') AS t FROM documents),
          g AS (SELECT doc_id, source, t,
            list_transform(range(1, len(t) - 1),
              i -> array_to_string(t[i:i+2], ' ')) AS grams FROM toks)
        SELECT doc_id, source,
          round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
            / CAST(len(t) AS DOUBLE), 4) AS dup_token_frac,
          round(CASE WHEN len(grams) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
              / CAST(len(grams) AS DOUBLE) END, 4) AS dup_3gram_frac,
          (CASE WHEN len(grams) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
              / CAST(len(grams) AS DOUBLE) END) > 0.2 AS flagged
        FROM g ORDER BY doc_id""")),

    // Sequence packing: greedy next-fit of documents into fixed token
    // budgets — the step that turns documents into training sequences.
    // Deterministic at any parallelism: docs bucket by doc_id, buckets
    // co-locate via one shuffle, and a partition-local STREAMING fold
    // (sorted iterator, constant memory — no per-group materialization)
    // assigns pack ids; a document longer than the budget gets its own
    // overflow pack rather than being silently split. At 100 TB the
    // bucket count scales with corpus size; the fold stays O(1) memory.
    GraftQuery(
      "d_pack_sequences",
      (s, dir) => {
        import s.implicits._
        val budget = PackBudget
        val sorted = docs(s, dir)
          .select(
            pmod(col("doc_id"), lit(PackBuckets.toLong)).cast("int")
              .as("bucket"),
            col("doc_id"),
            TextOps.wsTokens(col("text")).as("n_tokens"))
          .repartition(PackBuckets, col("bucket"))
          .sortWithinPartitions("bucket", "doc_id")
          .as[(Int, Long, Long)]
        val packed = sorted.mapPartitions { it =>
          var curBucket = Int.MinValue
          var pack = 0L
          var used = 0L
          it.map { case (b, id, nt) =>
            if (b != curBucket) { curBucket = b; pack = 0L; used = 0L }
            else if (used + nt > budget && used > 0L) { pack += 1; used = 0L }
            used += nt
            (b, pack, id, nt)
          }
        }.toDF("bucket", "pack_id", "doc_id", "n_tokens")
        packed.groupBy("bucket", "pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            round(sum("n_tokens").cast("double") / budget.toDouble, 4)
              .as("fill"))
          .orderBy("bucket", "pack_id")
      },
      // packing is DETERMINISTIC (each bucket lives in one partition,
      // rows sorted by doc_id, greedy fold) — the oracle replays the
      // same fold row-by-row with a recursive CTE
      Some(s"""WITH RECURSIVE base AS (
          SELECT CAST(doc_id % $PackBuckets AS INTEGER) AS bucket, doc_id,
            ${TextOps.wsTokensSql} AS nt,
            ROW_NUMBER() OVER (PARTITION BY doc_id % $PackBuckets
              ORDER BY doc_id) AS rn
          FROM documents),
        state(bucket, rn, pack, used, nt) AS (
          SELECT bucket, rn, CAST(0 AS BIGINT), nt, nt
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.bucket, b.rn,
            CASE WHEN s.used + b.nt > $PackBudget AND s.used > 0
              THEN s.pack + 1 ELSE s.pack END,
            CASE WHEN s.used + b.nt > $PackBudget AND s.used > 0
              THEN b.nt ELSE s.used + b.nt END,
            b.nt
          FROM state s
          JOIN base b ON b.bucket = s.bucket AND b.rn = s.rn + 1)
        SELECT bucket, pack AS pack_id, COUNT(*) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(nt) AS DOUBLE) / $PackBudget.0, 4) AS fill
        FROM state GROUP BY bucket, pack ORDER BY bucket, pack_id""")),

    // The END-TO-END curation funnel: language gate → quality gate →
    // repetition gate → exact dedup → eval decontamination, reported as
    // cumulative per-source survivor counts (the table a pipeline owner
    // reads to see where documents die). One map-only flag pass feeds
    // the gate counts; dedup is a hash-partitioned keep-first window on
    // the survivor set; decontamination broadcasts the eval fingerprint
    // set — no stage shuffles the corpus more than once at any scale.
    GraftQuery(
      "d_curation_pipeline",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nTok = TextOps.wsTokens(col("text"))
        val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))
          .cast("double") / length(col("text")).cast("double")
        val stops = regexp_count(lower(col("text")),
          lit("\\b(the|and|of|to|in|a)\\b")).cast("double") /
          greatest(nTok.cast("double"), lit(1.0))
        val quality = least(nTok.cast("double") / lit(100.0), lit(1.0)) *
          (lit(1.0) - punct) * (lit(1.0) - stops)
        // ONE materialized flag pass: three consumers read it (gate
        // counts, dedup window, decontamination) — without the
        // checkpoint each branch re-runs the regexp/gram heavy scan
        // (measured ~3x this operator's cost)
        val base = withRepetitionFracs(docs(s, dir), col("text"))
          .withColumn("fp", md5(TextOps.normText(col("text"))))
          .withColumn("lang_ok", regexp_count(lower(col("text")),
            lit("\\b(the|and|of|to|in)\\b")) >= 1)
          .withColumn("q_ok", round(quality, 4) > 0.1)
          .withColumn("rep_ok", round(col("dup_3gram_frac"), 4) <= 0.2)
          .select("doc_id", "source", "fp", "lang_ok", "q_ok", "rep_ok")
          .localCheckpoint()
        val surv = base.filter(
          col("lang_ok") && col("q_ok") && col("rep_ok"))
        val deduped = surv.withColumn("__rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("__rn") === 1)
        val evalFps = docs(s, dir).filter(col("doc_id") % 17 === 0)
          .select(md5(TextOps.normText(col("text"))).as("fp")).distinct()
        val clean = deduped.join(broadcast(evalFps), Seq("fp"), "left_anti")
        val gates = base.groupBy("source").agg(
          count(lit(1)).as("n_raw"),
          sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang"),
          sum(when(col("lang_ok") && col("q_ok"), 1L).otherwise(0L))
            .as("n_quality"),
          sum(when(col("lang_ok") && col("q_ok") && col("rep_ok"), 1L)
            .otherwise(0L)).as("n_rep"))
        val nDedup = deduped.groupBy("source")
          .agg(count(lit(1)).as("n_dedup"))
        val nClean = clean.groupBy("source")
          .agg(count(lit(1)).as("n_clean"))
        gates.join(nDedup, Seq("source"), "left")
          .join(nClean, Seq("source"), "left")
          .select(col("source"), col("n_raw"), col("n_lang"),
            col("n_quality"), col("n_rep"),
            coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
            coalesce(col("n_clean"), lit(0L)).as("n_clean"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
            string_split(${TextOps.normTextSql}, ' ') AS t FROM documents),
          g AS (SELECT doc_id,
            list_transform(range(1, len(t) - 1),
              i -> array_to_string(t[i:i+2], ' ')) AS grams FROM toks),
          rep AS (SELECT doc_id,
            CASE WHEN len(grams) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                / CAST(len(grams) AS DOUBLE) END AS r3 FROM g),
          flags AS (SELECT d.doc_id, d.source,
            md5(${TextOps.normTextSql}) AS fp,
            (CAST(len(regexp_extract_all(lower(text),
              '\\b(the|and|of|to|in)\\b')) AS BIGINT) >= 1) AS lang_ok,
            (round(least(CAST(${TextOps.wsTokensSql} AS DOUBLE) / 100.0, 1.0)
              * (1.0 - CAST(len(regexp_extract_all(text,
                  '[^A-Za-z0-9\\s]')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE))
              * (1.0 - CAST(len(regexp_extract_all(lower(text),
                  '\\b(the|and|of|to|in|a)\\b')) AS DOUBLE)
                / greatest(CAST(${TextOps.wsTokensSql} AS DOUBLE), 1.0)), 4)
              > 0.1) AS q_ok,
            (round(rep.r3, 4) <= 0.2) AS rep_ok
            FROM documents d JOIN rep ON rep.doc_id = d.doc_id),
          s3 AS (SELECT * FROM flags WHERE lang_ok AND q_ok AND rep_ok),
          ded AS (SELECT *, row_number()
            OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM s3),
          evalf AS (SELECT DISTINCT md5(${TextOps.normTextSql}) AS fp
            FROM documents WHERE doc_id % 17 = 0),
          agg1 AS (SELECT source, COUNT(*) AS n_raw,
            CAST(COUNT(*) FILTER (WHERE lang_ok) AS BIGINT) AS n_lang,
            CAST(COUNT(*) FILTER (WHERE lang_ok AND q_ok) AS BIGINT)
              AS n_quality,
            CAST(COUNT(*) FILTER (WHERE lang_ok AND q_ok AND rep_ok)
              AS BIGINT) AS n_rep
            FROM flags GROUP BY source),
          agg2 AS (SELECT source, COUNT(*) AS n_dedup FROM ded
            WHERE rn = 1 GROUP BY source),
          agg3 AS (SELECT source, COUNT(*) AS n_clean FROM ded
            WHERE rn = 1 AND fp NOT IN (SELECT fp FROM evalf)
            GROUP BY source)
        SELECT source, n_raw, n_lang, n_quality, n_rep,
          CAST(coalesce(n_dedup, 0) AS BIGINT) AS n_dedup,
          CAST(coalesce(n_clean, 0) AS BIGINT) AS n_clean
        FROM agg1 LEFT JOIN agg2 USING (source)
          LEFT JOIN agg3 USING (source)
        ORDER BY source"""))
  )
}
