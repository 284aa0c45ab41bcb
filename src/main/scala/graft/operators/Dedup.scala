package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 deduplication operators over the `documents` table.
  *
  * Scale design (100 TB): every near-dup variant is *banded* — candidate
  * pairs come from an equi-join on a band/bucket key (hash-partitioned,
  * shuffle on the band key only), never from an all-pairs comparison. The
  * signature computation itself is map-only (higher-order functions over
  * token arrays, per-row state bounded by document length).
  */
object Dedup {

  // ---- shared building blocks -------------------------------------------

  /** Materialize `out` eagerly and release the persisted intermediates
    * that fed it. `Dataset.persist` registers with the SQL CacheManager,
    * which holds the blocks until an explicit `unpersist` — an operator
    * that returns a frame derived from a persisted subtree would leak
    * that cache into the shared session forever. `localCheckpoint`
    * blocks instead belong to the RDD's ContextCleaner scope: they are
    * dropped automatically once the returned frame is unreferenced on
    * the driver. (Trade-off: truncated lineage means lost blocks are not
    * recomputable after executor failure — on a real cluster prefer a
    * reliable checkpoint dir for multi-hour jobs.)
    */
  private def materializeAndRelease(out: DataFrame,
      cached: DataFrame*): DataFrame = {
    val res = out.localCheckpoint()
    cached.foreach(_.unpersist())
    res
  }

  /** Distinct word n-gram shingles of the normalized text (1-based slice).
    * Documents shorter than n words collapse to a single shingle.
    */
  def shingles(c: Column, n: Int): Column =
    TextOps.bindOnce(split(TextOps.normText(c), " "), toks =>
      array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array(concat_ws(" ", toks)))))

  /** Distinct word n-gram shingles as 64-bit HASHES, never materializing
    * shingle strings: tokens are hashed once, then each shingle hash is
    * xxhash64 over the n-window of token hashes. Jaccard over these long
    * arrays is exact up to hash collisions (~2^-64 per pair).
    */
  def shingleHashes(c: Column, n: Int): Column =
    TextOps.bindOnce(
      transform(split(TextOps.normText(c), " "), t => xxhash64(t)),
      th => array_distinct(
        when(size(th) >= n,
          transform(sequence(lit(0), size(th) - n),
            i => xxhash64(slice(th, i + 1, lit(n)))))
          .otherwise(array(xxhash64(th)))))

  /** MinHash signature. Each shingle STRING is hashed once (xxhash64);
    * the K permutations re-hash that fixed-width long (xxhash64(k, h))
    * instead of re-hashing the string K times — the dominant cost drops
    * from K string traversals to K constant-width hashes per shingle.
    * (Long-multiply permutation families would be cheaper still but ANSI
    * mode faults on the intentional wrap-around.)
    */
  def minhashSig(sh: Column, k: Int): Column =
    minhashSigFromHashes(transform(sh, x => xxhash64(x)), k)

  /** MinHash over pre-hashed (long) shingles. */
  def minhashSigFromHashes(hs: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), seed =>
      array_min(transform(hs, h => xxhash64(seed, h))))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash from an array of token hashes: bit i is set iff a majority
    * of token hashes have bit i set (unit weights). `bits` defaults to
    * 64; d_dedup_simhash uses 60 md5-derived bits so the signature is
    * recomputable in ANSI SQL (the oracle replays it bit-for-bit).
    */
  def simhash(hashes: Column, bits: Int = 64): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc + when(
        size(filter(hashes, h =>
          call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L))
          * 2 > size(hashes),
        call_function("shiftleft", lit(1L), i)).otherwise(0L))

  /** A 60-bit token hash BOTH engines can compute exactly: the first 15
    * hex chars of md5(token) as an integer. 60 bits keep every shift
    * inside a signed 64-bit long on both sides (DuckDB BIGINT overflow
    * is an error, so bit 63 is off-limits there).
    */
  def md5Hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** MinHash+LSH near-dup pairs (doc_a < doc_b, jac): 16 bands × 4 rows
    * by default; candidates from a band-hash equi-join, Jaccard-verified
    * on the shingle hashes. The signature subtree is persisted — it
    * feeds the band explode AND both sides of the verification join.
    */
  def minhashPairs(d: DataFrame, idCol: String, textCol: String,
      bands: Int = 16, rows: Int = 4, tau: Double = 0.5): DataFrame = {
    val sigs = d.select(
      col(idCol).as("doc_id"),
      shingleHashes(col(textCol), 3).as("sh"))
      .withColumn("sig", minhashSigFromHashes(col("sh"), bands * rows))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(slice(col("sig"), j * rows + 1, lit(rows)))))
        .as(Seq("band_id", "band_hash")))
    val a = banded.select(col("doc_id").as("doc_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("band_id"), col("band_hash"))
    val cand = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val verified = cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jac", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jac") >= tau)
      .select("doc_a", "doc_b", "jac")
    // pairs output is far smaller than the signature subtree; once it is
    // materialized the sigs cache must not outlive this call
    materializeAndRelease(verified, sigs)
  }

  /** Connected components over an undirected edge list `(a, b)` by
    * iterative min-label propagation: each round every node adopts the
    * minimum label in its neighborhood. One shuffle-join pair per round,
    * no driver state beyond the convergence counter; rounds needed =
    * cluster diameter — near-dup clusters are band-join cliques/short
    * chains, so a handful closes them. `maxIter` bounds adversarial
    * chains, and hitting it UNCONVERGED is an explicit failure (silently
    * returning split clusters would corrupt downstream dedup decisions;
    * callers with genuinely deep chains raise `maxIter`). Returns
    * (id, label) with label = min id of the component.
    *
    * SKEW: a power-law graph (hubs — the shape of link graphs and
    * coincidence-keyed dedup at web scale) concentrates one join key's
    * rows per hub in the per-round neighbor-min join; a hub with 100M
    * edges is one 100M-row reducer bucket no matter how many shuffle
    * partitions exist, and AQE's skew split only divides PARTITIONS,
    * not a single key's hash bucket in the build-side lookup. A
    * one-time degree probe (one cheap aggregate over the edge set)
    * routes the join through [[Skew.saltedJoin]] when the hottest
    * degree exceeds `saltAbove` — each hot key's rows split across
    * `salts` reducers at the cost of replicating the (id, label) table
    * `salts`×, the right trade only under real skew, hence the probe.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 15,
      saltAbove: Long = 4000000L, salts: Int = 8): DataFrame = {
    val e0 = edges.toDF("a", "b")
    val sym = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // degree probe: the max multiplicity of the join key decides the
    // per-round join strategy ONCE (degrees never change across rounds)
    val degRow = sym.groupBy("b").count().agg(max("count")).head()
    val skewed = !degRow.isNullAt(0) && degRow.getLong(0) > saltAbove
    // each round TRUNCATES lineage (localCheckpoint): without it the
    // logical plan nests one join-tree per round, making round i cost
    // O(i) analysis and deep iteration counts blow up the driver — the
    // label table is small ((id, label) pairs), so re-materializing it
    // per round is the cheap side of that trade
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val lbl = labels.withColumnRenamed("id", "b")
      val joined =
        if (skewed) Skew.saltedJoin(sym, lbl, Seq("b"), salts)
        else sym.join(lbl, "b")
      val nbrMin = joined
        .groupBy(col("a").as("id")).agg(min("label").as("nbr"))
      // carry the prior label through the round so convergence detection
      // is a filter over the checkpointed result, not a second full join
      // (was: next ⋈ labels per round just to count changed rows)
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
          col("label").as("__old"))
        .localCheckpoint()
      val changed = next.filter(col("label") =!= col("__old")).count()
      labels = next.select("id", "label")
      done = changed == 0L
      i += 1
    }
    sym.unpersist()
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter); raise maxIter")
    labels
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.tbl(s, dir, "documents")

  // ---- queries -----------------------------------------------------------

  def queries: Seq[GraftQuery] = Seq(
    // Exact dedup: hash-partitioned groupBy on the content fingerprint; no
    // driver-side state, scales linearly.
    GraftQuery(
      "d_dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), md5(TextOps.normText(col("text"))).as("fp"))
          .groupBy("fp")
          .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
          .orderBy("fp"),
      Some(s"""SELECT md5(${TextOps.normTextSql}) AS fp,
        min(doc_id) AS keeper_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY fp""")),

    // Deterministic train/eval split: hash-bucketed on a content-stable
    // key, reproducible across runs and engines (md5 hex prefix compare,
    // ~10% eval at < "1a" = 26/256). Map-only — no shuffle beyond the
    // verification aggregate.
    GraftQuery(
      "d_split_train_eval",
      (s, dir) => {
        val h = substring(md5(col("doc_id").cast("string")), 1, 2)
        docs(s, dir)
          .withColumn("split", when(h < "1a", "eval").otherwise("train"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("source", "split")
      },
      Some("""SELECT source,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
            THEN 'eval' ELSE 'train' END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1, 2 ORDER BY source, split""")),

    // Eval-set decontamination: drop every document whose normalized
    // content fingerprint appears in the benchmark set — catches exact
    // text copies, not just shared ids. Anti-join on the fingerprint
    // (hash-partitioned; the eval side is small → broadcast).
    GraftQuery(
      "d_decontaminate",
      (s, dir) => {
        val d = docs(s, dir)
        val fp = md5(TextOps.normText(col("text")))
        val evalFps = d.filter(col("doc_id") % 17 === 0)
          .select(fp.as("fp")).distinct()
        d.select(col("doc_id"), col("source"), fp.as("fp"))
          .join(broadcast(evalFps), Seq("fp"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_clean"))
          .orderBy("source")
      },
      Some(s"""WITH ev AS (SELECT DISTINCT md5(${TextOps.normTextSql}) AS fp
          FROM documents WHERE doc_id % 17 = 0)
        SELECT source, COUNT(*) AS n_clean FROM documents d
        WHERE md5(${TextOps.normTextSql}) NOT IN (SELECT fp FROM ev)
        GROUP BY 1 ORDER BY source""")),

    // MinHash + LSH near-dup detection: 64 hashes in 16 bands × 4 rows;
    // candidates from a band-hash equi-join; Jaccard-verified on shingles.
    GraftQuery(
      "d_dedup_minhash",
      (s, dir) =>
        minhashPairs(docs(s, dir), "doc_id", "text")
          .orderBy("doc_a", "doc_b"),
      // the oracle computes the EXACT answer with no banding at all:
      // every pair sharing any 3-gram shingle, scored by exact string
      // Jaccard at the same τ. Equality certifies both the hash-domain
      // Jaccard (string jac up to ~2^-64 collisions) AND full banding
      // recall — the corpus' near-dups sit at jac ≥ 0.9, where a
      // 16×4-band miss has probability (1-J⁴)¹⁶ ≈ 4e-8
      Some(s"""WITH toks AS (SELECT doc_id,
            string_split(${TextOps.normTextSql}, ' ') AS t
          FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(t) >= 3 THEN list_distinct(
              list_transform(range(1, len(t) - 1),
                i -> array_to_string(t[i:i+2], ' ')))
            ELSE [array_to_string(t, ' ')] END AS sh FROM toks),
        inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id),
        scored AS (SELECT c.doc_a, c.doc_b,
            ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
                  AS DOUBLE), 4) AS jac
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b)
        SELECT doc_a, doc_b, jac FROM scored WHERE jac >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Near-dup CLUSTER resolution: the step after pair generation in a
    // real curation pipeline — pairs → connected components → one keeper
    // per cluster (transitive closure: A≈B and B≈C cluster A,B,C even
    // when A,C never paired). Per-round cost is a band-key-sized join;
    // no driver state.
    GraftQuery(
      "d_dedup_cluster",
      (s, dir) => {
        val pairs = minhashPairs(docs(s, dir), "doc_id", "text")
          .select("doc_a", "doc_b")
        connectedComponents(pairs)
          .groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy("cluster_id")
      },
      // exact pairs (see d_dedup_minhash) + transitive closure via a
      // recursive CTE: per-component min-id labels and sizes must match
      // the distributed label propagation exactly
      Some(s"""WITH RECURSIVE toks AS (SELECT doc_id,
            string_split(${TextOps.normTextSql}, ' ') AS t
          FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(t) >= 3 THEN list_distinct(
              list_transform(range(1, len(t) - 1),
                i -> array_to_string(t[i:i+2], ' ')))
            ELSE [array_to_string(t, ' ')] END AS sh FROM toks),
        inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id),
        pairs AS (SELECT c.doc_a, c.doc_b
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
          WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
                  AS DOUBLE), 4) >= 0.5),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(a, b) AS (SELECT a, b FROM edges
          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        labels AS (SELECT a AS id, LEAST(a, MIN(b)) AS label
          FROM reach GROUP BY a)
        SELECT label AS cluster_id, COUNT(*) AS n_members
        FROM labels GROUP BY label ORDER BY cluster_id""")),

    // Connected components under POWER-LAW skew: a planted hub graph
    // (every doc links to hub doc_id % 4) gives four join keys carrying
    // N/4 edges each — one reducer bucket per hub regardless of shuffle
    // partitions, the failure shape AQE's partition-split cannot fix.
    // The low threshold trips the degree probe, routing every round's
    // neighbor-min join through Skew.saltedJoin; the oracle pins the
    // exact star components, so equality certifies the salted join
    // preserves label-propagation semantics bit-for-bit.
    GraftQuery(
      "d_dedup_cluster_skew",
      (s, dir) => {
        val d = docs(s, dir).select("doc_id")
        val edges = d.filter(col("doc_id") % 4 =!= col("doc_id"))
          .select(col("doc_id").as("a"), (col("doc_id") % 4).as("b"))
        connectedComponents(edges, saltAbove = 64L)
          .groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy("cluster_id")
      },
      // star components are closed-form: hub r collects every doc with
      // doc_id % 4 = r (the hub node itself included, +1), label = r
      Some("""SELECT CAST(doc_id % 4 AS BIGINT) AS cluster_id,
          CAST(COUNT(*) FILTER (WHERE doc_id != doc_id % 4) + 1
            AS BIGINT) AS n_members
        FROM documents GROUP BY 1
        HAVING COUNT(*) FILTER (WHERE doc_id != doc_id % 4) > 0
        ORDER BY cluster_id""")),

    // SimHash near-dup: 60-bit signature from md5-derived token hashes,
    // 4×15-bit chunk banding (any pair with hamming distance ≤ 3 leaves
    // at least one chunk untouched), verified by popcount of xor. The
    // hash is md5-based (not xxhash64) PRECISELY so the oracle can
    // replay the signature bit-for-bit in SQL: equality against the
    // all-pairs hamming join below certifies FULL banding recall on
    // this corpus, not just determinism — the banded equi-join stays
    // the engine's scale path (never all-pairs).
    GraftQuery(
      "d_dedup_simhash",
      (s, dir) => {
        val sigs = docs(s, dir)
          .select(col("doc_id"),
            transform(split(TextOps.normText(col("text")), " "),
              t => md5Hash60(t)).as("hs"))
          .select(col("doc_id"), simhash(col("hs"), bits = 60).as("sim"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val chunked = sigs.select(
          col("doc_id"), col("sim"),
          posexplode(transform(sequence(lit(0), lit(3)),
            c => call_function("shiftright", col("sim"), c * 15)
              .bitwiseAND(lit(0x7FFFL))))
            .as(Seq("chunk_id", "chunk_val")))
        val a = chunked.select(col("doc_id").as("doc_a"),
          col("sim").as("sim_a"), col("chunk_id"), col("chunk_val"))
        val b = chunked.select(col("doc_id").as("doc_b"),
          col("sim").as("sim_b"), col("chunk_id"), col("chunk_val"))
        materializeAndRelease(
          a.join(b, Seq("chunk_id", "chunk_val"))
            .filter(col("doc_a") < col("doc_b"))
            .select(col("doc_a"), col("doc_b"),
              bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long")
                .as("hamming"))
            .distinct()
            .filter(col("hamming") <= 3)
            .orderBy("doc_a", "doc_b"),
          sigs)
      },
      // EXACT replay: the same md5-bit signatures, then ALL-PAIRS
      // hamming (the oracle may brute-force; the engine may not) —
      // any pair the banding loses goes red
      Some(s"""WITH toks AS (SELECT doc_id,
            unnest(string_split(${TextOps.normTextSql}, ' ')) AS t
          FROM documents),
        th AS (SELECT doc_id,
            list_sum(list_transform(range(1, 16), i ->
              CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1
                AS BIGINT) * (CAST(1 AS BIGINT) << (4 * (15 - i)))))
              AS h
          FROM toks),
        bits AS (SELECT doc_id, b,
            SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, range(0, 60) r(b) GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
            SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b
              ELSE CAST(0 AS BIGINT) END) AS sim
          FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 3
        ORDER BY doc_a, doc_b""")),

    // n-gram Jaccard similarity join: inverted index on shingles with a
    // document-frequency cap (hot shingles contribute no candidates — they
    // would dominate the join at scale without separating near-dups).
    GraftQuery(
      "d_ngram_jaccard",
      (s, dir) => {
        val maxDf = 20
        val sh = docs(s, dir)
          .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val inverted = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val rare = inverted.groupBy("g")
          .agg(collect_list("doc_id").as("ids"), count(lit(1)).as("df"))
          .filter(col("df").between(2, maxDf))
        val cand = rare
          .select(explode(col("ids")).as("doc_a"), col("ids"))
          .select(col("doc_a"), explode(col("ids")).as("doc_b"))
          .filter(col("doc_a") < col("doc_b"))
          .distinct()
        val sa = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val sb = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        materializeAndRelease(
          cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jac", round(jaccard(col("sh_a"), col("sh_b")), 4))
            .filter(col("jac") >= 0.4)
            .select("doc_a", "doc_b", "jac")
            .orderBy("doc_a", "doc_b"),
          sh)
      },
      // the whole pipeline is string-shingle arithmetic — the oracle
      // replays it exactly: same 2-gram shingles, same df∈[2,20] cap,
      // same exact-Jaccard verification and 0.4 threshold
      Some(s"""WITH toks AS (SELECT doc_id,
            string_split(${TextOps.normTextSql}, ' ') AS t
          FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(t) >= 2 THEN list_distinct(
              list_transform(range(1, len(t)),
                i -> array_to_string(t[i:i+1], ' ')))
            ELSE [array_to_string(t, ' ')] END AS sh FROM toks),
        inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        rare AS (SELECT g, list(doc_id) AS ids FROM inv
          GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 20),
        c1 AS (SELECT unnest(ids) AS doc_a, ids FROM rare),
        c2 AS (SELECT doc_a, unnest(ids) AS doc_b FROM c1),
        cand AS (SELECT DISTINCT doc_a, doc_b FROM c2
          WHERE doc_a < doc_b),
        scored AS (SELECT c.doc_a, c.doc_b,
            ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sh, sb.sh)))
                  AS DOUBLE), 4) AS jac
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b)
        SELECT doc_a, doc_b, jac FROM scored WHERE jac >= 0.4
        ORDER BY doc_a, doc_b""")),

    // Exact duplicated-SPAN scoring (the exact-substring dedup family, at
    // 10-token-window granularity): a window occurring in more than one
    // document marks boilerplate; each doc reports how much of it is
    // covered by such windows, plus the keep/drop verdict. Inverted-index
    // shape: one shuffle keyed on span hash with map-side combine; the
    // per-span payload is a distinct-doc count, never a postings list —
    // no all-pairs work, no skew from viral spans.
    GraftQuery(
      "d_dedup_substring",
      (s, dir) => {
        val W = 10
        // span-hash arrays materialize ONCE (two consumers: the exploded
        // inverted index and the per-doc span counts); persisted with
        // LINEAGE intact, so an executor loss recomputes the lost
        // partitions instead of failing the job (the 100 TB posture —
        // localCheckpoint would truncate lineage for speed). The small
        // per-doc result is checkpointed at the end, which releases this
        // cache via materializeAndRelease.
        val d = Tables.tbl(s, dir, "documents")
          .withColumn("__gs",
            TextOps.bindOnce(split(TextOps.normText(col("text")), " "),
              toks => when(size(toks) >= W,
                transform(sequence(lit(0), size(toks) - W),
                  i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(W))))))
                .otherwise(array().cast("array<bigint>"))))
          .select(col("doc_id"), col("source"), col("__gs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val spans = d.select(col("doc_id"), explode(col("__gs")).as("g"))
        val dup = spans.groupBy("g")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1).select("g")
        val perDoc = spans.join(dup, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
        materializeAndRelease(
          d.select(col("doc_id"), col("source"),
              size(col("__gs")).cast("bigint").as("n_spans"))
            .join(perDoc, Seq("doc_id"), "left")
            .na.fill(0L, Seq("n_dup_spans"))
            .withColumn("dup_frac", round(
              when(col("n_spans") === 0, 0.0)
                .otherwise(col("n_dup_spans").cast("double") / col("n_spans")),
              4))
            .withColumn("keep", col("dup_frac") <= 0.5)
            .orderBy("doc_id"),
          d)
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
            string_split(${TextOps.normTextSql}, ' ') AS t FROM documents),
          grams AS (SELECT doc_id,
            unnest(list_transform(range(1, len(t) - 9 + 1),
              i -> array_to_string(t[i:i+9], ' '))) AS g FROM toks),
          dup AS (SELECT g FROM grams
            GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1),
          per AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM grams
            JOIN dup USING (g) GROUP BY doc_id),
          base AS (SELECT doc_id, source,
            CAST(GREATEST(len(t) - 9, 0) AS BIGINT) AS n_spans FROM toks),
          scored AS (SELECT b.doc_id, b.source, b.n_spans,
            COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
            round(CASE WHEN b.n_spans = 0 THEN 0.0
              ELSE COALESCE(p.n_dup_spans, 0) / CAST(b.n_spans AS DOUBLE)
              END, 4) AS dup_frac
            FROM base b LEFT JOIN per p USING (doc_id))
        SELECT doc_id, source, n_spans, n_dup_spans, dup_frac,
          (dup_frac <= 0.5) AS keep
        FROM scored ORDER BY doc_id"""))
  )
}
