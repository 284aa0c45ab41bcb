package graft.table

import graft.functions.transforms
import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField => SparkField, _}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Spark-first Iceberg-semantics table (reference: the whole
  * /root/reference/src/model — this is the execution layer the reference's
  * metadata model implies but does not ship).
  *
  * Layout: `location/metadata/v{N}.metadata.json` (TableMetadataV2, spec
  * kebab-case JSON); per-snapshot `snap-{id}.manifest-list.json`
  * referencing immutable `manifest-{id}.jsonl` files (shared across
  * snapshots); parquet data files under `location/data/{writeId}/`
  * (partition dirs derived by the spec).
  *
  * Design for 100 TB:
  *   - planning = transform-aware partition + min/max file pruning BEFORE
  *     any Spark job touches data (Pruning.mayMatch), then a parquet scan
  *     of only surviving files with the residual filter pushed down;
  *   - writes are ordinary distributed parquet writes (hidden partitioning
  *     derives partition dirs from transform expressions; source columns
  *     stay in the data files) followed by one distributed stats pass over
  *     the new files only;
  *   - commits REUSE the parent's untouched manifests and add one manifest
  *     for the change — O(changed files) metadata per commit, so appends
  *     stay constant-cost at millions of files (mutations rewrite only
  *     the manifests whose entries they touch);
  *   - commits are atomic CREATE_NEW of the next metadata version
  *     (optimistic concurrency; conflicts rebase and retry);
  *   - manifests are JSON-lines so the planning side scales out by
  *     switching the reader from driver-side lines to a Spark JSON scan
  *     (see manifestDf/planFilesDistributed).
  */
class GraftTable private (val spark: SparkSession, val location: String,
    private[graft] val io: MetadataIo = FileMetadataIo) {

  import GraftTable._

  // every table op may read manifest-certified leaf-file lists; pin the
  // discovery threshold once per table handle (see pinReadDiscovery)
  GraftTable.pinReadDiscoveryFor(spark)

  private def metaDir: Path = Paths.get(location, "metadata")

  /** Latest committed metadata (highest v{N}.metadata.json). */
  def metadata: TableMetadataV2 = metadataWithVersion._2

  /** (version, metadata) pair — commits pin this BASE version and claim
    * exactly base+1, so any commit that lands between our read and our
    * write surfaces as CommitConflictException instead of being silently
    * overwritten (lost update).
    */
  private def metadataWithVersion: (Int, TableMetadataV2) =
    io.latest(location)
      .getOrElse(throw new IllegalStateException(s"no table at $location"))

  private def latestVersion(dir: Path): Option[(Int, Path)] =
    FileMetadataIo.latestVersion(dir)

  // ------------------------------------------------------------- commit ----

  private def writeMetadata(meta: TableMetadataV2): Unit =
    io.commit(location, None, meta)

  /** Commit EXACTLY the version after `base` through this table's
    * [[MetadataIo]] (file CREATE_NEW, or the REST catalog's
    * requirements-guarded commit). A commit landing in between
    * conflicts loudly.
    */
  private def writeMetadataAt(meta: TableMetadataV2,
      base: (Int, TableMetadataV2)): Unit =
    io.commit(location, Some(base), meta)

  private def manifestListPath(snapshotId: Long): Path =
    metaDir.resolve(s"snap-$snapshotId.manifest-list.json")

  /** Commit a new snapshot: REUSE the untouched manifests of the parent
    * and write ONE new manifest for this commit's carried entries plus
    * refs to any executor-written shard manifests — O(changed files)
    * metadata per commit regardless of table size, and the driver never
    * materializes the per-file stats of freshly written data (shards
    * inherit snapshot id / sequence number from their ManifestRef).
    */
  private def commitSnapshot(op: String,
      buildRefs: TableMetadataV2 =>
        (Seq[ManifestRef], PendingAdds, Map[String, String]),
      propsExtra: Map[String, String] = Map.empty,
      toBranch: Option[String] = None,
      invalidateSortClaim: Boolean = false)
      : SnapshotV2 = {
    val (baseVersion, meta) = metadataWithVersion
    val (reused, adds, summaryExtra) = buildRefs(meta)
    val snapId = newSnapshotId()
    val seq = meta.lastSequenceNumber + 1
    // data, position-delete, and equality-delete entries go to SEPARATE
    // manifests so the read path locates delete files from O(refs)
    // metadata alone
    val entryRefs = Seq((0, ""), (1, "-deletes"), (2, "-eq-deletes"))
        .flatMap { case (ct, sfx) =>
      val mine = adds.entries.filter(_.content == ct)
      if (mine.isEmpty) Seq.empty else {
        val stamped = mine.map(e =>
          if (e.snapshotId == PendingSnapshot)
            e.copy(snapshotId = snapId, sequenceNumber = seq)
          else e)
        val mf = metaDir.resolve(s"manifest-$snapId$sfx.jsonl")
        Files.createDirectories(metaDir)
        DataFileEntry.writeManifest(mf, stamped)
        // the ADDED stamp must ride on the REF too: concurrent rewrites
        // detect "a delete landed after my read" from ref-level
        // added-sequence alone — a None here made a racing re-cluster
        // blind to a just-committed MoR delete (resurrection bug)
        Seq(ManifestRef(mf.toString, stamped.size.toLong,
          stamped.map(_.recordCount).sum, Some(snapId), Some(seq),
          content = ct,
          // manifest-level pruning: record the distinct partition tuples
          // (data manifests only — deletes are never filter-pruned)
          partitionSummary =
            if (ct == 0) ManifestRef.summarize(stamped) else None))
      }
    }
    // shard manifests stay exactly where executors wrote them; only the
    // ref (with inherited ids) is created at commit time, so a conflict
    // retry re-refs the same shards without any rewrite
    val shardRefs0 = adds.shards.map(s => ManifestRef(s.path, s.entryCount,
      s.recordCount, Some(snapId), Some(seq), content = s.content,
      partitionSummary = if (s.content == 0) s.partitions else None))
    // row lineage: FRESH data shards (appends, MERGE inserts) get
    // first-row-id bases assigned cumulatively from the table's
    // next-row-id — O(shards) driver work; entries resolve base + their
    // shard-local offset at read time. Rewrite shards (compaction, CoW,
    // MERGE's target side) carry materialized ids and stay unassigned.
    val lineageOn = meta.properties
      .exists(_.get(GraftTable.RowLineageProp).contains("true"))
    def fresh(s: ShardRef): Boolean = s.content == 0 && s.lineageFresh
    val lineageAdds =
      if (!lineageOn) 0L
      else adds.shards.filter(fresh).map(_.recordCount).sum
    val lineageBase: Option[Long] =
      if (lineageAdds == 0L) None
      else Some(meta.nextRowId.getOrElse {
        require(reused.filter(_.content == 0).map(_.recordCount).sum == 0L,
          "row lineage must be enabled before the first append " +
            "(existing rows have no ids)")
        0L
      })
    val shardRefs =
      if (lineageAdds == 0L) shardRefs0
      else {
        var next = lineageBase.get
        adds.shards.zip(shardRefs0).map { case (s, r) =>
          if (!fresh(s)) r
          else { val b = next; next += r.recordCount
            r.copy(firstRowId = Some(b)) }
        }
      }
    val mrefs = reused ++ entryRefs ++ shardRefs
    ManifestList.write(manifestListPath(snapId), mrefs)
    val now = System.currentTimeMillis
    // a branch commit parents off the BRANCH head and moves only that
    // ref; main (currentSnapshotId + snapshot log) stays untouched —
    // the write-audit-publish isolation property
    val parentId = toBranch match {
      case Some(b) => Some(meta.refs.flatMap(_.get(b)).getOrElse(
        throw new IllegalArgumentException(s"no branch $b")).snapshotId)
      case None => meta.currentSnapshotId
    }
    // appends additionally record their EXACT per-commit adds (every
    // entry/shard of an append is new): streaming admission control
    // reads these directly instead of deriving deltas from the totals
    val addedSummary =
      if (op != "append") Map.empty[String, String]
      else {
        val mine = entryRefs ++ shardRefs
        Map(
          "added-data-files" ->
            mine.filter(_.content == 0).map(_.entryCount).sum.toString,
          "added-records" ->
            mine.filter(_.content == 0).map(_.recordCount).sum.toString)
      }
    // the parent's SEQUENCE rides in the summary so the changelog can
    // verify range completeness even after the parent snapshot expires
    // (sequence numbers are table-global — a branch commit may consume
    // one — so the walk cannot assume lineage sequences are dense)
    val parentSeqSummary = parentId
      .flatMap(id => meta.snapshotById(id))
      .map(p => Map(
        "parent-sequence-number" -> p.sequenceNumber.toString))
      .getOrElse(Map.empty)
    val snap = SnapshotV2(snapId, parentId, seq, now,
      manifestListPath(snapId).toString,
      Summary(Some(op), summaryExtra ++ addedSummary ++
        parentSeqSummary ++ Map(
        "total-data-files" ->
          mrefs.filter(_.content == 0).map(_.entryCount).sum.toString,
        "total-records" ->
          mrefs.filter(_.content == 0).map(_.recordCount).sum.toString) ++
        (if (mrefs.exists(_.content != 0)) Map(
          "total-delete-files" ->
            mrefs.filter(_.content != 0).map(_.entryCount).sum.toString,
          // delete ROWS rollup (positions for pos-deletes — exact rows
          // removed; key rows for eq-deletes — a proxy): changelog
          // admission charges delete commits by this delta so row caps
          // bound delete-heavy backlogs too
          "total-delete-records" ->
            mrefs.filter(_.content != 0).map(_.recordCount).sum.toString)
        else Map.empty)),
      Some(meta.currentSchemaId.toLong),
      // v3: the first row id this commit assigned (lineage commits only)
      firstRowId = lineageBase)
    val target = toBranch.getOrElse("main")
    // a commit MOVES the target ref; it must not clobber the ref's
    // declared retention policy (an appendToBranch onto a WAP branch
    // with a short max-ref-age would otherwise silently pin it forever)
    val refs0 = meta.refs.getOrElse(Map.empty)
    val refs = refs0 + (target -> SnapshotRef(snapId,
      refs0.get(target).map(_.retention)
        .getOrElse(BranchRetention(1, Long.MaxValue, Long.MaxValue))))
    try writeMetadataAt(meta.copy(
      lastSequenceNumber = seq,
      lastUpdatedMs = now,
      currentSnapshotId =
        if (toBranch.isEmpty) Some(snapId) else meta.currentSnapshotId,
      snapshots = Some(meta.snapshots.getOrElse(Seq.empty) :+ snap),
      snapshotLog =
        if (toBranch.isEmpty)
          Some(meta.snapshotLog.getOrElse(Seq.empty) :+
            SnapshotLog(snapId, now))
        else meta.snapshotLog,
      properties = {
        val p0 = meta.properties.getOrElse(Map.empty) ++ propsExtra
        // files written under an EXPLICIT non-default sort (z-order, ad
        // hoc re-cluster) are NOT clustered by the declared order:
        // advance the ordering watermark past this commit so
        // SupportsReportOrdering never claims them sorted
        val p =
          if (invalidateSortClaim &&
              p0.contains(GraftTable.SortSinceSeqProp))
            p0 + (GraftTable.SortSinceSeqProp -> seq.toString)
          else p0
        if (p.isEmpty) None else Some(p)
      },
      nextRowId =
        if (lineageAdds == 0L) meta.nextRowId
        else Some(meta.nextRowId.getOrElse(0L) + lineageAdds),
      // deletion vectors are a v3-only manifest feature invisible from
      // the metadata JSON itself: committing one permanently raises the
      // declared format floor so metadata and manifests agree (a v2
      // metadata over v3 manifests is a layout external readers reject)
      formatVersion =
        if (adds.entries.exists(_.dv.isDefined)) 3 else meta.formatVersion,
      refs = Some(refs)), (baseVersion, meta))
    catch {
      case e: CommitConflictException =>
        // lost the race: remove the manifest/list files this attempt
        // wrote (referenced by nothing) so retries don't leak metadata
        Files.deleteIfExists(manifestListPath(snapId))
        Files.deleteIfExists(metaDir.resolve(s"manifest-$snapId.jsonl"))
        Files.deleteIfExists(metaDir.resolve(s"manifest-$snapId-deletes.jsonl"))
        Files.deleteIfExists(metaDir.resolve(s"manifest-$snapId-eq-deletes.jsonl"))
        throw e
    }
    snap
  }

  // ------------------------------------------------------------- write ----

  /** Append rows (hidden partitioning per the default spec). Returns the
    * new snapshot. Appends are conflict-free by construction (the new
    * files union with whatever the current manifest holds), so a lost
    * commit race is retried against the fresh state.
    */
  /** True when an explicit `sortWithin` re-states the table's default
    * sort order (identity ASC on the same source columns, in order —
    * rendered column names compared, the shape the compact procedure's
    * sort strategy passes): such a rewrite PRESERVES the reported-
    * ordering claim. Anything else (z-order interleaves, different
    * columns, directions) conservatively invalidates it (see
    * [[GraftTable.SortSinceSeqProp]]).
    */
  private def sortsMatchDefault(meta: TableMetadataV2,
      sorts: Seq[Column]): Boolean = {
    val order = meta.sortOrders
      .find(_.orderId == meta.defaultSortOrderId).filter(_.orderId != 0)
    order.exists { o =>
      val names = o.fields.flatMap(f =>
        if (f.transform == TIdentity && f.direction == SortAsc)
          meta.currentSchema.fieldById(f.sourceId).map(_.name)
        else None)
      names.length == o.fields.length &&
        sorts.map(_.toString) == names
    }
  }

  def append(df: DataFrame, sortWithin: Seq[Column] = Seq.empty,
      repartitionByPartition: Boolean = false): SnapshotV2 =
    appendWithSummary(df, Map.empty, sortWithin, repartitionByPartition)

  private def appendWithSummary(df: DataFrame,
      summaryExtra: Map[String, String], sortWithin: Seq[Column] = Seq.empty,
      repartitionByPartition: Boolean = false,
      propsExtra: Map[String, String] = Map.empty): SnapshotV2 = {
    val adds = writeFiles(df, sortWithin, repartitionByPartition,
      lineageFresh = true)
    val nonDefaultSort = sortWithin.nonEmpty &&
      !sortsMatchDefault(metadata, sortWithin)
    retryingCommit(() => commitSnapshot("append",
      meta => (manifestsFor(meta, None), adds, summaryExtra), propsExtra,
      invalidateSortClaim = nonDefaultSort))
  }

  /** Run an optimistic commit, rebasing and retrying on version-claim
    * conflicts with jittered backoff so N racing writers serialize
    * instead of starving one. `body` must RE-DERIVE anything that
    * depends on current table state on each call.
    */
  private def retryingCommit(body: () => SnapshotV2,
      maxAttempts: Int = 20): SnapshotV2 = {
    var attempts = 0
    while (true) {
      attempts += 1
      try return body()
      catch { case _: CommitConflictException if attempts < maxAttempts =>
        Thread.sleep(5L * attempts + scala.util.Random.nextInt(25)) }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Metadata-only commit with rebase-and-retry: each attempt re-reads
    * fresh state and re-applies `change` (validations included), so DDL
    * and ref operations succeed under concurrent writers — a busy
    * streaming table commits continuously and would otherwise make
    * every ALTER spuriously fail on the version claim.
    */
  private def retryingMetadata(
      change: TableMetadataV2 => TableMetadataV2): Unit = {
    var attempts = 0
    while (true) {
      attempts += 1
      val (v, meta) = metadataWithVersion
      try { writeMetadataAt(change(meta), (v, meta)); return }
      catch {
        case _: CommitConflictException if attempts < 20 =>
          Thread.sleep(5L * attempts + scala.util.Random.nextInt(25))
      }
    }
  }

  /** Iceberg data files REQUIRE int64-micros timestamps; Spark still
    * defaults TimestampType to the non-standard INT96 (stats-less and
    * unreadable by spec-conforming readers), so every graft parquet
    * write pins TIMESTAMP_MICROS on the WRITING session — df.write reads
    * the conf from the dataframe's own session, which under foreachBatch
    * is the micro-batch clone, not the table's.
    *
    * The pin is deliberately session-wide and NOT restored: parquet has
    * no per-write option for it (ParquetOptions carries only
    * compression/mergeSchema/rebase), and save-restore would race
    * concurrent writers on the same session (ConcurrencySpec's shape) —
    * a thread restoring INT96 mid-way through another thread's write
    * would silently emit non-conformant files. The documented contract:
    * a session that writes graft tables writes standard int64-micros
    * timestamps everywhere.
    */
  private def pinParquetTs(df: DataFrame): Unit = {
    df.sparkSession.conf.set(
      "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // Manifest stats certify EXACT global MIN/MAX answers for
    // statAggregable types (strings/decimals) from footer min/max —
    // parquet permits TRUNCATED column-chunk statistics (e.g. a harness
    // setting parquet.statistics.truncate.length on the Hadoop conf),
    // which the pre-V2 Statistics API cannot distinguish from exact
    // ones. Pin truncation OFF on every writing session, same contract
    // as the timestamp pin above.
    df.sparkSession.sparkContext.hadoopConfiguration.setInt(
      "parquet.statistics.truncate.length", Int.MaxValue)
  }

  /** Commit-cost pin, scoped PER WRITE as a writer option (Spark forwards
    * unrecognized file-source options into the write job's hadoop conf) —
    * r20 ADVICE: the old session-wide hadoopConfiguration pin silently
    * stripped job-commit atomicity from every non-graft df.write in the
    * same session. Algorithm v2 renames task output to its final name at
    * TASK commit instead of leaving the whole merge to a single-threaded
    * driver walk at JOB commit — graft never relies on job-commit
    * atomicity (every write targets a fresh writeId dir and the snapshot
    * manifests exactly the files found there after the job succeeds, so
    * a torn job leaves only unreferenced files the orphan sweep
    * reclaims). _SUCCESS markers stay ON: the changelog/stream staging
    * protocol gates range readiness on them (GraftChangelog.scala,
    * _SUCCESS check) — suppressing them made a concurrent reader wipe
    * and re-stage a live range (verified: s_cdf_stream
    * FileNotFoundException).
    */
  private def commitPinned[T](w: org.apache.spark.sql.DataFrameWriter[T])
      : org.apache.spark.sql.DataFrameWriter[T] =
    w.option("mapreduce.fileoutputcommitter.algorithm.version", "2")

  /** Write df's files under a fresh writeId; return pending adds (shard
    * manifests written by executors — no per-file rows on the driver).
    */
  private def writeFiles(df: DataFrame, sortWithin: Seq[Column] = Seq.empty,
      repartitionByPartition: Boolean = false,
      lineageFresh: Boolean = false): PendingAdds = {
    pinParquetTs(df)
    val meta = metadata
    val spec = meta.defaultSpec
    val schema = meta.currentSchema
    // data-file format: write.format.default (parquet | orc). Per-file —
    // existing files keep their manifest-recorded format; see
    // [[GraftTable.WriteFormatProp]] for the ORC restrictions.
    val fmt = meta.properties.getOrElse(Map.empty)
      .getOrElse(GraftTable.WriteFormatProp, DataFileEntry.Parquet)
    require(fmt == DataFileEntry.Parquet || fmt == DataFileEntry.Orc ||
      fmt == DataFileEntry.Avro,
      s"${GraftTable.WriteFormatProp}='$fmt' is unsupported for writes " +
        "(parquet | orc | avro)")
    require(fmt == DataFileEntry.Parquet || !lineageEnabled(meta),
      "row-lineage tables write parquet only: lineage inheritance reads " +
        "file positions (_metadata.row_index), which only parquet has — " +
        s"unset ${GraftTable.RowLineageProp} or keep " +
        s"${GraftTable.WriteFormatProp}=parquet")
    // `time` columns surface as LongType, but Spark would write them as
    // plain INT64 without the spec-required TIME(MICROS) annotation —
    // silently degrading every external reader of the data files. The
    // READ path stays full (reference-written TIME files scan fine);
    // writes are rejected until the table evolves the column away.
    schema.fields.find(f => GraftTable.containsTime(f.fieldType))
      .foreach(f => throw new IllegalArgumentException(
        s"column ${f.name}: writing `time` columns is unsupported — Spark " +
          "writes INT64 without the TIME(MICROS) annotation external " +
          "readers require; store micros-since-midnight as `long` instead"))
    val sparkSchema = toSparkSchema(schema)
    val writeId = java.util.UUID.randomUUID.toString.take(8)
    val writeDir = s"$location/data/$writeId"

    val partNames = spec.fields.map(_.name)
    // align input columns to the table's exact types: UPCASTS are applied
    // (e.g. int input into a long column), narrowing is rejected loudly —
    // a silent cast would truncate values, no cast would write files the
    // schema-pinned reader rejects at scan time
    val inputTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // lineage-preserving rewrites hand their read's _row_id /
    // _last_updated_sequence_number through into the rewritten files as
    // physical columns (absent first-row-id marks them materialized)
    val lineageCarry =
      if (!lineageEnabled(meta)) Seq.empty
      else Seq(GraftTable.RowIdCol, GraftTable.LastUpdCol)
        .filter(df.columns.contains)
    var out = df.select(sparkSchema.fields.map { f =>
      inputTypes.get(f.name) match {
        case Some(in) if in == f.dataType => col(f.name)
        case Some(in) if org.apache.spark.sql.catalyst.expressions.Cast
          .canUpCast(in, f.dataType) => col(f.name).cast(f.dataType).as(f.name)
        case Some(in) => throw new IllegalArgumentException(
          s"column ${f.name}: input type $in does not safely widen to " +
            s"table type ${f.dataType}")
        case None =>
          // v3 write-default: an input omitting the column writes the
          // declared default; without one the analysis error surfaces
          schema.fields.find(_.name == f.name)
            .flatMap(ice => ice.writeDefault.map(d =>
              GraftTable.defaultLiteral(Some(d), ice.fieldType).as(f.name)))
            .getOrElse(col(f.name))
      }
    } ++ lineageCarry.map(col): _*)
    spec.fields.foreach { pf =>
      val src = schema.fieldById(pf.sourceId)
        .getOrElse(throw new IllegalArgumentException(
          s"spec source id ${pf.sourceId} not in schema"))
      val srcType = sparkSchema(src.name).dataType
      out = out.withColumn(pf.name,
        transformColumn(pf.transform, col(src.name), srcType))
    }
    // explicit sortWithin wins; otherwise the table's default SortOrder
    // applies automatically (clustered files → tight min/max stats)
    val effectiveSort =
      if (sortWithin.nonEmpty) sortWithin
      else meta.sortOrders.find(_.orderId == meta.defaultSortOrderId)
        .filter(_.orderId != 0).map(_.fields.flatMap { f =>
          schema.fieldById(f.sourceId).map { src =>
            val c = transformColumn(f.transform, col(src.name),
              sparkSchema(src.name).dataType)
            (f.direction, f.nullOrder) match {
              case (SortAsc, NullsFirst) => c.asc_nulls_first
              case (SortAsc, NullsLast) => c.asc_nulls_last
              case (SortDesc, NullsFirst) => c.desc_nulls_first
              case (SortDesc, NullsLast) => c.desc_nulls_last
            }
          }
        }).getOrElse(Seq.empty)
    // declarative shuffle before the write — the write.distribution-mode
    // table property (explicit repartitionByPartition wins):
    //   hash  → one shuffle clustering rows by partition tuple (fewest
    //           files: one per partition value per write)
    //   range → global range shuffle on (partition, sort) keys: files
    //           carry DISJOINT key ranges, the layout scan pruning wants
    //   none/absent → keep the input partitioning (fastest, may fan out)
    val distMode = meta.properties.getOrElse(Map.empty)
      .get("write.distribution-mode")
    if (repartitionByPartition && partNames.nonEmpty)
      out = out.repartition(partNames.map(col): _*)
    else distMode match {
      case Some("hash") if partNames.nonEmpty =>
        out = out.repartition(partNames.map(col): _*)
      case Some("range")
          if partNames.nonEmpty || effectiveSort.nonEmpty =>
        out = out.repartitionByRange(
          partNames.map(col) ++ effectiveSort: _*)
      case Some(m) if m != "none" && m != "hash" && m != "range" =>
        throw new IllegalArgumentException(
          s"unknown write.distribution-mode '$m' (none | hash | range)")
      case _ => ()
    }
    // partition columns lead the sort: FileFormatWriter REQUIRES rows
    // ordered by the partition expressions and silently inserts its own
    // partition-only sort when they are not — which would destroy the
    // requested clustering. Leading with them satisfies the writer's
    // required ordering, so the data-column order survives into files.
    if (effectiveSort.nonEmpty)
      out = out.sortWithinPartitions(
        partNames.map(col) ++ effectiveSort: _*)

    // avro branches off here: no Spark datasource exists for it, so the
    // encode + hive fanout + INLINE stats run in one mapPartitions pass
    // (AvroDataWrite; the write IS the stats job — no second scan)
    if (fmt == DataFileEntry.Avro)
      return writeAvroFiles(out, writeDir, writeId, meta, schema,
        sparkSchema, spec, lineageFresh)

    // bloom'd columns also get PARQUET-native bloom filters: the manifest
    // sidecar skips whole FILES at planning, the in-file bloom skips ROW
    // GROUPS inside the survivors (Spark's reader applies it to pushed
    // point predicates automatically)
    // file sizing: the write.target-records-per-file property rolls the
    // writer to a fresh file at the cap, bounding file sizes regardless
    // of task partitioning (Spark's maxRecordsPerFile — no extra shuffle)
    val sized = meta.properties.getOrElse(Map.empty)
      .get("write.target-records-per-file").map(_.toLong)
      .foldLeft(commitPinned(out.write.mode("errorifexists")))(
        (w, n) => w.option("maxRecordsPerFile", n))
    val bloomCols = Blooms
      .bloomColumns(meta.properties.getOrElse(Map.empty), sparkSchema)
    val writer =
      if (fmt == DataFileEntry.Orc)
        // ORC's native blooms are one comma-separated writer option
        if (bloomCols.isEmpty) sized
        else sized.option("orc.bloom.filter.columns",
          bloomCols.map(_._1).mkString(","))
      else bloomCols.foldLeft(sized) { case (w, (name, _)) =>
        w.option(s"parquet.bloom.filter.enabled#$name", "true")
      }
    val parted =
      if (partNames.nonEmpty) writer.partitionBy(partNames: _*) else writer
    if (fmt == DataFileEntry.Orc) parted.orc(writeDir)
    else parted.parquet(writeDir)

    // an empty input writes no data files (e.g. a CoW rewrite that
    // removes every row of the affected files) — nothing to commit
    val wrote = {
      val dir = Paths.get(writeDir)
      Files.isDirectory(dir) && {
        val stream = Files.walk(dir)
        try stream.iterator.asScala
          .exists(_.getFileName.toString.endsWith(s".$fmt"))
        finally stream.close()
      }
    }
    val shards =
      if (!wrote) Seq.empty
      else writeStatsShards(writeDir, schema, sparkSchema, spec, writeId,
        meta.properties.getOrElse(Map.empty), fmt)
        .map(_.copy(lineageFresh = lineageFresh))
    if (shards.isEmpty) {
      // nothing to commit — reclaim the (possibly 0-row-part-only) data
      // dir and any pre-created shard dir NOW: a long-idle streaming
      // sink's no-data micro-batches would otherwise orphan one dir pair
      // per trigger, forever
      deleteRecursively(Paths.get(writeDir))
      deleteRecursively(metaDir.resolve(s"manifest-shards-$writeId"))
      PendingAdds.empty
    } else PendingAdds(Seq.empty, shards)
  }

  /** The avro leg of [[writeFiles]] (write.format.default=avro):
    * executors encode + fan out + accumulate manifest stats in ONE
    * mapPartitions pass (AvroDataWrite). The DSv2/SQL read path bridges
    * avro-bearing tables through the engine scan keyed on the has-avro
    * flag, so the flag is stamped BEFORE the data commit — no snapshot
    * ever references an avro file while the flag is unset.
    */
  private def writeAvroFiles(out: DataFrame, writeDir: String,
      writeId: String, meta: TableMetadataV2, schema: SchemaV2,
      sparkSchema: StructType, spec: PartitionSpec,
      lineageFresh: Boolean): PendingAdds = {
    val props = meta.properties.getOrElse(Map.empty)
    require(Blooms.bloomColumns(props, sparkSchema).isEmpty,
      "bloom sidecars require parquet or orc writes — they ride the " +
        "vectorized scan pass, which avro files cannot join")
    if (!props.get(GraftTable.HasAvroProp).contains("true"))
      updateProperties(Map(GraftTable.HasAvroProp -> Some("true")))
    val shardDir = metaDir.resolve(s"manifest-shards-$writeId")
    Files.createDirectories(shardDir)
    val shards = AvroDataWrite.write(out, writeDir, schema, sparkSchema,
      spec, shardDir.toString,
      props.get("write.target-records-per-file").map(_.toLong),
      spark.sparkContext.hadoopConfiguration)
      .map(_.copy(lineageFresh = lineageFresh))
    sweepOrphanShards(shardDir, shards)
    if (shards.isEmpty) {
      deleteRecursively(Paths.get(writeDir))
      deleteRecursively(shardDir)
      PendingAdds.empty
    } else PendingAdds(Seq.empty, shards)
  }

  private def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }

  /** Stats shards for the freshly written files under `writeDir`:
    * manifest-entry JSONL written by EXECUTORS (one shard per task), the
    * driver sees only O(shards) rollup rows. Two paths:
    *
    *   - FOOTER path (default): per-column min/max/null-count merged
    *     across row groups straight off each file's parquet footer — an
    *     O(files) metadata pass. The previous shape re-read 100% of the
    *     data a write had just produced; at 100 TB that second scan IS
    *     the commit cost.
    *   - SCAN path: the original distributed aggregate over the data —
    *     required when bloom sidecars are configured (blooms genuinely
    *     need the values), and forced by spark.graft.footerStats=false
    *     (the equivalence spec uses this to prove the two paths emit
    *     identical stats).
    *
    * Entries carry PendingSnapshot and inherit ids from their
    * ManifestRef at commit time.
    */
  private def writeStatsShards(writeDir: String, schema: SchemaV2,
      sparkSchema: StructType, spec: PartitionSpec,
      writeId: String, props: Map[String, String],
      fmt: String = DataFileEntry.Parquet): Seq[ShardRef] = {
    val bloomCols = Blooms.bloomColumns(props, sparkSchema)
    if (bloomCols.isEmpty && spark.conf
        .getOption("spark.graft.footerStats").forall(_.toBoolean))
      footerStatsShards(writeDir, schema, sparkSchema, spec, writeId, props,
        fmt)
    else
      scanStatsShards(writeDir, schema, sparkSchema, spec, writeId, props,
        bloomCols, fmt)
  }

  /** FOOTER stats path: one tiny task per file slice reads footers only.
    * See [[GraftTable.footerEntry]] for the soundness contract (columns
    * with absent/unknown footer stats are omitted — never pruned, never
    * certified).
    */
  private def footerStatsShards(writeDir: String, schema: SchemaV2,
      sparkSchema: StructType, spec: PartitionSpec,
      writeId: String, props: Map[String, String],
      fmt: String = DataFileEntry.Parquet): Seq[ShardRef] = {
    val fieldSpecs: Seq[(String, DataType)] = statPaths(sparkSchema)
    val schemaId = schema.schemaId
    val specLocal = spec
    val fmtLocal = fmt
    val lineageOn = props.get(GraftTable.RowLineageProp).contains("true")
    val shardDir = metaDir.resolve(s"manifest-shards-$writeId")
    Files.createDirectories(shardDir)
    val shardDirStr = shardDir.toString
    val serConf = new SerConf(spark.sparkContext.hadoopConfiguration)
    // freshly written leaves — O(files) listing, the same order of work
    // as the write's own job commit
    val paths = listDataLeaves(writeDir, s".$fmt")
    if (paths.isEmpty) return Seq.empty
    def entryFor(pstr: String,
        conf: org.apache.hadoop.conf.Configuration): DataFileEntry =
      if (fmtLocal == DataFileEntry.Orc)
        OrcFooter.entry(pstr, conf, fieldSpecs, schemaId, specLocal)
      else GraftTable.footerEntry(pstr, conf, fieldSpecs,
        schemaId, specLocal)
    // a 0-row parquet part (Spark writes one for some empty plans)
    // is dead weight: no rows to plan, and the scan-based pass
    // never saw it either (no rows → no stats row) — an all-empty
    // write must yield NO entries, or empty stream batches would
    // commit phantom snapshots
    def withLineage(it: Iterator[DataFileEntry]): Iterator[DataFileEntry] =
      if (!lineageOn) it.filter(_.recordCount > 0L)
      else { var runningRows = 0L
        it.map { e0 => val o = runningRows
          runningRows += e0.recordCount
          e0.copy(rowIdOffset = Some(o))
        }.filter(_.recordCount > 0L) }
    // DRIVER fast path: a small write (sparse deltas, bounded fanouts —
    // anything whose footer pass is cheaper than one Spark job's fixed
    // latency) reads its footers right here on a bounded thread pool —
    // same entries, same single shard file, no Spark job. The
    // distributed path takes over above the threshold, where a footer
    // pass over thousands of files is genuinely cluster work.
    val driverMax = spark.conf
      .getOption("spark.graft.driverStatsThreshold").map(_.toInt)
      .getOrElse(256)
    val rollups =
      if (paths.size <= driverMax) {
        val conf = spark.sparkContext.hadoopConfiguration
        // footer reads are independent I/O: fan across threads, then
        // roll up in path order (lineage offsets are order-sensitive)
        val arr = new Array[DataFileEntry](paths.size)
        val err = new java.util.concurrent.atomic
          .AtomicReference[Throwable]()
        val idx = paths.indices
        idx.grouped(math.max(1, idx.size / 8 + 1)).toSeq.map { g =>
          val t = new Thread(() => g.foreach { i =>
            try arr(i) = entryFor(paths(i), conf)
            catch { case e: Throwable => err.compareAndSet(null, e) }
          })
          t.start(); t
        }.foreach(_.join())
        if (err.get() != null) throw err.get()
        GraftTable.shardRollup(
          withLineage(arr.iterator), shardDirStr, conf).toSeq
      } else {
        // shard sizing: ~64 footers per task, capped at the cluster's
        // parallelism — a million-file write fans wide; each task's
        // shard keeps manifest-list density near the scan path's
        // AQE-coalesced shape
        val parts = math.max(1, math.min(
          spark.sparkContext.defaultParallelism,
          math.ceil(paths.size / 64.0).toInt))
        spark.createDataset(paths)(
          org.apache.spark.sql.Encoders.STRING)
          .repartition(parts)
          .mapPartitions { it =>
            GraftTable.shardRollup(
              withLineage(it.map(entryFor(_, serConf.value))),
              shardDirStr, serConf.value)
          }(org.apache.spark.sql.Encoders.STRING).collect().toSeq
      }
    val refs = GraftTable.parseRollups(rollups)
    sweepOrphanShards(shardDir, refs)
    refs
  }

  private def sweepOrphanShards(shardDir: Path, refs: Seq[ShardRef]): Unit =
    GraftTable.sweepOrphanShards(shardDir, refs)

  /** Per-file (decoded path, row count) for the parquet files just
    * written under `dir`, straight from FOOTERS — replaces a Spark
    * read-back job whose only output was these counts. Every MoR /
    * equality / DV-rebuild delete commit runs this, so a job per commit
    * matters. Driver-side for the common few-hundred-file case,
    * distributed above that; 0-row parts are dropped (the read-back's
    * groupBy never produced a row for them either).
    */
  /** Recursive parquet leaves under `dir` (partitioned writes nest), in
    * DECODED on-disk form — the manifest path domain. The Path is built
    * through a proper URI so hive-escaped dir names (literal '%')
    * survive, and fileStatus.getPath.toUri.getPath decodes back to the
    * literal on-disk form exactly as _metadata.file_path+decodePath did.
    */
  private def listParquetLeaves(dir: String): Seq[String] =
    listDataLeaves(dir, ".parquet")

  private def listDataLeaves(dir: String, suffix: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(
      java.net.URI.create(GraftTable.encodePath(dir)))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(suffix))
        buf += f.getPath.toUri.getPath
    }
    buf.result().sorted
  }

  private def footerCounts(dir: String): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val paths = listParquetLeaves(dir)
    val counted =
      if (paths.size <= 512)
        paths.map(p => p -> GraftTable.footerRowCount(p, conf))
      else {
        val serConf = new SerConf(conf)
        spark.createDataset(paths)(org.apache.spark.sql.Encoders.STRING)
          .repartition(math.max(1, math.min(
            spark.sparkContext.defaultParallelism,
            math.ceil(paths.size / 64.0).toInt)))
          .map(p => (p, GraftTable.footerRowCount(p, serConf.value)))(
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.STRING,
              org.apache.spark.sql.Encoders.scalaLong))
          .collect().toSeq.sortBy(_._1)
      }
    counted.filter(_._2 > 0L)
  }

  /** SCAN stats path: one distributed aggregate over the written data —
    * per-file row count + min/max/null-count for every primitive column
    * (and bloom sidecars, which ride the same pass at zero extra scans).
    */
  private def scanStatsShards(writeDir: String, schema: SchemaV2,
      sparkSchema: StructType, spec: PartitionSpec,
      writeId: String, props: Map[String, String],
      bloomCols: Seq[(String, DataType)],
      fmt: String = DataFileEntry.Parquet): Seq[ShardRef] = {
    // leaf primitive paths, including DOTTED struct fields ("a.b.c") —
    // struct filters prune exactly like top-level ones
    val fieldSpecs: Seq[(String, DataType)] = statPaths(sparkSchema)
    val df = spark.read.format(fmt).load(writeDir)
    // opt-in per-file bloom filters ride the SAME aggregate pass (zero
    // extra scans) — Spark's codegen'd BloomFilterAggregate over the
    // canonical xxhash64 (see Blooms for the hash contract)
    val (bloomItems, bloomBits) = Blooms.sizing(props)
    val bloomAggs = bloomCols.map { case (name, dt) =>
      org.apache.spark.sql.graft.Bridge.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            org.apache.spark.sql.graft.Bridge.expression(
              Blooms.hashColumn(name, dt)),
            org.apache.spark.sql.catalyst.expressions.Literal(bloomItems),
            org.apache.spark.sql.catalyst.expressions.Literal(bloomBits))
          .toAggregateExpression()).as(s"bloom::$name")
    }
    val aggs = fieldSpecs.flatMap { case (p, _) =>
      Seq(min(col(p)).as(s"min::$p"),
        max(col(p)).as(s"max::$p"),
        sum(when(col(p).isNull, 1L).otherwise(0L)).as(s"nulls::$p"))
    } ++ Seq(count(lit(1)).as("cnt"),
      max(col("_metadata.file_size")).as("__size")) ++ bloomAggs
    val statsRows = df
      .groupBy(col("_metadata.file_path").as("__path"))
      .agg(aggs.head, aggs.tail: _*)
    // close over only serializable values (no `this` — it holds the session)
    val schemaId = schema.schemaId
    val specLocal = spec
    val bloomColNames = bloomCols.map(_._1)
    val bloomDir = metaDir.resolve(s"blooms-$writeId").toString
    // row lineage: each entry records its shard-local running record
    // offset; the commit assigns one base per shard and readers inherit
    // firstRowId = base + offset — O(shards) driver work, exact per-file
    // ids (mirrors Iceberg v3 first-row-id inheritance)
    val lineageOn = props.get(GraftTable.RowLineageProp).contains("true")
    val fmtLocal = fmt
    val shardDir = metaDir.resolve(s"manifest-shards-$writeId")
    Files.createDirectories(shardDir)
    val shardDirStr = shardDir.toString
    val serConf = new SerConf(spark.sparkContext.hadoopConfiguration)
    // each TASK writes its own shard file and returns ONE rollup line
    // (GraftTable.shardRollup). The previous shape wrote shards through
    // the DataFrame text writer and then launched a SECOND Spark job
    // that re-parsed every shard line just to compute these rollups;
    // that read-back job is gone, and the driver still sees only
    // O(shards) rows. Commits are the hot path of a streaming sink
    // (one per micro-batch), so a whole job per commit matters.
    val rollups = statsRows.mapPartitions { it =>
      var runningRows = 0L
      val entries = it.map { r =>
        val off =
          if (!lineageOn) None
          else { val o = runningRows
            runningRows += r.getAs[Long]("cnt"); Some(o) }
        GraftTable.statsRowToEntry(r, fieldSpecs, schemaId,
          specLocal, bloomColNames, bloomDir, rowIdOffset = off,
          format = fmtLocal)
      }
      GraftTable.shardRollup(entries, shardDirStr, serConf.value)
    }(org.apache.spark.sql.Encoders.STRING).collect()
    val refs = GraftTable.parseRollups(rollups.toSeq)
    sweepOrphanShards(shardDir, refs)
    refs
  }

  // -------------------------------------------------------------- read ----

  /** A snapshot's manifest refs (empty before the first snapshot). */
  def liveManifests(asOf: Option[Long] = None): Seq[ManifestRef] =
    manifestsFor(metadata, asOf)

  private def manifestsFor(meta: TableMetadataV2,
      asOf: Option[Long]): Seq[ManifestRef] = {
    val snap = asOf match {
      case Some(id) => meta.snapshotById(id)
        .getOrElse(throw new IllegalArgumentException(s"no snapshot $id"))
      case None => meta.currentSnapshot.getOrElse(return Seq.empty)
    }
    ManifestList.read(Paths.get(snap.manifestList))
  }

  /** Current live file list (empty before the first snapshot). */
  def liveEntries(asOf: Option[Long] = None): Seq[DataFileEntry] =
    liveManifests(asOf).flatMap(_.entries)

  /** Files surviving metadata pruning for a filter (the plan the scan will
    * read). Public so callers/tests can audit pruning.
    */
  def planFiles(filter: Option[Column] = None,
      asOf: Option[Long] = None): Seq[DataFileEntry] =
    planFilesFor(metadata, filter, asOf)

  /** The spec an entry's partition values were derived under: its
    * recorded spec-id when present; the table's single spec otherwise.
    * Legacy entries (no spec-id) in an EVOLVED table resolve by exact
    * partition-key-name match, else fall back to stats-only pruning —
    * interpreting values under the wrong spec could prune a matching
    * file, which is the one unforgivable pruning bug.
    */
  private def specForEntry(meta: TableMetadataV2,
      e: DataFileEntry): PartitionSpec =
    GraftTable.specForEntryOf(meta.partitionSpecs, meta.defaultSpec, e)

  private def entryMayMatch(meta: TableMetadataV2, e: DataFileEntry,
      preds: Seq[Any], sparkSchema: StructType, schema: SchemaV2): Boolean =
    Pruning.mayMatch(e, preds, sparkSchema, specForEntry(meta, e), schema) &&
      Blooms.entryMayMatch(e, Blooms.bloomPreds(preds, sparkSchema))

  /** Spec-aware distributed may-match: single-spec tables keep the plain
    * predicate; evolved tables dispatch per manifest row on `spec-id`,
    * with stats-only pruning for rows carrying no/unknown spec.
    */
  private def mayMatchColumnFor(meta: TableMetadataV2, preds: Seq[Any],
      sparkSchema: StructType, schema: SchemaV2): Column = {
    val statsPart =
      if (meta.partitionSpecs.size <= 1)
        Pruning.mayMatchColumn(preds, sparkSchema, meta.defaultSpec, schema)
      else {
        val statsOnly = Pruning.mayMatchColumn(preds, sparkSchema,
          PartitionSpec.unpartitioned, schema)
        meta.partitionSpecs.foldRight(statsOnly) { (s, els) =>
          when(col("spec-id") === s.specId,
            Pruning.mayMatchColumn(preds, sparkSchema, s, schema))
            .otherwise(els)
        }
      }
    statsPart && Blooms.mayMatchColumn(Blooms.bloomPreds(preds, sparkSchema))
  }

  /** Manifest-LEVEL pruning: a data manifest whose partition summary
    * proves no entry can match the predicates is skipped WHOLE — its
    * entries are never read. Evaluation reuses the entry-level
    * `Pruning.mayMatch` on a synthetic stats-less entry per tuple, so
    * the summary check can never be less conservative than the
    * per-entry check that would follow. No summary (legacy list, over
    * cap, unpartitioned) always keeps the manifest.
    */
  private def refMayMatch(meta: TableMetadataV2, r: ManifestRef,
      preds: Seq[Any], sparkSchema: StructType,
      schema: SchemaV2): Boolean =
    r.content != 0 || (r.partitionSummary match {
      case None => true
      // an EMPTY tuple list carries no information (a correct writer
      // never emits one for a non-empty manifest) — keep, never skip
      case Some(tuples) if tuples.isEmpty => true
      case Some(tuples) => tuples.exists { t =>
        val synthetic = DataFileEntry("", 0L, 0L, 0L, schema.schemaId,
          t.partition, Map.empty, specId = t.specId)
        Pruning.mayMatch(synthetic, preds, sparkSchema,
          specForEntry(meta, synthetic), schema)
      }
    })

  private def planFilesFor(meta: TableMetadataV2, filter: Option[Column],
      asOf: Option[Long]): Seq[DataFileEntry] = {
    val refs = manifestsFor(meta, asOf)
    val schemaId = asOf.flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).getOrElse(meta.currentSchemaId)
    val schema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    val sparkSchema = toSparkSchema(schema)
    filter match {
      case None => refs.flatMap(_.entries).filter(_.isData)
      case Some(f) =>
        val preds = Pruning.extract(spark, f, sparkSchema)
        refs.filter(r => refMayMatch(meta, r, preds, sparkSchema, schema))
          .flatMap(_.entries).filter(_.isData)
          .filter(e => entryMayMatch(meta, e, preds, sparkSchema, schema))
    }
  }

  /** Live position-delete ENTRIES (parquet position files AND deletion
    * vectors) — O(refs) metadata: delete entries live in their own
    * manifests, so only those are read.
    */
  private def posDeleteEntriesFor(meta: TableMetadataV2,
      asOf: Option[Long]): Seq[DataFileEntry] =
    manifestsFor(meta, asOf).filter(_.content == 1)
      .flatMap(_.entries).filter(_.content == 1)

  /** Live equality-delete entries (path + sequence number + key cols). */
  private def eqDeletesFor(meta: TableMetadataV2,
      asOf: Option[Long]): Seq[DataFileEntry] =
    manifestsFor(meta, asOf).filter(_.content == 2)
      .flatMap(_.entries).filter(_.content == 2)

  /** Anti-join equality deletes against a read carrying `SeqCol` (the
    * per-row data sequence number). Each delete file is scanned ONCE per
    * query: delete files group by (key columns, sequence number), keys
    * aggregate to their MAX delete sequence, and a single null-safe
    * anti-join per column-set applies them all — a delete applies iff
    * its sequence is STRICTLY larger than the row's (a re-inserted key
    * survives its own past deletion).
    *
    * NULL-SAFE equality (null key matches null column, per Iceberg
    * equality-delete semantics); an expression join also leaves the left
    * side's column order untouched, unlike a using-columns join which
    * moves keys to the front and would scramble downstream positional
    * unions.
    */
  private def applyEqDeletesSeq(df: DataFrame,
      eqDels: Seq[DataFileEntry]): DataFrame =
    GraftTable.applyEqDeletesSeqCore(spark, df, eqDels)

  /** A snapshot's manifest as a DataFrame — the distributed planning
    * path. At 100 TB the manifest is a dataset, not a driver loop: this
    * reader plus `planFilesDistributed` run the same pruning as
    * `planFiles` as a Spark filter over it.
    */
  def manifestDf(asOf: Option[Long] = None): DataFrame =
    manifestDfFor(metadata, asOf)

  private def manifestDfFor(meta: TableMetadataV2,
      asOf: Option[Long]): DataFrame =
    manifestDfForRefs(manifestsFor(meta, asOf)).drop(SrcManifestCol)

  /** Manifest rows of `refs` with a `SrcManifestCol` column holding the
    * (raw-URI) source manifest path — mutation planning groups by it to
    * decide which manifests survive verbatim.
    */
  private def manifestDfForRefs(refs: Seq[ManifestRef]): DataFrame = {
    if (refs.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(manifestSchema.fields :+
          SparkField(SrcManifestCol, StringType)))
    // sequence-number inheritance, distributed: shards of one commit
    // share (snapshot, sequence), so group refs by the inherited pair
    // and substitute pending ids as column expressions — one unioned
    // scan, no per-entry driver work
    val unioned = refs
      .groupBy(r => (r.addedSnapshotId, r.addedSequenceNumber)).map {
      case ((Some(sid), Some(seq)), rs) =>
        val pending = col("snapshot-id") === DataFileEntry.PendingSnapshot
        spark.read.schema(manifestSchema).json(rs.map(_.path): _*)
          .withColumn("sequence-number",
            when(pending, lit(seq)).otherwise(col("sequence-number")))
          .withColumn("snapshot-id",
            when(pending, lit(sid)).otherwise(col("snapshot-id")))
          .withColumn(SrcManifestCol, col("_metadata.file_path"))
      case (_, rs) =>
        spark.read.schema(manifestSchema).json(rs.map(_.path): _*)
          .withColumn(SrcManifestCol, col("_metadata.file_path"))
    }.reduce(_.unionByName(_))
    // row-lineage first-row-id inheritance, distributed: a tiny
    // (manifest → base id) map resolves per entry as base + row-id-offset
    // — the same O(shards)-not-O(files) trick as snapshot inheritance
    val bases = refs.flatMap(r =>
      r.firstRowId.map(GraftTable.canonPath(r.path) -> _)).toMap
    if (bases.isEmpty) unioned
    else {
      // broadcast join against the tiny (manifest → base) table instead
      // of a closure-captured-Map UDF: nothing serializes per task and
      // the stage stays inside WholeStageCodegen (the join key is a
      // StaticInvoke decode+canon, not a ScalaUDF)
      val basesDf = spark.createDataFrame(bases.toSeq)
        .toDF("__src_canon", "__lineage_base")
      unioned
        .join(broadcast(basesDf),
          GraftTable.decodeCanonCol(col(SrcManifestCol)) ===
            col("__src_canon"), "left")
        .withColumn("first-row-id",
          coalesce(col("first-row-id"),
            col("__lineage_base") + coalesce(col("row-id-offset"),
              lit(0L))))
        .drop("__src_canon", "__lineage_base")
    }
  }

  private val manifestSchema: StructType = StructType(Seq(
    SparkField("path", StringType),
    SparkField("record-count", LongType),
    SparkField("snapshot-id", LongType),
    SparkField("sequence-number", LongType),
    SparkField("schema-id", IntegerType),
    SparkField("partition", MapType(StringType, StringType)),
    SparkField("stats", MapType(StringType, StructType(Seq(
      SparkField("min", StringType),
      SparkField("max", StringType),
      SparkField("nulls", LongType))))),
    SparkField("content", IntegerType),
    SparkField("file-size", LongType),
    SparkField("equality-columns", ArrayType(StringType)),
    SparkField("spec-id", IntegerType),
    SparkField(Blooms.sparkField.name, Blooms.sparkField.dataType),
    SparkField(Dv.sparkField.name, Dv.sparkField.dataType),
    SparkField("first-row-id", LongType),
    SparkField("row-id-offset", LongType),
    SparkField("format", StringType)))

  /** Distributed equivalent of `planFiles`: prune as a Spark filter over
    * the manifest DataFrame. Returns surviving file paths.
    */
  def planFilesDistributed(filter: Option[Column] = None,
      asOf: Option[Long] = None): DataFrame =
    planFilesDistributedFor(metadata, filter, asOf).select("path")

  /** Full-column distributed plan (metadata pinned by the caller). */
  private def planFilesDistributedFor(meta: TableMetadataV2,
      filter: Option[Column], asOf: Option[Long]): DataFrame = {
    val schemaId = asOf.flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).getOrElse(meta.currentSchemaId)
    val schema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    val sparkSchema = toSparkSchema(schema)
    filter match {
      case None =>
        manifestDfFor(meta, asOf)
          .filter(coalesce(col("content"), lit(0)) === 0)
      case Some(f) =>
        val preds = Pruning.extract(spark, f, sparkSchema)
        // manifest-level pruning FIRST — O(manifests) driver-side over
        // list rollups, so the distributed entry scan unions only the
        // may-matching manifests instead of every one
        val refs = manifestsFor(meta, asOf)
          .filter(r => refMayMatch(meta, r, preds, sparkSchema, schema))
        manifestDfForRefs(refs)
          .drop(SrcManifestCol) // schema parity with the unfiltered branch
          .filter(coalesce(col("content"), lit(0)) === 0)
          .filter(mayMatchColumnFor(meta, preds, sparkSchema, schema))
    }
  }

  /** Metadata-only count: files whose stats prove EVERY row matches
    * contribute their manifest record count; files that cannot match are
    * skipped; only boundary files are actually scanned. A full-table
    * count touches no data at all.
    */
  def countRows(filter: Option[Column] = None,
      asOf: Option[Long] = None): Long = {
    val meta = metadata
    val refs = manifestsFor(meta, asOf)
    // delete positions are unique and live at write time (deleteWhereMoR
    // derives them from the deletes-applied read), so their record counts
    // subtract exactly; both totals come from the manifest-list ROLLUPS —
    // an unfiltered count touches neither data nor manifest entries
    val delCount = refs.filter(_.content == 1).map(_.recordCount).sum
    // equality deletes remove an unknown number of rows per key — no
    // metadata-only count is possible while any are live
    val hasEq = refs.exists(_.content == 2)
    filter match {
      case None if hasEq => scan(None, asOf).count()
      case None =>
        refs.filter(_.content == 0).map(_.recordCount).sum - delCount
      case Some(f) if delCount > 0 || hasEq =>
        // per-file stats cannot certify counts once MoR deletes exist —
        // answer from the deletes-applied scan
        scan(Some(f), asOf).count()
      case Some(f) =>
        val schemaId = asOf.flatMap(id =>
          meta.snapshotById(id).flatMap(_.schemaId)).map(_.toInt)
          .getOrElse(meta.currentSchemaId)
        val schema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
        val sparkSchema = toSparkSchema(schema)
        val (preds, complete) =
          Pruning.extractWithCompleteness(spark, f, sparkSchema)
        // the metadata shortcut is only sound if EVERY conjunct of the
        // filter translated — otherwise mustMatch would certify files
        // against a weaker predicate and silently overcount
        // manifest-level prune first — same summary skip as planning
        // (sound for counting: a skipped manifest provably holds no
        // matching rows, contributing neither certain nor boundary files)
        val countRefs = refs.filter(r =>
          refMayMatch(meta, r, preds, sparkSchema, schema))
        val (fullCount, partial): (Long, Seq[(String, Int)]) =
          if (countRefs.map(_.entryCount).sum >=
              distributedPlanningThreshold) {
            // manifest dataset path: may/must evaluate on executors; the
            // driver sees one aggregate row plus the boundary file list.
            // Cached so the JSON parse + predicate evaluation run ONCE
            // for the two consuming jobs.
            val mdf = manifestDfForRefs(countRefs).drop(SrcManifestCol)
              .filter(coalesce(col("content"), lit(0)) === 0)
              .filter(mayMatchColumnFor(meta, preds, sparkSchema, schema))
              .withColumn("__must",
                if (complete) Pruning.mustMatchColumn(preds, sparkSchema)
                else lit(false))
              .select(col("path"), col("schema-id"), col("record-count"),
                col("__must"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val certain = mdf.filter(col("__must"))
                .agg(coalesce(sum(col("record-count")), lit(0L)))
                .head().getLong(0)
              val boundary = mdf.filter(!col("__must"))
                .select(col("path"), col("schema-id")).collect().toSeq
                .map(r => (r.getString(0), r.getInt(1)))
              (certain, boundary)
            } finally mdf.unpersist()
          } else {
            val entries = countRefs.flatMap(_.entries).filter(_.isData)
            val may = entries.filter(e =>
              entryMayMatch(meta, e, preds, sparkSchema, schema))
            val (full, part) =
              if (complete) may.partition(e =>
                Pruning.mustMatch(e, preds, sparkSchema))
              else (Seq.empty[DataFileEntry], may)
            (full.map(_.recordCount).sum, part.map(e => (e.path, e.schemaId)))
          }
        val scanned =
          if (partial.isEmpty) 0L
          else readAlignedFilesFor(meta, partial, schema).filter(f).count()
        fullCount + scanned
    }
  }

  /** Metadata-derived MIN or MAX of a top-level column over a
    * DELETE-FREE snapshot: per-file stat bounds aggregate to the global
    * extreme without touching data (above the planning threshold the
    * aggregation runs distributed over the manifest dataset). Files
    * written without stats for the column are the boundary set — only
    * those are scanned. Returns None when the column is null in every
    * row. The caller guarantees type eligibility
    * (Pruning.statAggregable) and the delete-free precondition.
    */
  private[graft] def columnExtreme(colName: String, isMin: Boolean,
      asOf: Option[Long] = None): Option[Any] = {
    val meta = metadata
    val schemaId = asOf.flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).getOrElse(meta.currentSchemaId)
    val schema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    val sparkSchema = toSparkSchema(schema)
    val dt = sparkSchema(colName).dataType
    require(Pruning.statAggregable(dt), s"not stat-aggregable: $dt")
    val refs = manifestsFor(meta, asOf)
    require(refs.forall(_.content == 0),
      "metadata MIN/MAX needs a delete-free snapshot")
    val key = if (isMin) "min" else "max"
    def pick(c: Column) = if (isMin) min(c) else max(c)
    // (stat-certified extreme, files lacking usable stats → scan them).
    // A file is SKIPPED only when its stats prove the column all-null;
    // a missing or inconsistent stats entry sends it to the scan set.
    val (certified: Option[Any], missing: Seq[(String, Int)]) =
      if (refs.map(_.entryCount).sum >= distributedPlanningThreshold) {
        val mdf = manifestDfFor(meta, asOf)
          .filter(coalesce(col("content"), lit(0)) === 0)
          .select(col("path"), col("schema-id"),
            col("stats")(colName)(key).as("v"),
            col("stats")(colName)("nulls").as("nulls"),
            col("record-count").as("rc"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val r = mdf.filter(col("v").isNotNull)
            .agg(pick(Pruning.decodeStatColumn(col("v"), dt))).head()
          val best = if (r.isNullAt(0)) None else Some(r.get(0))
          val miss = mdf.filter(col("v").isNull &&
              !(col("nulls").isNotNull && col("nulls") === col("rc")))
            .select("path", "schema-id").collect().toSeq
            .map(x => (x.getString(0), x.getInt(1)))
          (best, miss)
        } finally { mdf.unpersist(); () }
      } else {
        val entries = refs.flatMap(_.entries).filter(_.isData)
        val sides = entries.map { e =>
          e.stats.get(colName) match {
            case Some(cs) =>
              (if (isMin) cs.min else cs.max) match {
                case Some(v) => Left(Some(v))
                case None if cs.nulls == e.recordCount => Left(None)
                case None => Right((e.path, e.schemaId))
              }
            case None => Right((e.path, e.schemaId))
          }
        }
        val vals = sides.collect { case Left(Some(v)) => v }
        val best = vals.reduceOption { (a, b) =>
          if ((Pruning.compare(a, b, dt) <= 0) == isMin) a else b
        }.map(Pruning.decodeStat(_, dt))
        (best, sides.collect { case Right(pe) => pe })
      }
    val scanned: Option[Any] =
      if (missing.isEmpty) None
      else {
        val r = readAlignedFilesFor(meta, missing, schema)
          .agg(pick(col(colName))).head()
        if (r.isNullAt(0)) None else Some(r.get(0))
      }
    (certified.toSeq ++ scanned.toSeq) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case cands =>
        // combine in Spark so type ordering matches the engine exactly
        val rows = cands.map(v => Row(v)).asJava
        val df = spark.createDataFrame(rows,
          StructType(Seq(SparkField("v", dt))))
        Some(df.agg(pick(col("v"))).head().get(0))
    }
  }

  /** Roll the table back to an earlier snapshot (metadata-only: the
    * snapshot becomes current again; later snapshots stay until expiry).
    */
  def rollbackTo(snapshotId: Long): Unit = retryingMetadata { meta =>
    require(meta.snapshotById(snapshotId).isDefined, s"no snapshot $snapshotId")
    val now = System.currentTimeMillis
    meta.copy(
      currentSnapshotId = Some(snapshotId),
      snapshotLog = Some(meta.snapshotLog.getOrElse(Seq.empty) :+
        SnapshotLog(snapshotId, now)),
      refs = Some(meta.refs.getOrElse(Map.empty) + ("main" ->
        SnapshotRef(snapshotId,
          BranchRetention(1, Long.MaxValue, Long.MaxValue)))),
      lastUpdatedMs = now)
  }

  /** Delete data files under the table location that no snapshot
    * references (failed writes, aborted commits). Returns removed paths.
    *
    * Above the planning threshold the reachability diff is DISTRIBUTED:
    * the referenced set (data, delete, bloom paths of every retained
    * snapshot) is the manifest dataset, candidates come from a
    * per-directory walk fanned out over executors, and the diff is one
    * anti-join — the driver sees O(immediate children) walk units and
    * the final deletion set, never the full file inventory.
    */
  def removeOrphanFiles(olderThanMillis: Long = 3600000L): Seq[String] = {
    val meta = metadata
    val snapRefs = meta.snapshots.getOrElse(Seq.empty)
      .flatMap(s => ManifestList.read(Paths.get(s.manifestList)))
      .groupBy(_.path).map(_._2.head).toSeq
    val cutoff = System.currentTimeMillis - olderThanMillis
    // manifests/manifest-lists leaked by lost commit races or crashes —
    // including executor-written shard files under manifest-shards-*/ —
    // are identified against the (metadata-plane, O(manifests)) live set
    val liveManifestPaths = snapRefs.map(r => canonPath(r.path)).toSet ++
      meta.snapshots.getOrElse(Seq.empty).map(s => canonPath(s.manifestList))
    val (orphanData, orphanMeta) =
      if (snapRefs.map(_.entryCount).sum >= distributedPlanningThreshold)
        orphanScanDistributed(snapRefs, liveManifestPaths, cutoff)
      else orphanScanLocal(snapRefs, liveManifestPaths, cutoff)
    // changelog staging ranges (location/_changelog/<stream>/<from>-<to>)
    // are normally cleaned on checkpoint commit; a crashed or abandoned
    // stream leaves its last ranges behind forever. Ranges whose newest
    // file predates the cutoff are swept WHOLE — a restarted stream
    // re-stages deterministically from metadata, so (like all orphan
    // cleanup) run with a cutoff comfortably above any stream's downtime.
    // A RUNNING stream refreshes its `_heartbeat` marker at every offset
    // poll, so a live-but-idle stream (paused longer than the cutoff)
    // keeps its staged, not-yet-committed ranges — only streams with a
    // stale (or absent, pre-heartbeat) marker are candidates
    val changelogRoot = Paths.get(location, "_changelog")
    val orphanStaged: Seq[Path] =
      if (!Files.isDirectory(changelogRoot)) Seq.empty
      else {
        val ls = Files.walk(changelogRoot, 2)
        val rangeDirs =
          try ls.iterator.asScala.filter(d =>
            Files.isDirectory(d) &&
              d.getFileName.toString.matches("""\d+-\d+""")).toSeq
          finally ls.close()
        def streamAlive(rangeDir: Path): Boolean =
          Option(rangeDir.getParent).exists { streamDir =>
            val hb = streamDir.resolve("_heartbeat")
            Files.isRegularFile(hb) &&
              Files.getLastModifiedTime(hb).toMillis >= cutoff
          }
        rangeDirs.filterNot(streamAlive).filter { d =>
          val w = Files.walk(d)
          val newest =
            try w.iterator.asScala.filter(Files.isRegularFile(_))
              .map(Files.getLastModifiedTime(_).toMillis)
              .maxOption.getOrElse(Files.getLastModifiedTime(d).toMillis)
            finally w.close()
          newest < cutoff
        }
      }
    orphanStaged.foreach(deleteRecursively)
    // DSv2 streaming-sink staging (location/stream-staging/<query>/<epoch>):
    // a committed or aborted epoch sweeps itself, but a crashed query's
    // last staged epoch — and the empty per-query parent dirs — linger.
    // Same policy as the changelog ranges: LIVE queries are protected by
    // their per-query _heartbeat (refreshed every epoch by the sink —
    // an epoch may legitimately stage longer than the cutoff during a
    // backfill), then an epoch dir whose newest file predates the
    // cutoff is swept whole (a restarted query re-stages its replayed
    // epoch from the source).
    val sinkRoot = Paths.get(location, "stream-staging")
    def queryAlive(queryDir: Path): Boolean = {
      val hb = queryDir.resolve("_heartbeat")
      Files.isRegularFile(hb) &&
        Files.getLastModifiedTime(hb).toMillis >= cutoff
    }
    val orphanEpochs: Seq[Path] =
      if (!Files.isDirectory(sinkRoot)) Seq.empty
      else {
        val ls = Files.walk(sinkRoot, 2)
        val epochDirs =
          try ls.iterator.asScala.filter(d => Files.isDirectory(d) &&
            d.getFileName.toString.matches("""\d+""") &&
            Option(d.getParent).flatMap(p => Option(p.getParent))
              .contains(sinkRoot)).toSeq
          finally ls.close()
        epochDirs
          .filterNot(d => Option(d.getParent).exists(queryAlive))
          .filter { d =>
            val w = Files.walk(d)
            val newest =
              try w.iterator.asScala.filter(Files.isRegularFile(_))
                .map(Files.getLastModifiedTime(_).toMillis)
                .maxOption.getOrElse(Files.getLastModifiedTime(d).toMillis)
              finally w.close()
            newest < cutoff
          }
      }
    orphanEpochs.foreach(deleteRecursively)
    // reclaim dead per-query dirs: no epochs left (a lone STALE
    // heartbeat does not count as content) and nothing fresh
    if (Files.isDirectory(sinkRoot)) {
      val ls = Files.list(sinkRoot)
      try ls.iterator.asScala.filter(Files.isDirectory(_)).foreach { q =>
        val c = Files.list(q)
        val entries = try c.iterator.asScala.toList finally c.close()
        val onlyStaleHeartbeat = entries.forall(p =>
          p.getFileName.toString == "_heartbeat" &&
            Files.getLastModifiedTime(p).toMillis < cutoff)
        // the q-mtime guard protects only the just-created-EMPTY query
        // dir (its first epoch not staged yet); once a stale heartbeat
        // proves the query dead, reclaim NOW — the epoch sweep above
        // just bumped q's mtime by unlinking, and waiting another full
        // cutoff period would leave dead dirs accumulating
        if (onlyStaleHeartbeat && (entries.nonEmpty ||
            Files.getLastModifiedTime(q).toMillis < cutoff)) {
          // check-then-delete races a live-but-idle query whose
          // heartbeat aged past the cutoff: it may stage a new epoch
          // between the listing above and this delete. That query is
          // NOT dead — degrade to "skip this dir" instead of failing
          // the whole maintenance call
          try {
            entries.foreach(Files.deleteIfExists(_))
            Files.deleteIfExists(q)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      } finally ls.close()
    }
    val orphans = orphanData ++ orphanMeta
    deleteDistributed(orphans)
    (orphans ++ (orphanStaged ++ orphanEpochs)
      .map(d => canonPath(d.toString))).sorted
  }

  /** Driver-side orphan scan (below the planning threshold): walk the
    * data/deletes dirs and the metadata dir, diff against the referenced
    * sets in memory. Paths canonicalized on BOTH sides: a relative table
    * location must not make every live file look unreferenced.
    */
  private def orphanScanLocal(snapRefs: Seq[ManifestRef],
      liveManifestPaths: Set[String],
      cutoff: Long): (Seq[String], Seq[String]) = {
    val referenced =
      snapRefs.flatMap(_.entries).map(e => canonPath(e.path)).toSet
    val orphanData = Seq("data", "deletes").flatMap { sub =>
      GraftTable.walkFilesOlder(
        Paths.get(location, sub).toString, cutoff, GraftTable.isDataCandidate)
        .filterNot(referenced.contains)
    }
    // bloom sidecars referenced by ANY snapshot's entries stay; the rest
    // (orphaned by aborted writes or expired rewrites) go with the data
    val liveBloomPaths = snapRefs.flatMap(_.entries)
      .flatMap(_.bloom.map(b => canonPath(b.path))).toSet
    val orphanMeta = GraftTable.walkFilesOlder(
      metaDir.toString, cutoff, GraftTable.isMetaCandidate)
      .filterNot(liveManifestPaths.contains)
      .filterNot(liveBloomPaths.contains)
    (orphanData, orphanMeta)
  }

  /** Distributed orphan scan: referenced paths from the manifest
    * dataset, candidate files from a per-child-directory walk on
    * executors, one anti-join. Returns (data orphans, metadata orphans).
    */
  private def orphanScanDistributed(snapRefs: Seq[ManifestRef],
      liveManifestPaths: Set[String],
      cutoff: Long): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val refDf = manifestDfForRefs(snapRefs)
    val referenced = refDf.select(col("path").as("p"))
      .unionAll(refDf.select(col("bloom")("path").as("p"))
        .where(col("p").isNotNull))
      .as[String].map(GraftTable.canonPath).toDF("p")
      .unionAll(liveManifestPaths.toSeq.toDF("p"))
      .distinct()
    def walk(units: Seq[String],
        pred: java.nio.file.Path => Boolean): DataFrame =
      if (units.isEmpty) spark.emptyDataset[String].toDF("p")
      else spark.sparkContext
        .parallelize(units, math.max(1, math.min(units.size, 256)))
        .flatMap(u => GraftTable.walkFilesOlder(u, cutoff, pred))
        .toDF("p")
    val dataUnits = Seq("data", "deletes")
      .flatMap(sub => GraftTable.listChildren(Paths.get(location, sub)))
    val cands = walk(dataUnits, GraftTable.isDataCandidate)
      .withColumn("is_meta", lit(false))
      .unionAll(walk(GraftTable.listChildren(metaDir),
        GraftTable.isMetaCandidate).withColumn("is_meta", lit(true)))
    val rows = cands.distinct()
      .join(referenced, Seq("p"), "left_anti").collect()
    (rows.filter(!_.getBoolean(1)).map(_.getString(0)).toSeq,
      rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq)
  }

  /** Continuous ingestion: append each micro-batch of `stream` as a
    * snapshot. foreachBatch delivery is AT-LEAST-once (a crash between
    * the table commit and the checkpoint write replays the batch), so
    * each snapshot records its (stream, batch) id and a replayed batch
    * is skipped — making the sink exactly-once. The caller owns the
    * returned query's lifecycle.
    */
  def appendStream(stream: DataFrame, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val streamId = streamIdFor(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitStreamBatch(batch, id, streamId)
      }
      .start()
  }

  /** Stable unique id for a stream writing to this table: a UUID
    * persisted INSIDE the checkpoint directory on first use, so the id
    * survives restarts exactly as long as the checkpoint does, and two
    * different checkpoints can never collide (the previous 32-bit
    * path-hash id could — e.g. ".../Aa" and ".../BB" hash equal — and a
    * collision silently skips the other stream's batches).
    */
  private[graft] def streamIdFor(checkpoint: String): String = {
    val dir = Paths.get(checkpoint)
    Files.createDirectories(dir)
    val f = dir.resolve("graft-stream-id")
    if (!Files.exists(f))
      try Files.write(f,
        java.util.UUID.randomUUID.toString.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    new String(Files.readAllBytes(f), "UTF-8").trim
  }

  /** Idempotent per-batch commit (package-visible for tests): a batch id
    * at or below the stream's high-water mark was already committed by a
    * previous delivery and is skipped. The mark is recorded in TABLE
    * PROPERTIES (snapshot summaries also carry it, but summaries expire
    * with their snapshots — expireSnapshots must not re-open the
    * replay/double-commit window).
    */
  private[graft] def commitStreamBatch(batch: DataFrame, batchId: Long,
      streamId: String): Unit = {
    val key = s"stream-batch-$streamId"
    val meta = metadata
    val highWater = (meta.properties.flatMap(_.get(key)).map(_.toLong).toSeq
      ++ meta.snapshots.getOrElse(Seq.empty)
        .flatMap(_.summary.other.get(key)).map(_.toLong)).maxOption
    if (!highWater.exists(_ >= batchId)) {
      // write FIRST, commit only if files materialized: a separate
      // batch.isEmpty probe would re-execute the batch plan as an extra
      // job per micro-batch. Skipping the commit for an empty batch is
      // safe — on restart the batch replays, writes nothing again, and
      // the high-water mark only ever records batches that added data.
      val adds = writeFiles(batch, lineageFresh = true)
      if (adds.shards.nonEmpty || adds.entries.nonEmpty) {
        val extra = Map(key -> batchId.toString)
        retryingCommit(() => commitSnapshot("append",
          meta2 => (manifestsFor(meta2, None), adds, extra), extra))
        ()
      }
    }
  }

  /** Snapshot-consistent scan with metadata pruning + residual filter.
    * Reads resolve columns by field id across schema versions (rename/add
    * survive; old files project nulls for later columns).
    */
  def scan(filter: Option[Column] = None, asOf: Option[Long] = None,
      withFileColumn: Boolean = false,
      withPosColumn: Boolean = false): DataFrame = {
    // pin ONE metadata version for the whole read: snapshot resolution,
    // pruning, and schema alignment must not mix concurrent commits
    val meta = metadata
    val schemaId = asOf.flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).getOrElse(meta.currentSchemaId)
    val readSchema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    val planned = plannedFilesFor(meta, filter, asOf)
    val df = readDeletesApplied(meta,
      planned.map(p => (p._1, p._2, p._3)), readSchema, asOf,
      withFile = withFileColumn, withRowPos = withPosColumn,
      formatOf = planned.collect {
        case (p, _, _, f) if f != DataFileEntry.Parquet => p -> f
      }.toMap)
    filter.map(df.filter).getOrElse(df)
  }

  /** Row-lineage scan: the table columns plus `_row_id` (stable per-row
    * identity assigned at append) and `_last_updated_sequence_number`.
    * Freshly appended files serve both VIRTUALLY — `first-row-id + _pos`
    * and the file's own data sequence, straight off the manifest (zero
    * storage per row); files a lineage-preserving rewrite produced carry
    * them as physical columns instead and are joined back by (file,
    * position). Merge-on-read deletes apply as in `scan` — a surviving
    * row keeps the id it was born with, which is what makes downstream
    * incremental consumers (CDC mirrors, feature stores) able to track a
    * row across arbitrarily many table rewrites. Planning is
    * threshold-dispatched like every other read.
    */
  def scanWithLineage(filter: Option[Column] = None): DataFrame = {
    val meta = metadata
    require(meta.properties
        .exists(_.get(GraftTable.RowLineageProp).contains("true")),
      s"row lineage is not enabled on $location (set " +
        s"${GraftTable.RowLineageProp}=true at create)")
    requireLineageReadable(meta)
    val schema = meta.currentSchema
    val refs = manifestsFor(meta, None)
    val planned: Seq[(String, Int, Long, Option[Long])] =
      if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
        planFilesDistributedFor(meta, filter, None)
          .select(col("path"), col("schema-id"), col("sequence-number"),
            col("first-row-id"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
      else planFilesFor(meta, filter, None)
        .map(e => (e.path, e.schemaId, e.sequenceNumber, e.firstRowId))
    val out = lineageReadFor(meta, planned, schema)
    filter.map(out.filter).getOrElse(out)
  }

  /** The lineage-annotated read over an explicit plan: table columns +
    * `_row_id` + `_last_updated_sequence_number`, deletes applied. Files
    * with a first-row-id serve lineage virtually (base + position off a
    * broadcast of the plan); files a lineage-preserving rewrite produced
    * carry BOTH columns physically and project them straight off the
    * parquet scan — no join-back, so a fully-compacted table's lineage
    * read is a single map-side scan.
    */
  private def lineageReadFor(meta: TableMetadataV2,
      planned: Seq[(String, Int, Long, Option[Long])],
      schema: SchemaV2): DataFrame =
    GraftTable.lineageReadCore(spark, meta, planned, schema,
      posDeleteEntriesFor(meta, None), eqDeletesFor(meta, None))

  /** Schema-aligned read of entries with `_row_id` attached: entries
    * with a first-row-id serve ids virtually (base + position via a
    * broadcast of the plan); materialized entries project their
    * physical `_row_id` column straight off the parquet scan.
    */
  private def alignedWithRowId(meta: TableMetadataV2,
      entries: Seq[DataFileEntry], schema: SchemaV2,
      withPos: Boolean): DataFrame = {
    import spark.implicits._
    val (virt, mat) = entries.partition(_.firstRowId.isDefined)
    val parts = Seq(
      if (virt.isEmpty) None
      else Some {
        val baseDf = broadcast(virt.map(e => (e.path, e.firstRowId.get))
          .toDF(GraftTable.FileCol, "__lin_base"))
        GraftTable.readAlignedFilesCore(spark, meta,
            virt.map(e => (e.path, e.schemaId)), schema,
            withPos = withPos, withFile = true, withRowPos = true)
          .join(baseDf, Seq(GraftTable.FileCol))
          .withColumn(GraftTable.RowIdCol,
            col("__lin_base") + col(GraftTable.RowPosCol))
          .drop("__lin_base", GraftTable.FileCol, GraftTable.RowPosCol)
      },
      if (mat.isEmpty) None
      else Some {
        GraftTable.readAlignedFilesCore(spark, meta,
            mat.map(e => (e.path, e.schemaId)), schema,
            withPos = withPos, withLineage = true)
          .drop(GraftTable.LastUpdCol)
      }).flatten
    parts.reduceOption(_ unionByName _).getOrElse(
      GraftTable.readAlignedFilesCore(spark, meta, Seq.empty, schema,
          withPos = withPos)
        .withColumn(GraftTable.RowIdCol, lit(null).cast(LongType)))
  }

  /** True when this metadata declares row lineage. */
  private def lineageEnabled(meta: TableMetadataV2): Boolean =
    meta.properties.exists(_.get(GraftTable.RowLineageProp)
      .contains("true"))

  /** Reject a lineage read over rows that never got ids: lineage enabled
    * on an already-populated table (no next-row-id yet data exists)
    * would silently serve NULL ids — and a compaction would then
    * MATERIALIZE those nulls. Fail loudly instead.
    */
  private def requireLineageReadable(meta: TableMetadataV2): Unit = {
    val hasRows = meta.currentSnapshot.exists(
      _.summary.other.get("total-records").exists(_.toLong > 0L))
    require(meta.nextRowId.isDefined || !hasRows,
      s"row lineage was enabled on $location AFTER rows were written — " +
        "pre-existing rows have no ids; recreate the table with " +
        s"${GraftTable.RowLineageProp}=true before the first append")
  }

  /** The deletes-applied read a REWRITE consumes: on lineage tables it
    * additionally carries the materialized lineage columns, which
    * writeFiles passes through into the rewritten files — rows keep
    * their ids across arbitrarily many rewrites.
    */
  private def readAppliedForRewrite(meta: TableMetadataV2,
      entries: Seq[DataFileEntry], schema: SchemaV2): DataFrame =
    if (!lineageEnabled(meta))
      readAppliedFor(meta, entries, schema)
    else {
      requireLineageReadable(meta)
      lineageReadFor(meta,
        entries.map(e =>
          (e.path, e.schemaId, e.sequenceNumber, e.firstRowId)),
        schema)
    }

  /** Pruned file plan as (path, schemaId, sequenceNumber) triples. Above
    * the threshold, pruning runs as a Spark filter over the manifest
    * dataset (executors parse + evaluate); only SURVIVING triples reach
    * the driver — at 100 TB the manifest itself is big data and a driver
    * loop over it is the bottleneck. Shared by scans AND mutations.
    */
  private def plannedFilesFor(meta: TableMetadataV2, filter: Option[Column],
      asOf: Option[Long]): Seq[(String, Int, Long, String)] = {
    val totalEntries = manifestsFor(meta, asOf).map(_.entryCount).sum
    if (totalEntries >= distributedPlanningThreshold)
      planFilesDistributedFor(meta, filter, asOf)
        .select(col("path"), col("schema-id"), col("sequence-number"),
          coalesce(col("format"), lit(DataFileEntry.Parquet)))
        .collect().toSeq
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getString(3)))
    else planFilesFor(meta, filter, asOf)
      .map(e => (e.path, e.schemaId, e.sequenceNumber, e.format))
  }

  /** Pruned file plan for the DSv2 connector: (path, schemaId,
    * sequenceNumber, fileSize) — the columns bin-packing needs. Same
    * threshold dispatch as `plannedFilesFor`: above it, pruning (and the
    * micro-batch sequence-range bound) runs as a Spark filter over the
    * manifest dataset and only SURVIVING rows reach the driver, so the
    * connector — the public read surface — never materializes the full
    * entry list driver-side.
    */
  private[graft] def plannedConnectorFiles(filter: Option[Column],
      asOf: Option[Long] = None,
      seqRange: Option[(Long, Long)] = None,
      allowAvro: Boolean = false): Seq[ConnectorFile] = {
    val meta = metadata
    val totalEntries = manifestsFor(meta, asOf).map(_.entryCount).sum
    if (totalEntries >= distributedPlanningThreshold) {
      val base = planFilesDistributedFor(meta, filter, asOf)
      val ranged = seqRange.fold(base) { case (from, to) =>
        base.filter(col("sequence-number") > from &&
          col("sequence-number") <= to)
      }
      ranged.select(col("path"), col("schema-id"), col("sequence-number"),
          coalesce(col("file-size"), lit(0L)), col("partition"),
          coalesce(col("format"), lit(DataFileEntry.Parquet)))
        .collect().toSeq
        .map { r =>
          requireConnectorFormat(r.getString(0), r.getString(5), allowAvro)
          val part =
            if (r.isNullAt(4)) Map.empty[String, Option[String]]
            else r.getMap[String, String](4).toMap
              .map { case (k, v) => k -> Option(v) }
          ConnectorFile(r.getString(0), r.getInt(1), r.getLong(2),
            r.getLong(3), part, r.getString(5))
        }
    } else {
      val es = planFilesFor(meta, filter, asOf)
      val ranged = seqRange.fold(es) { case (from, to) =>
        es.filter(e => e.sequenceNumber > from && e.sequenceNumber <= to)
      }
      ranged.map { e =>
        requireConnectorFormat(e.path, e.format, allowAvro)
        ConnectorFile(e.path, e.schemaId, e.sequenceNumber, e.fileSize,
          e.partition, e.format)
      }
    }
  }

  /** The DSv2 scan drives Spark's vectorized PARQUET reader directly;
    * a non-parquet file (adopted ORC) must refuse up front — feeding it
    * to the parquet reader would throw deep inside an executor task
    * (or worse). The native scan() handles mixed-format tables.
    */
  /** The DSv2/SQL read path delegates parquet AND orc to Spark's
    * vectorized file formats; avro has no FileFormat in this build, so
    * batch reads of avro-bearing tables bridge to the engine scan
    * (which decodes it) and micro-batch streams opt in via `allowAvro`
    * (they stage avro ranges as parquet).
    */
  private def requireConnectorFormat(path: String, fmt: String,
      allowAvro: Boolean = false): Unit =
    require(fmt == DataFileEntry.Parquet || fmt == DataFileEntry.Orc ||
      (allowAvro && fmt == DataFileEntry.Avro),
      s"the DSv2/SQL read path reads parquet and orc only; $path is " +
        s"$fmt — read avro-bearing adopted tables via GraftTable.scan() " +
        "or compact() them to parquet first")

  /** Aligned, deletes-free read of SPECIFIC data files into the current
    * schema — the micro-batch staging path for formats the streaming
    * reader factory cannot decode (avro). Streaming sources validate
    * append-only history before planning, so no delete application is
    * needed here.
    */
  private[graft] def readFilesAligned(files: Seq[(String, Int)],
      formatOf: Map[String, String]): (DataFrame, Int) = {
    val meta = metadata
    (readAlignedFilesCore(spark, meta, files, meta.currentSchema,
      formatOf = formatOf), meta.currentSchema.schemaId)
  }

  /** Conf-visible planning threshold (the connector's statistics path
    * must honor the same dispatch as planning).
    */
  private[graft] def planningThreshold: Long = distributedPlanningThreshold

  /** Manifest entry count at which planning moves off the driver. */
  private def distributedPlanningThreshold: Long =
    spark.conf.getOption("spark.graft.distributedPlanningThreshold")
      .map(_.toLong).getOrElse(100000L)

  /** Scan a reference (branch or tag) by name. */
  def scanRef(name: String, filter: Option[Column] = None): DataFrame = {
    val ref = metadata.refs.flatMap(_.get(name))
      .getOrElse(throw new IllegalArgumentException(s"no ref $name"))
    scan(filter, Some(ref.snapshotId))
  }

  /** Rows added strictly after `fromSnapshot`, up to and including
    * `toSnapshot` (append-flavored incremental consumption).
    */
  def incrementalRead(fromSnapshot: Long, toSnapshot: Long): DataFrame = {
    val meta = metadata
    val fromSeq = meta.snapshotById(fromSnapshot)
      .getOrElse(throw new IllegalArgumentException("bad from")).sequenceNumber
    // the added-since filter runs over the manifest dataset above the
    // planning threshold (sequence-number is a manifest column) — an
    // incremental consumer of a huge table plans O(added), not O(table)
    val refs = manifestsFor(meta, Some(toSnapshot))
    val planned: Seq[(String, Int, Long, String)] =
      if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
        manifestDfFor(meta, Some(toSnapshot))
          .filter(coalesce(col("content"), lit(0)) === 0 &&
            col("sequence-number") > fromSeq)
          .select(col("path"), col("schema-id"), col("sequence-number"),
            coalesce(col("format"), lit(DataFileEntry.Parquet)))
          .collect().toSeq
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getString(3)))
      else refs.flatMap(_.entries)
        .filter(e => e.isData && e.sequenceNumber > fromSeq)
        .map(e => (e.path, e.schemaId, e.sequenceNumber, e.format))
    // rows added in range but MoR-deleted by toSnapshot are not in the
    // current state of the range — apply its delete files
    readDeletesApplied(meta, planned.map(p => (p._1, p._2, p._3)),
      meta.currentSchema, Some(toSnapshot),
      formatOf = planned.collect {
        case (p, _, _, f) if f != DataFileEntry.Parquet => p -> f }.toMap)
  }

  /** Row-level changelog between two snapshots (CDC): for every commit
    * in `(fromSnapshot, toSnapshot]` emits that commit's logical row
    * changes — appends as `insert` rows, merge-on-read deletes
    * (position AND equality) as `delete` rows WITH the full deleted-row
    * content recovered from the referenced data files.
    *
    * NET-CHANGES across maintenance: `replace` commits (compaction,
    * z-order/sort re-cluster, manifest rewrite) move bytes, not rows —
    * they contribute NOTHING and are skipped, so a CDC consumer
    * survives routine maintenance (Iceberg's net_changes contract).
    * Each logical commit's changes are computed against ITS OWN
    * snapshot's manifest refs, never the range end's — a later rewrite
    * must not hide an earlier append's files. Copy-on-write deletes,
    * updates, and overwrites DERIVE their net changes (Iceberg's
    * changelog contract for overwrite snapshots): deletes are the rows
    * live in the commit's dropped files just before the commit minus
    * the added files' rows, inserts the reverse, so rewritten-but-
    * unchanged rows cancel; under row lineage the stable `_row_id`
    * rides along and a CoW UPDATE pairs exactly. Requires the commit's
    * parent snapshot retained (the dropped-file set lives in its
    * manifest list) — expired parents refuse loudly.
    *
    * Output = the table schema plus `_change_type` ('insert'|'delete'),
    * `_commit_snapshot_id`, `_commit_sequence`. Per-commit recovery
    * reads only the files the commit touched (positions are
    * point-addressed; equality deletes re-derive their live candidate
    * set exactly as the original commit scoped it).
    */
  def changes(fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    val meta = metadata
    val fromSeq = meta.snapshotById(fromSnapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $fromSnapshotId")).sequenceNumber
    changesBySeq(fromSeq, toSnapshotId)
  }

  /** [[changes]] addressed by starting SEQUENCE (exclusive): `fromSeq=0`
    * replays the table's entire history — the streaming changelog's
    * offset domain (sequence numbers survive snapshot expiry and need no
    * starting snapshot to still exist).
    */
  def changesBySeq(fromSeq: Long, toSnapshotId: Long): DataFrame = {
    val meta = metadata
    def snapOf(id: Long): SnapshotV2 = meta.snapshotById(id)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $id"))
    val toSeq = snapOf(toSnapshotId).sequenceNumber
    require(fromSeq <= toSeq, "fromSnapshot must precede toSnapshot")
    // The commit set is the ANCESTRY of toSnapshot down to fromSeq —
    // not every retained snapshot whose sequence lands in range. The
    // distinction matters twice: commits on other branches (or rolled-
    // back history) share the table-global sequence domain but are not
    // part of this lineage's changes; and EXPIRED ancestors are a hard
    // stop — their changes are unrecoverable, so a consumer must hear
    // that loudly (incremental MV refresh catches this and recomputes)
    // instead of receiving a silently incomplete delta.
    val inRange = {
      val chain = Seq.newBuilder[SnapshotV2]
      var cur: Option[SnapshotV2] = Some(snapOf(toSnapshotId))
      while (cur.exists(_.sequenceNumber > fromSeq)) {
        val s = cur.get
        chain += s
        cur = s.parentSnapshotId match {
          case None => None // table's first commit: nothing precedes it
          case Some(p) => meta.snapshotById(p) match {
            case some @ Some(_) => some
            case None =>
              // parent expired. Prefer the EXACT parent sequence the
              // commit recorded in its summary (sequences are
              // table-global, so lineage sequences need not be dense —
              // a branch commit may have consumed one in between);
              // snapshots from before the summary carried it fall back
              // to the conservative dense-adjacency rule.
              s.summary.other
                .get("parent-sequence-number").map(_.toLong) match {
                case Some(ps) if ps == fromSeq => // exact landing:
                  // the expired parent IS the anchor — range complete
                  // (fromSeq=0 full replay never lands here: ps >= 1,
                  // so a truncated history falls through to incomplete)
                case Some(ps) if ps < fromSeq && fromSeq > 0 =>
                  throw new IllegalStateException(
                    s"changelog start $fromSeq is not on snapshot " +
                      s"$toSnapshotId's ancestry (expired ancestor at " +
                      s"sequence $ps) — the range was rolled back")
                case Some(_) =>
                  throw new IllegalStateException(
                    s"changelog range ($fromSeq, $toSeq] is " +
                      s"incomplete: snapshot ${s.snapshotId}'s parent " +
                      s"$p was expired and its changes are " +
                      "unrecoverable")
                case None =>
                  // legacy snapshot without the recorded parent
                  // sequence: refuse. Dense adjacency (sequenceNumber
                  // == fromSeq + 1) is NOT proof of landing — sequences
                  // are table-global, so a branch commit may have
                  // consumed fromSeq+1 while this lineage's expired
                  // parent sat at a different sequence; trusting it
                  // yields a silently wrong delta. Consumers recompute
                  // in full instead (new snapshots always record the
                  // exact parent sequence).
                  throw new IllegalStateException(
                    s"changelog range ($fromSeq, $toSeq] is " +
                      s"incomplete: snapshot ${s.snapshotId}'s " +
                      s"parent $p was expired and (pre-upgrade " +
                      "snapshot) its exact parent sequence was not " +
                      "recorded — changes are unrecoverable")
              }
              None
          }
        }
      }
      // the walk must land EXACTLY on fromSeq (or the table's first
      // commit): bottoming out on a retained ancestor with a SMALLER
      // sequence means the fromSeq commit is not on toSnapshot's
      // lineage — it was rolled back — and a consumer anchored there
      // (an MV's state, a stream's offset) holds rows this lineage
      // never produced; a delta can't reconcile that.
      // (reaching the table's FIRST commit without crossing fromSeq is
      // fine: nothing existed at fromSeq, the chain is the whole history)
      cur.filter(s => s.sequenceNumber < fromSeq && fromSeq > 0)
        .foreach { s =>
          throw new IllegalStateException(
            s"changelog start $fromSeq is not on snapshot " +
              s"$toSnapshotId's ancestry (nearest ancestor: sequence " +
              s"${s.sequenceNumber}) — the range was rolled back")
        }
      chain.result().sortBy(_.sequenceNumber)
    }
    // net-changes: replace commits move bytes, not rows — skip them
    val logical = inRange.filterNot(_.summary.operation.contains("replace"))
    // a ROW-DELTA commit (MoR UPDATE/MERGE: delete files + appended new
    // versions, nothing rewritten) is fully expressible through the
    // per-sequence insert/delete recovery below; a COPY-ON-WRITE commit
    // (rewritten/dropped files, or a non-row-delta overwrite)
    // interleaves physical and logical changes in its added files, so
    // its net changes are DERIVED instead: diff the rows live in the
    // dropped files just before the commit against the added files'
    // rows (Iceberg's changelog contract for overwrite snapshots).
    def opRowDelta(s: SnapshotV2): (String, Boolean) = {
      val op = s.summary.operation.getOrElse("unknown")
      (op, op == "overwrite" &&
        s.summary.other.get("row-delta").contains("true"))
    }
    def isCow(s: SnapshotV2): Boolean = {
      val (op, rowDelta) = opRowDelta(s)
      !rowDelta &&
        (s.summary.other.get("rewritten-files").exists(_.toInt > 0) ||
          s.summary.other.get("dropped-files").exists(_.toInt > 0) ||
          op == "overwrite")
    }
    logical.foreach { s =>
      val (op, rowDelta) = opRowDelta(s)
      if (isCow(s)) {
        // the dropped-file set lives in the PARENT snapshot's manifest
        // list — net-change recovery needs the parent retained. A CoW
        // commit WITHOUT a parent (overwrite as the table's first
        // commit) dropped nothing: its adds are plain inserts.
        if (s.parentSnapshotId.exists(p => meta.snapshotById(p).isEmpty))
          throw new IllegalStateException(
            s"changelog cannot express snapshot ${s.snapshotId} ($op): " +
              "its copy-on-write delta needs the parent snapshot's " +
              "manifests and the parent was expired")
      } else require(op == "append" || op == "delete" || rowDelta,
        s"changelog cannot express snapshot ${s.snapshotId} ($op)")
    }
    val schema = meta.currentSchema
    val sparkSchema = toSparkSchema(schema)
    // lineage tables additionally emit each change row's stable _row_id
    // — CDC consumers track a row across its whole life, not just match
    // it by content
    val lineage = lineageEnabled(meta)
    val outFields = sparkSchema.fieldNames.toSeq ++
      (if (lineage) Seq(GraftTable.RowIdCol) else Seq.empty)
    val emptyOut = {
      val fields = sparkSchema.fields ++
        (if (lineage) Seq(SparkField(GraftTable.RowIdCol, LongType))
        else Seq.empty) ++ Seq(
        SparkField("_change_type", StringType),
        SparkField("_commit_snapshot_id", LongType),
        SparkField("_commit_sequence", LongType))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(fields))
    }
    def tag(df: DataFrame, tpe: String, s: SnapshotV2): DataFrame =
      df.select(outFields.map(col).toIndexedSeq: _*)
        .withColumn("_change_type", lit(tpe))
        .withColumn("_commit_snapshot_id", lit(s.snapshotId))
        .withColumn("_commit_sequence", lit(s.sequenceNumber))
    // lineage read of commit-scoped files: virtual ids from a broadcast
    // of the plan, materialized ids projected off the scan itself
    def alignedFor(es: Seq[DataFileEntry], withPos: Boolean): DataFrame =
      if (lineage) alignedWithRowId(meta, es, schema, withPos)
      else GraftTable.readAlignedFilesCore(spark, meta,
        es.map(e => (e.path, e.schemaId)), schema, withPos = withPos)

    // per-commit changes against the commit's OWN snapshot refs: a
    // replace later in the range rewrites these files away, but the
    // commit's own manifest list still names them
    val parts: Seq[DataFrame] = logical.flatMap { s =>
      val sq = s.sequenceNumber
      val refs = manifestsFor(meta, Some(s.snapshotId))
      val dataEntries = refs.filter(_.content == 0).flatMap(_.entries)
        .filter(_.isData)

      if (isCow(s)) {
        // ---- copy-on-write net changes: dropped-live minus added ----
        // parent retained when present (validated above); absent parent
        // (overwrite as first commit) means nothing was dropped
        val parentId = s.parentSnapshotId
        val parentData = parentId.toSeq
          .flatMap(p => manifestsFor(meta, Some(p)))
          .filter(_.content == 0).flatMap(_.entries).filter(_.isData)
        val curPaths = dataEntries.map(e => canonPath(e.path)).toSet
        val droppedFiles = parentData
          .filterNot(e => curPaths.contains(canonPath(e.path)))
        val addedFiles = dataEntries.filter(_.sequenceNumber == sq)
        val sel = outFields.map(col).toIndexedSeq
        // rows LIVE in the dropped files just before the commit: the
        // rewrite also physically drops rows MoR deletes had already
        // removed — those are not THIS commit's changes, so parent-scope
        // position and equality deletes apply first
        val droppedLive = droppedFiles.groupBy(_.sequenceNumber).toSeq
          .map { case (dsq, des) =>
            alignedFor(des, withPos = true).withColumn(SeqCol, lit(dsq))
          }.reduceOption(_ unionByName _) match {
          case None => emptyOut.select(sel: _*)
          case Some(cand0) => GraftTable.applyEqDeletesSeqCore(spark,
            applyDeletes(cand0, posDeleteEntriesFor(meta, parentId)),
            eqDeletesFor(meta, parentId)).select(sel: _*)
        }
        val addedRows = addedFiles match {
          case Seq() => emptyOut.select(sel: _*)
          case es => alignedFor(es, withPos = false).select(sel: _*)
        }
        // multiset diff: rewritten-but-unchanged row content cancels
        // (under lineage the stable _row_id rides along, so a CoW
        // UPDATE pairs exactly as one delete + one insert of the same
        // row id). Cost is O(this commit's rewritten bytes) — the
        // inherent price of a CoW delta, never O(table). ONE weighted
        // aggregate yields both directions in a single branch (net<0 →
        // that many deletes, net>0 → inserts, change type computed from
        // the sign) where a pair of exceptAll calls re-ran the identical
        // count-and-replicate plan once per direction.
        // replicate |net| copies per group WITHOUT materializing one
        // O(count) array (r20 ADVICE: a single sequence() both allocates
        // per-group memory linear in the count and hard-fails above
        // ~2.1B elements, reachable for a low-width 100 TB rewrite):
        // two-level explode bounds every array at ChangelogChunk
        // elements — outer picks the chunk, inner replicates within it.
        val chunk = GraftTable.ChangelogChunk
        val net = addedRows.withColumn("__w", lit(1L))
          .unionByName(droppedLive.withColumn("__w", lit(-1L)))
          .groupBy(sel: _*).agg(sum(col("__w")).as("__w"))
          .filter(col("__w") =!= 0L)
          .withColumn("__c",
            explode(expr(s"sequence(0L, (abs(__w) - 1L) div ${chunk}L)")))
          .withColumn("__i",
            explode(expr(
              s"sequence(1L, least(${chunk}L, abs(__w) - __c * ${chunk}L))")))
        Seq(net
          .withColumn("_change_type",
            when(col("__w") < 0L, "delete").otherwise("insert"))
          .withColumn("_commit_snapshot_id", lit(s.snapshotId))
          .withColumn("_commit_sequence", lit(s.sequenceNumber))
          .select(outFields.map(col) ++ Seq(col("_change_type"),
            col("_commit_snapshot_id"), col("_commit_sequence")): _*))
      } else {

      // inserts: the rows THIS append committed, as written
      val inserts = dataEntries.filter(_.sequenceNumber == sq) match {
        case Seq() => Seq.empty
        case es => Seq(tag(alignedFor(es, withPos = false), "insert", s))
      }

      // position deletes: point-addressed (file, pos) → recover the rows
      // by semi-joining the annotated read of ONLY the referenced files
      val posDels = refs.filter(_.content == 1).flatMap(_.entries)
        .filter(e => e.content == 1 && e.sequenceNumber == sq)
      val posDeleted =
        if (posDels.isEmpty) Seq.empty
        else {
          // a DELETION VECTOR committed here is the file's MERGED delete
          // set (it superseded the parent's DV) — this commit's own
          // delta is its positions minus the parent snapshot's. Only
          // parent DVs over THIS commit's referenced data files can
          // subtract (O(delta files), not O(table's deleted rows)), and
          // an expired parent degrades to the merged set rather than
          // failing the whole changelog read.
          val myDvFiles = posDels.flatMap(_.dv).map(_.dataFile).toSet
          val parentDvs =
            if (myDvFiles.isEmpty) Seq.empty
            else s.parentSnapshotId.toSeq.flatMap { p =>
              if (meta.snapshotById(p).isEmpty) Seq.empty // expired
              else posDeleteEntriesFor(meta, Some(p))
                .filter(_.dv.exists(d => myDvFiles.contains(d.dataFile)))
            }
          val raw = GraftTable.posDeletePositionsCore(spark, posDels)
            .select(col("file_path"), col("pos"))
          // no broadcast hint: a long-lived file's DV is unbounded, and
          // AQE broadcasts small position sets on its own
          val positions =
            if (parentDvs.isEmpty) raw
            else raw.join(
              GraftTable.posDeletePositionsCore(spark, parentDvs)
                .select(col("file_path"), col("pos")),
              Seq("file_path", "pos"), "left_anti")
          val touched = positions.select("file_path").distinct()
            .collect().map(r => canonPath(decodePath(r.getString(0)))).toSet
          val files = dataEntries
            .filter(e => touched.contains(canonPath(e.path)))
          val annotated = alignedFor(files, withPos = true)
          Seq(tag(annotated.join(
              broadcast(positions.withColumnRenamed("file_path", PosPathCol)
                .withColumnRenamed("pos", PosIdxCol)),
              Seq(PosPathCol, PosIdxCol), "left_semi"),
            "delete", s))
        }

      // equality deletes: candidates are the rows LIVE just before the
      // commit (earlier-sequence data, position deletes applied, earlier
      // equality deletes applied) that match the commit's key tuples
      val eqDels = refs.filter(_.content == 2).flatMap(_.entries)
        .filter(e => e.content == 2 && e.sequenceNumber == sq)
      val eqDeleted =
        if (eqDels.isEmpty) Seq.empty
        else {
          val priorData = dataEntries.filter(_.sequenceNumber < sq)
          val annotated = priorData.groupBy(_.sequenceNumber).toSeq.map {
            case (dsq, des) =>
              alignedFor(des, withPos = true).withColumn(SeqCol, lit(dsq))
          }.reduceOption(_ unionByName _)
          annotated match {
            case None => Seq(tag(emptyOut.drop(
              "_change_type", "_commit_snapshot_id", "_commit_sequence"),
              "delete", s))
            case Some(cand0) =>
              val live = GraftTable.applyEqDeletesSeqCore(spark,
                applyDeletes(cand0, posDeleteEntriesFor(meta, Some(s.snapshotId))),
                eqDeletesFor(meta, Some(s.snapshotId))
                  .filter(_.sequenceNumber < sq))
              val deleted = eqDels.groupBy(_.eqColumns).toSeq.map {
                case (cols, dels) =>
                  val keys = spark.read.parquet(dels.map(_.path): _*)
                    .select(cols.map(col).toIndexedSeq: _*).distinct()
                    .select(cols.map(c => col(c).as(s"__k_$c"))
                      .toIndexedSeq: _*)
                  live.join(broadcast(keys),
                    cols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _),
                    "left_semi")
              }.reduce(_ unionByName _)
              Seq(tag(deleted, "delete", s))
          }
        }

      inserts ++ posDeleted ++ eqDeleted
      }
    }
    parts.foldLeft(emptyOut)(_ unionByName _)
  }

  /** Commit one streaming EPOCH's executor-written files (the DSv2
    * STREAMING_WRITE path — GraftStreamingWrite): adopt the staged
    * files into a fresh `data/<writeId>/` dir preserving their
    * hive-style partition sub-dirs, derive manifest entries from their
    * footers (the same stats pass every append uses), and commit ONE
    * append snapshot carrying the stream high-water mark. Identical
    * exactly-once semantics to [[commitStreamBatch]]: a replayed epoch
    * at or below the mark deletes its staged files and commits nothing.
    */
  private[graft] def commitStreamedFiles(epochDir: String,
      relPaths: Seq[String], batchId: Long, streamId: String): Unit = {
    val key = s"stream-batch-$streamId"
    def sweepStaging(): Unit = deleteRecursively(Paths.get(epochDir))
    val meta = metadata
    def highWaterOf(m: TableMetadataV2): Option[Long] =
      (m.properties.flatMap(_.get(key)).map(_.toLong).toSeq
        ++ m.snapshots.getOrElse(Seq.empty)
          .flatMap(_.summary.other.get(key)).map(_.toLong)).maxOption
    if (highWaterOf(meta).exists(_ >= batchId) || relPaths.isEmpty) {
      sweepStaging()
      return
    }
    val writeId = java.util.UUID.randomUUID.toString.take(8)
    val writeDir = Paths.get(location, "data", writeId)
    relPaths.foreach { rel =>
      val dst = writeDir.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.move(Paths.get(epochDir).resolve(rel), dst)
    }
    sweepStaging()
    val schema = meta.currentSchema
    // the sink stages epochs in the table's declared format; derive the
    // stats pass from what was actually staged (extension), not from
    // the CURRENT default — a mid-stream property flip must not make
    // the footer pass skip every file of an already-staged epoch
    val fmt =
      if (relPaths.exists(_.endsWith(s".${DataFileEntry.Orc}")))
        DataFileEntry.Orc
      else DataFileEntry.Parquet
    val shards = writeStatsShards(writeDir.toString, schema,
      toSparkSchema(schema), meta.defaultSpec, writeId,
      meta.properties.getOrElse(Map.empty), fmt)
      .map(_.copy(lineageFresh = true))
    if (shards.isEmpty) {
      // all-empty epoch files: nothing to commit, reclaim the dirs
      deleteRecursively(writeDir)
      deleteRecursively(metaDir.resolve(s"manifest-shards-$writeId"))
      return
    }
    val adds = GraftTable.PendingAdds(Seq.empty, shards)
    val extra = Map(key -> batchId.toString)
    // the mark is RE-CHECKED against the fresh metadata inside the
    // retry closure: a conflict retry may be losing the race to a
    // restarted driver (same checkpoint) that already committed this
    // epoch — committing anyway would land the rows twice. The initial
    // pre-stage check alone cannot see that.
    try retryingCommit(() => commitSnapshot("append",
      meta2 => {
        if (highWaterOf(meta2).exists(_ >= batchId))
          throw new GraftTable.EpochAlreadyCommitted
        (manifestsFor(meta2, None), adds, extra)
      }, extra))
    catch {
      case _: GraftTable.EpochAlreadyCommitted =>
        // someone else owns this epoch — reclaim our unreferenced copy
        deleteRecursively(writeDir)
        deleteRecursively(metaDir.resolve(s"manifest-shards-$writeId"))
    }
    ()
  }

  /** Structured-streaming source over an APPEND-ONLY table: the stream
    * tails the table's data directory, so files committed by future
    * appends flow into later micro-batches, and a restarted query
    * resumes from its checkpoint without re-reading consumed files (the
    * file source's seen-files log provides exactly-once consumption).
    * Mirrors the Iceberg streaming-read contract: tables whose history
    * contains deletes/overwrites/compactions are rejected — their
    * rewritten files would double-count rows. Known gap vs
    * snapshot-offset streaming (documented, not hidden): data files of
    * an in-flight or failed write are visible to the directory listing
    * before/without their commit.
    */
  def readStream(maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val meta = metadata
    val nonAppend = meta.snapshots.getOrElse(Seq.empty)
      .flatMap(_.summary.operation).filterNot(_ == "append").distinct
    require(nonAppend.isEmpty,
      s"streaming read requires an append-only history; found $nonAppend")
    // the tail is a PARQUET file stream: an ORC/avro-writing table must
    // refuse here (a mid-stream format flip still fails loudly on the
    // parquet magic-bytes check, never silently misparses). Format
    // probe runs over the manifest DATASET — one-time setup must not
    // materialize a huge table's entry list on the driver
    require(meta.properties.getOrElse(Map.empty)
        .getOrElse(GraftTable.WriteFormatProp, DataFileEntry.Parquet) ==
        DataFileEntry.Parquet &&
        manifestDf(None)
          .filter(coalesce(col("content"), lit(0)) === 0 &&
            col("format").isNotNull &&
            col("format") =!= DataFileEntry.Parquet)
          .isEmpty,
      "the directory-tail streaming read requires an all-parquet " +
        "table; use the graft DSv2 source " +
        "(spark.readStream.format(\"graft\")) for format-aware streams")
    val sparkSchema = toSparkSchema(meta.currentSchema)
    Files.createDirectories(Paths.get(location, "data")) // pre-append tail
    var r = spark.readStream.schema(sparkSchema)
      .option("recursiveFileLookup", "true")
    maxFilesPerTrigger.foreach(n =>
      r = r.option("maxFilesPerTrigger", n.toString))
    r.parquet(s"$location/data")
  }

  /** Like readAlignedFilesFor, but with prior position AND equality deletes
    * anti-joined away — the read every mutation must use, or CoW
    * rewrites would resurrect MoR-deleted rows.
    */
  private def readAppliedFor(meta: TableMetadataV2,
      entries: Seq[DataFileEntry], readSchema: SchemaV2,
      asOf: Option[Long] = None): DataFrame =
    readDeletesApplied(meta,
      entries.map(e => (e.path, e.schemaId, e.sequenceNumber)),
      readSchema, asOf, formatOf = GraftTable.fmtOf(entries))

  /** The deletes-applied read: position deletes anti-join on (file,
    * pos); equality deletes anti-join once per key-column-set with the
    * delete sequence in the join condition (files added after a delete
    * are untouched).
    */
  private def readDeletesApplied(meta: TableMetadataV2,
      files: Seq[(String, Int, Long)], readSchema: SchemaV2,
      asOf: Option[Long], withFile: Boolean = false,
      withRowPos: Boolean = false,
      withLineage: Boolean = false,
      formatOf: Map[String, String] = Map.empty): DataFrame =
    GraftTable.readDeletesAppliedCore(spark, meta, files, readSchema,
      posDeleteEntriesFor(meta, asOf), eqDeletesFor(meta, asOf), withFile,
      withRowPos, withLineage, formatOf)

  /** Anti-join position deletes (parquet files of (file_path, pos) and
    * decoded deletion vectors) against a position-annotated read. Delete
    * sets are small relative to data — Spark broadcasts them and the
    * scan stays map-side.
    */
  private def applyDeletes(df: DataFrame,
      posDels: Seq[DataFileEntry]): DataFrame =
    GraftTable.applyPosDeletesCore(spark, df, posDels)

  private def readAlignedFilesFor(meta: TableMetadataV2,
      files: Seq[(String, Int)], readSchema: SchemaV2,
      withPos: Boolean = false,
      formatOf: Map[String, String] = Map.empty): DataFrame =
    GraftTable.readAlignedFilesCore(spark, meta, files, readSchema, withPos,
      formatOf = formatOf)

  // ------------------------------------------------------- mutation ops ----

  /** Copy-on-write DELETE WHERE: untouched files survive as-is; files that
    * may contain matching rows are rewritten without them. Rebases and
    * retries on version-claim conflicts like every other mutation (the
    * rewrite re-derives against fresh metadata per attempt).
    */
  def deleteWhere(cond: Column): SnapshotV2 =
    retryingCommit(() => deleteAndAdd(cond, None))

  /** Atomic INSERT OVERWRITE: ONE commit removes the rows matching `cond`
    * (file-granular CoW, like deleteWhere) and adds `replacement`'s rows.
    * Readers never observe the truncated-but-not-refilled intermediate
    * state a delete-then-append pair would expose.
    */
  def overwriteWhere(cond: Column, replacement: DataFrame): SnapshotV2 = {
    // replacement files are written ONCE; a conflict retry re-refs the
    // same shards (commitSnapshot design) while re-deriving the rewrite.
    // On lineage tables the replacement shards are FRESH: commit assigns
    // them new first-row-id bases (v3 — overwrite rows get new ids),
    // while survivor rows of partially-matching files keep theirs via
    // the lineage-annotated rewrite read.
    val adds = writeFiles(replacement, lineageFresh = lineageEnabled(metadata))
    retryingCommit(() => deleteAndAdd(cond, Some(adds)))
  }

  private def deleteAndAdd(cond: Column,
      extraAdds: Option[PendingAdds]): SnapshotV2 =
    // keep rows where cond is FALSE or NULL (SQL DELETE deletes only
    // rows where cond is true; !NULL is NULL and would drop them).
    // Whole-file drops enabled: a file whose stats prove EVERY row
    // matches leaves metadata without being read — partition-aligned
    // deletes (the common retention/GDPR shape) become metadata-only.
    cowRewrite(if (extraAdds.isEmpty) "delete" else "overwrite", cond,
      df => df.filter(cond.isNull || !cond), extraAdds,
      dropWholeFiles = true)

  /** Copy-on-write UPDATE WHERE: files that may contain rows matching
    * `cond` are rewritten with `assignments` applied to matching rows
    * (a row updates only where cond is TRUE — null is not matched);
    * untouched files survive as-is. Assignment values may reference any
    * table column (e.g. `SET qty = qty * 2`).
    */
  def updateWhere(cond: Column,
      assignments: Map[String, Column]): SnapshotV2 = {
    val sparkSchema = toSparkSchema(metadata.currentSchema)
    assignments.keys.foreach(k =>
      require(sparkSchema.fieldNames.contains(k),
        s"UPDATE assignment targets unknown column $k"))
    retryingCommit(() => cowRewrite("overwrite", cond, { df =>
      // lineage pass-through: an updated row keeps its _row_id and gets
      // a NULL last-updated sequence — the materialized-file reader
      // inherits the rewrite commit's own sequence for it (v3 contract);
      // untouched carried rows keep their original sequence
      val lineageSel =
        if (!df.columns.contains(GraftTable.RowIdCol))
          Seq.empty[Column]
        else Seq(col(GraftTable.RowIdCol),
          when(cond, lit(null).cast(LongType))
            .otherwise(col(GraftTable.LastUpdCol))
            .as(GraftTable.LastUpdCol))
      df.select(sparkSchema.fields.toIndexedSeq.map { f =>
        assignments.get(f.name) match {
          case Some(v) =>
            when(cond, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      } ++ lineageSel: _*)
    }, None))
  }

  /** Shared file-granular CoW mutation: untouched files survive as-is;
    * files that may contain rows matching `cond` are re-read (prior MoR
    * deletes applied, so the rewrite can't resurrect rows) and replaced
    * by `rewrite`'s output. Position deletes into rewritten files are
    * rebuilt so metadata counts stay exact.
    *
    * With `dropWholeFiles` (delete only — sound solely when `rewrite`
    * removes exactly the cond-true rows): files whose stats PROVE every
    * row matches a fully-translated predicate are dropped from metadata
    * without being read — a partition-aligned DELETE touches no data at
    * any table size.
    */
  private def cowRewrite(op: String, cond: Column,
      rewrite: DataFrame => DataFrame,
      extraAdds: Option[PendingAdds],
      dropWholeFiles: Boolean = false): SnapshotV2 =
    commitSnapshot(op, { meta =>
      // CoW DELETE and UPDATE preserve lineage: the rewrite's input is
      // the lineage-annotated read and writeFiles materializes the ids
      // into the rewritten files (updateWhere null-outs the sequence of
      // updated rows so they inherit this commit's — the v3 contract).
      // INSERT OVERWRITE's replacement shards arrive via extraAdds
      // marked lineageFresh — commit assigns them new id bases.
      val schema = meta.currentSchema
      val sparkSchema = toSparkSchema(schema)
      val (preds, complete) =
        Pruning.extractWithCompleteness(spark, cond, sparkSchema)
      def hit(e: DataFileEntry): Boolean = e.isData &&
        entryMayMatch(meta, e, preds, sparkSchema, schema)
      val hitCol = mayMatchColumnFor(meta, preds, sparkSchema, schema)
      val (reused, _, affected) = splitManifests(meta, hitCol, hit)
      val (maybe0, carried) = affected.partition(hit)
      // whole-file drops are only sound when EVERY conjunct of cond
      // translated (else mustMatch would certify against a weaker
      // predicate and delete rows cond keeps)
      val (dropped, maybe) =
        if (dropWholeFiles && complete)
          maybe0.partition(e => Pruning.mustMatch(e, preds, sparkSchema))
        else (Seq.empty[DataFileEntry], maybe0)
      val rewritten =
        if (maybe.isEmpty) PendingAdds.empty
        else writeFiles(rewrite(readAppliedForRewrite(meta, maybe, schema)))
      // position deletes referencing rewritten OR dropped files are now
      // dead — rebuild the delete set so metadata counts stay exact
      val gone = (maybe ++ dropped).map(_.path).toSet
      val posDels = reused.filter(_.content == 1).flatMap(_.entries)
      val (reusedRefs, newDels) =
        if (gone.isEmpty || posDels.isEmpty) (reused, Seq.empty)
        else (reused.filterNot(_.content == 1),
          rebuildPosDeletes(posDels, gone, schema.schemaId))
      (reusedRefs,
        PendingAdds(carried ++ newDels,
          rewritten.shards ++ extraAdds.map(_.shards).getOrElse(Seq.empty)),
        Map("rewritten-files" -> maybe.size.toString,
          "dropped-files" -> dropped.size.toString))
    })

  /** Merge-on-read DELETE WHERE: instead of rewriting affected data files
    * (CoW), write POSITION DELETE files — parquet of (file_path, pos) for
    * matching rows — and commit them alongside untouched data manifests.
    * Frequent small deletes (the dominant mutation in a curation
    * pipeline) become O(deleted rows) instead of O(affected file bytes);
    * scans anti-join the positions away. Positions are derived from the
    * deletes-APPLIED read, so a row is never recorded twice and delete
    * record counts subtract exactly. Compaction absorbs delete files.
    */
  def deleteWhereMoR(cond: Column): SnapshotV2 =
    // positions are only valid against the EXACT snapshot they were
    // computed from — a concurrent rewrite would orphan them (rows
    // surviving in the new files) and a concurrent MoR delete could
    // double-record a row. So the whole derivation re-runs on conflict,
    // pinned to the snapshot observed at the start of each attempt;
    // abandoned delete files are swept by removeOrphanFiles.
    if (metadata.properties.exists(_.get(GraftTable.DeleteFormatProp)
        .contains("deletion-vectors")))
      deleteWhereDv(cond)
    else retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      // pruned plan of possibly-affected files — DISTRIBUTED above the
      // manifest-entry threshold (same path as scan), so a MERGE-scale
      // table never materializes its full entry list on the driver
      val affected = plannedFilesFor(meta, Some(cond), None)
      val delEntries: Seq[DataFileEntry] =
        if (affected.isEmpty) Seq.empty
        else {
          val writeId = java.util.UUID.randomUUID.toString.take(8)
          val delDir = s"$location/deletes/$writeId"
          morLivePositions(meta, cond, affected)
            .write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
          footerCounts(delDir).map { case (p, n) =>
            DataFileEntry(p, n, PendingSnapshot, 0L, schema.schemaId,
              Map.empty, Map.empty, content = 1) }
        }
      commitSnapshot("delete", fresh => {
        if (fresh.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during deleteWhereMoR at $location")
        (manifestsFor(fresh, None), PendingAdds(delEntries, Seq.empty),
          Map("position-delete-files" -> delEntries.size.toString,
            "deleted-rows" -> delEntries.map(_.recordCount).sum.toString))
      })
    })

  /** Matching (file_path, pos) pairs of the LIVE rows of `affected` files
    * — the fully-applied read (prior position and equality deletes), so a
    * row is never recorded twice. Shared by both MoR delete forms.
    */
  private def morLivePositions(meta: TableMetadataV2, cond: Column,
      affected: Seq[(String, Int, Long, String)]): DataFrame =
    morLiveMatching(meta, cond, affected)
      .select(col(PosPathCol).as("file_path"), col(PosIdxCol).as("pos"))

  /** LIVE rows of `affected` files matching `cond`, WITH their
    * (PosPathCol, PosIdxCol) addresses — the fully-applied read (prior
    * position and equality deletes), so a row is never matched twice.
    * With `withLineage` the rows additionally carry `_row_id` (virtual
    * or materialized), so a MoR update/merge can hand each replaced
    * row's identity to its new version. Feeds the MoR delete forms
    * (positions only) and the MoR update/merge row-delta writers (full
    * rows).
    */
  private def morLiveMatching(meta: TableMetadataV2, cond: Column,
      affected: Seq[(String, Int, Long, String)],
      withLineage: Boolean = false): DataFrame = {
    val schema = meta.currentSchema
    // MoR positions are parquet row indexes; a non-parquet file cannot
    // receive them — the withPos read below refuses via formatOf
    val fmts = affected.collect {
      case (p, _, _, f) if f != DataFileEntry.Parquet => p -> f }.toMap
    require(!withLineage || fmts.isEmpty,
      "lineage-preserving MoR mutation over non-parquet files is " +
        "unsupported — compact the imported files first")
    val dels = posDeleteEntriesFor(meta, None)
    val minSeq = affected.map(_._3).min
    val eqDels = eqDeletesFor(meta, None)
      .filter(_.sequenceNumber > minSeq)
    // lineage needs the plan's firstRowId per entry — re-derive entries
    // for the affected paths off the (already driver-sized) manifests
    val lineageEntries: Map[String, DataFileEntry] =
      if (!withLineage) Map.empty
      else {
        val want = affected.map(e => canonPath(decodePath(e._1))).toSet
        liveEntries(None).filter(e => e.isData &&
          want.contains(canonPath(decodePath(e.path))))
          .map(e => canonPath(decodePath(e.path)) -> e).toMap
      }
    val ann0 = affected.groupBy(_._3).map { case (sq, es) =>
      val ann =
        if (!withLineage) readAlignedFilesFor(meta,
          es.map(e => (e._1, e._2)), schema, withPos = true,
          formatOf = fmts)
        else alignedWithRowId(meta,
          es.map(e => lineageEntries(canonPath(decodePath(e._1)))),
          schema, withPos = true)
      (if (dels.isEmpty) ann else applyDeletes(ann, dels))
        .withColumn(SeqCol, lit(sq))
    }.reduce(_.unionByName(_))
    val live = applyEqDeletesSeq(ann0, eqDels).drop(SeqCol)
    live.filter(cond)
  }

  /** Merge-on-read DELETE WHERE as DELETION VECTORS (the Iceberg-v3
    * delete form): instead of appending (file_path, pos) parquet, commit
    * ONE bitmap blob per affected data file. A new DV MERGES the file's
    * previous DV (its positions are a superset) and the commit drops the
    * superseded entry, so a file carries at most one DV no matter how
    * many deletes its history holds — scans apply one blob per file
    * instead of opening every delete file ever committed, the property
    * that keeps long MoR histories readable at 100 TB. Record counts
    * stay exact (old ∪ new positions are disjoint by construction:
    * new positions come from the deletes-APPLIED read), so metadata-only
    * counts keep working. Also reachable via the table property
    * `write.delete.format = deletion-vectors` routing deleteWhereMoR.
    */
  def deleteWhereDv(cond: Column): SnapshotV2 =
    retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      val affected = plannedFilesFor(meta, Some(cond), None)
      val (dvEntries, supersededCanon): (Seq[DataFileEntry], Set[String]) =
        if (affected.isEmpty) (Seq.empty, Set.empty)
        else writeMergedDvs(meta, morLivePositions(meta, cond, affected))
      val snap = commitSnapshot("delete", fresh => {
        if (fresh.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during deleteWhereDv at $location")
        val all = manifestsFor(fresh, None)
        if (supersededCanon.isEmpty)
          (all, PendingAdds(dvEntries, Seq.empty),
            Map("deletion-vectors" -> dvEntries.size.toString,
              "deleted-rows" -> dvEntries.map(_.recordCount).sum.toString))
        else {
          // superseded DVs live inside content-1 manifests: rewrite those,
          // carrying every entry EXCEPT the replaced vectors
          val (delMfs, rest) = all.partition(_.content == 1)
          val carried = delMfs.flatMap(_.entries).filterNot(e =>
            e.dv.exists(d =>
              supersededCanon.contains(canonPath(decodePath(d.dataFile)))))
          (rest, PendingAdds(carried ++ dvEntries, Seq.empty),
            Map("deletion-vectors" -> dvEntries.size.toString,
              "superseded-vectors" -> supersededCanon.size.toString,
              "deleted-rows" ->
                (dvEntries.map(_.recordCount).sum -
                  // merged rows were already counted by the superseded DV
                  delMfs.flatMap(_.entries).filter(e => e.dv.exists(d =>
                    supersededCanon.contains(
                      canonPath(decodePath(d.dataFile)))))
                    .map(_.recordCount).sum).toString))
        }
      })
      // the sidecars were written executor-side BEFORE the commit
      // existed, so their Puffin footers carry -1 ids; now that the
      // commit assigned them, stamp the real snapshot-id/sequence-number
      // (footer-only atomic rewrite, O(new sidecars) — blob offsets are
      // untouched, so the just-committed manifest byte-ranges stay valid)
      dvEntries.map(_.path).distinct.foreach(s =>
        Puffin.restamp(java.nio.file.Paths.get(s), snap.snapshotId,
          snap.sequenceNumber))
      snap
    })

  /** One merged DELETION VECTOR per data file touched by `positions`,
    * superseding those files' existing DVs (their positions merge in,
    * their entries drop at commit — a file carries at most ONE vector).
    * Returns (new DV entries, canon paths of data files whose previous
    * DVs are superseded). Shared by DV-form DELETE, UPDATE and MERGE.
    */
  private def writeMergedDvs(meta: TableMetadataV2, positions: DataFrame)
      : (Seq[DataFileEntry], Set[String]) = {
    val schema = meta.currentSchema
    val writeId = java.util.UUID.randomUUID.toString.take(8)
    val dvDir = s"$location/deletes/dv-$writeId"
    // the matched positions feed TWO actions (touched-file discovery,
    // the sidecar write) and each would otherwise re-scan the affected
    // data files; persist the narrow (file, pos) pairs for the span —
    // O(matched rows), spill-safe, released below (guide §5)
    val posCached = positions.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // files actually receiving deletes — bounded by the affected plan
      val touchedRaw = posCached.select("file_path").distinct()
        .collect().map(_.getString(0)).toSet
      if (touchedRaw.isEmpty) return (Seq.empty, Set.empty)
      val touchedCanon = touchedRaw.map(p => canonPath(decodePath(p)))
      val oldDvs = posDeleteEntriesFor(meta, None).filter(_.dv.exists(
        d => touchedCanon.contains(canonPath(decodePath(d.dataFile)))))
      val mergedPos =
        if (oldDvs.isEmpty) posCached
        else posCached.unionByName(
          GraftTable.posDeletePositionsCore(spark, oldDvs))
      val written = Dv.writeAll(spark, mergedPos, dvDir)
      (written.map(w => DataFileEntry(w.sidecar, w.cardinality,
        PendingSnapshot, 0L, schema.schemaId, Map.empty, Map.empty,
        content = 1, dv = Some(Dv.DvRef(w.dataFile, w.off, w.len)))),
        oldDvs.map(e => canonPath(decodePath(e.dv.get.dataFile))).toSet)
    } finally posCached.unpersist(false)
  }

  /** Write matched positions in this table's configured delete form:
    * plain position-delete parquet by default, merged DVs under
    * `write.delete.format = deletion-vectors`. Returns (entries,
    * superseded-DV canon paths — always empty for the parquet form).
    * DV sidecars must be restamped after the commit ([[restampDvs]]).
    */
  private def writeRowDeltaDeletes(meta: TableMetadataV2,
      positions: DataFrame): (Seq[DataFileEntry], Set[String]) =
    if (meta.properties.exists(_.get(GraftTable.DeleteFormatProp)
        .contains("deletion-vectors")))
      writeMergedDvs(meta, positions)
    else {
      val writeId = java.util.UUID.randomUUID.toString.take(8)
      val delDir = s"$location/deletes/$writeId"
      positions.write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
      (footerCounts(delDir).map { case (p, n) =>
        DataFileEntry(p, n, PendingSnapshot, 0L,
          meta.currentSchema.schemaId, Map.empty, Map.empty,
          content = 1) }, Set.empty)
    }

  /** Commit-side carry for a row-delta commit that may supersede DVs:
    * returns (manifest refs to reuse verbatim, delete entries to carry
    * forward, superseded row count). With nothing superseded every ref
    * is reused and nothing is carried.
    */
  private def carryMinusSupersededDvs(fresh: TableMetadataV2,
      superseded: Set[String])
      : (Seq[ManifestRef], Seq[DataFileEntry], Long) = {
    val all = manifestsFor(fresh, None)
    if (superseded.isEmpty) (all, Seq.empty, 0L)
    else {
      // superseded DVs live inside content-1 manifests: rewrite those,
      // carrying every entry EXCEPT the replaced vectors
      val (delMfs, rest) = all.partition(_.content == 1)
      val (dead, carried) = delMfs.flatMap(_.entries).partition(e =>
        e.dv.exists(d =>
          superseded.contains(canonPath(decodePath(d.dataFile)))))
      (rest, carried, dead.map(_.recordCount).sum)
    }
  }

  /** Post-commit Puffin footer restamp for just-committed DV sidecars
    * (written executor-side before the commit existed, so their footers
    * carry -1 ids). Footer-only atomic rewrite — blob offsets are
    * untouched, so committed manifest byte-ranges stay valid.
    */
  private def restampDvs(entries: Seq[DataFileEntry],
      snap: SnapshotV2): Unit =
    entries.filter(_.dv.isDefined).map(_.path).distinct.foreach(s =>
      Puffin.restamp(java.nio.file.Paths.get(s), snap.snapshotId,
        snap.sequenceNumber))

  /** Merge-on-read UPDATE WHERE (Iceberg's `write.update.mode =
    * merge-on-read`): write position deletes (or merged DVs) for the
    * matched rows PLUS appended files of their updated versions, in one
    * row-delta commit — ZERO data files rewritten. A wide UPDATE on a
    * 100 TB table costs O(matched rows), not O(affected file bytes);
    * scans see the new versions via ordinary delete application. On
    * lineage tables each new version carries its replaced row's
    * `_row_id` with a null last-updated sequence, inheriting this
    * commit's (the v3 contract, same as the CoW path).
    */
  def updateWhereMoR(cond: Column,
      assignments: Map[String, Column]): SnapshotV2 = {
    val names0 = toSparkSchema(metadata.currentSchema).fieldNames
    assignments.keys.foreach(k => require(names0.contains(k),
      s"UPDATE assignment targets unknown column $k"))
    retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      val sparkSchema = toSparkSchema(schema)
      val lineage = lineageEnabled(meta)
      if (lineage) requireLineageReadable(meta)
      val affected = plannedFilesFor(meta, Some(cond), None)
      val (delEntries, superseded, newData) =
        if (affected.isEmpty)
          (Seq.empty[DataFileEntry], Set.empty[String], PendingAdds.empty)
        else {
          val matching = morLiveMatching(meta, cond, affected,
            withLineage = lineage).persist()
          try {
            val (de, sup) = writeRowDeltaDeletes(meta, matching.select(
              col(PosPathCol).as("file_path"), col(PosIdxCol).as("pos")))
            // every selected row updates (cond already filtered TRUE)
            val lineageSel =
              if (!lineage) Seq.empty[Column]
              else Seq(col(GraftTable.RowIdCol),
                lit(null).cast(LongType).as(GraftTable.LastUpdCol))
            val updated = matching.select(
              sparkSchema.fields.toIndexedSeq.map { f =>
                assignments.get(f.name) match {
                  case Some(v) => v.cast(f.dataType).as(f.name)
                  case None => col(f.name)
                }
              } ++ lineageSel: _*)
            (de, sup, writeFiles(updated))
          } finally matching.unpersist()
        }
      val snap = commitSnapshot("overwrite", fresh => {
        if (fresh.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during updateWhereMoR at $location")
        val (refs, carried, supRows) =
          carryMinusSupersededDvs(fresh, superseded)
        (refs,
          PendingAdds(carried ++ delEntries ++ newData.entries,
            newData.shards),
          Map("row-delta" -> "true",
            "updated-rows" ->
              (delEntries.map(_.recordCount).sum - supRows).toString,
            "delete-files" -> delEntries.size.toString))
      })
      restampDvs(delEntries, snap)
      snap
    })
  }

  /** Merge-on-read MERGE (Iceberg's `write.merge.mode = merge-on-read`):
    * same action semantics as [[mergeApply]], but instead of rewriting
    * every affected file it commits one row-delta — position deletes
    * (or merged DVs) for rows an UPDATE/DELETE action replaced, plus
    * appended files of updated versions and inserts. Rows no action
    * touches cost NOTHING (the CoW path re-writes them); at 100 TB a
    * MERGE touching 0.1% of rows writes 0.1% of the bytes.
    */
  def mergeApplyMoR(source: DataFrame, keys: Seq[(String, String)],
      matched: Seq[MergeAction],
      notMatched: Seq[MergeInsert],
      notMatchedBySource: Seq[MergeAction] = Seq.empty): SnapshotV2 = {
    val srcPfx = GraftTable.MergeSourcePrefix
    retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      val sparkSchema = toSparkSchema(schema)
      val lineage = lineageEnabled(meta)
      if (lineage) requireLineageReadable(meta)
      keys.foreach { case (t, s) =>
        require(sparkSchema.fieldNames.contains(t),
          s"merge key $t is not a table column")
        require(source.columns.contains(s),
          s"merge key $s is not a source column")
      }
      require(source.columns.distinct.length == source.columns.length,
        "merge source has duplicate column names")
      // the source plan runs twice (key envelope, the full-outer join)
      // — persist it for the span of this merge, as in the CoW path
      val srcCached = source.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
      // key envelope of the source → affected-file pruning, as in the
      // CoW path; not-matched-by-source actions touch every target row
      val envCond: Option[Column] =
        if (notMatchedBySource.nonEmpty) None
        else {
          val aggs =
            keys.map { case (t, s) => min(col(s)).as(s"mn::$t") } ++
              keys.map { case (t, s) => max(col(s)).as(s"mx::$t") }
          val bounds = srcCached.agg(aggs.head, aggs.tail: _*).head()
          Some(keys.map { case (t, _) =>
            val mn = bounds.getAs[Any](s"mn::$t")
            val mx = bounds.getAs[Any](s"mx::$t")
            // empty/all-null source side: no key can match any file
            if (mn == null || mx == null) lit(false)
            else col(t) >= lit(mn) && col(t) <= lit(mx)
          }.reduce(_ && _))
        }
      val affected = plannedFilesFor(meta, envCond, None)
      // all live rows of possibly-matching files, with row addresses;
      // rows of pruned files provably match no source key
      val target =
        (if (affected.nonEmpty)
          morLiveMatching(meta, lit(true), affected,
            withLineage = lineage)
        else {
          val empty = GraftTable.readAlignedFilesCore(spark, meta,
            Seq.empty, schema, withPos = true)
          if (lineage)
            empty.withColumn(GraftTable.RowIdCol, lit(null).cast(LongType))
          else empty
        }).withColumn("__tgt_present", lit(1))
      val src = srcCached.select(source.columns.toIndexedSeq.map(n =>
        col(n).as(s"$srcPfx$n")) :+ lit(1).as("__src_present"): _*)
      val joinCond = keys.map { case (t, s) =>
        col(t) === col(s"$srcPfx$s") }.reduce(_ && _)
      val joined = target.join(src, joinCond, "full_outer").persist()
      try {
        val isMatched =
          col("__tgt_present").isNotNull && col("__src_present").isNotNull
        val isTgtOnly =
          col("__tgt_present").isNotNull && col("__src_present").isNull
        val isSrcOnly =
          col("__tgt_present").isNull && col("__src_present").isNotNull
        // SQL MERGE cardinality contract (see mergeApply): a multiply-
        // matched target row would have its position deleted once per
        // match and a new version appended per match — exact corruption
        // of record counts. Positions ARE row identity here.
        requireMergeCardinality(joined.filter(isMatched)
          .groupBy(col(PosPathCol), col(PosIdxCol)))
        def condOf(a: MergeAction): Column = a.condition.getOrElse(lit(true))
        // first-applicable-action chains, SQL-style: `applied` = some
        // action fires for the row, `updated` = that action is an UPDATE
        def appliedChain(actions: Seq[MergeAction]): Column =
          actions.foldRight(lit(false)) { (a, els) =>
            when(condOf(a), lit(true)).otherwise(els) }
        def updatedChain(actions: Seq[MergeAction]): Column =
          actions.foldRight(lit(false)) { (a, els) =>
            when(condOf(a), lit(a.isInstanceOf[MergeUpdate])).otherwise(els) }
        def valueChain(actions: Seq[MergeAction], f: SparkField,
            default: Column): Column =
          actions.foldRight(default) { (a, els) =>
            val v = a match {
              case MergeUpdate(_, asg) => asg.get(f.name)
                .map(_.cast(f.dataType)).getOrElse(col(f.name))
              case MergeInsert(_, vals) => vals.get(f.name)
                .map(_.cast(f.dataType))
                .getOrElse(lit(null).cast(f.dataType))
              case _: MergeDelete => col(f.name) // filtered out upstream
            }
            when(condOf(a), v).otherwise(els)
          }
        // a fired UPDATE or DELETE replaces/removes the old version —
        // either way its position is deleted; untouched rows cost zero
        val toDelete =
          (isMatched && appliedChain(matched)) ||
            (isTgtOnly && appliedChain(notMatchedBySource))
        val toUpdate =
          (isMatched && updatedChain(matched)) ||
            (isTgtOnly && updatedChain(notMatchedBySource))
        val toInsert = isSrcOnly && appliedChain(notMatched)
        val outCols = sparkSchema.fields.toIndexedSeq.map { f =>
          when(isMatched, valueChain(matched, f, col(f.name)))
            .when(isTgtOnly,
              valueChain(notMatchedBySource, f, col(f.name)))
            .otherwise(valueChain(notMatched, f,
              lit(null).cast(f.dataType)))
            .cast(f.dataType).as(f.name)
        }
        val (delEntries, superseded) = writeRowDeltaDeletes(meta,
          joined.filter(toDelete).select(
            col(PosPathCol).as("file_path"), col(PosIdxCol).as("pos")))
        // updated versions keep their row's id (null sequence inherits
        // this commit's); inserts are fresh rows and get new ids
        val lineageSel =
          if (!lineage) Seq.empty[Column]
          else Seq(col(GraftTable.RowIdCol),
            lit(null).cast(LongType).as(GraftTable.LastUpdCol))
        // without lineage, updated versions and inserts share schema and
        // destination semantics — ONE write job instead of two (guide
        // §2.4). Lineage tables keep the split: updates carry their ids,
        // inserts write fresh shards and get new ids at commit.
        val (updPart, insPart) =
          if (!lineage)
            (writeFiles(joined.filter(toUpdate || toInsert)
              .select(outCols: _*)), PendingAdds.empty)
          else
            (writeFiles(
              joined.filter(toUpdate).select(outCols ++ lineageSel: _*)),
              writeFiles(joined.filter(toInsert).select(outCols: _*),
                lineageFresh = true))
        val snap = commitSnapshot("overwrite", fresh => {
          if (fresh.currentSnapshotId != meta.currentSnapshotId)
            throw new CommitConflictException(
              s"table changed during mergeApplyMoR at $location")
          val (refs, carried, supRows) =
            carryMinusSupersededDvs(fresh, superseded)
          (refs,
            PendingAdds(
              carried ++ delEntries ++ updPart.entries ++ insPart.entries,
              updPart.shards ++ insPart.shards),
            Map("row-delta" -> "true",
              "replaced-rows" ->
                (delEntries.map(_.recordCount).sum - supRows).toString,
              "delete-files" -> delEntries.size.toString))
        })
        restampDvs(delEntries, snap)
        snap
      } finally joined.unpersist()
      } finally srcCached.unpersist(false)
    })
  }

  /** Merge-on-read EQUALITY delete: drop every CURRENT row whose key
    * tuple appears in `keys` (a DataFrame whose columns are a subset of
    * the table's). O(keys) — touches NO data at delete time, the
    * cheapest mutation for key-addressed curation (e.g. "remove these
    * doc_ids"). Sequence ordering scopes it: rows appended AFTER this
    * commit carry larger sequence numbers and are untouched, so a
    * re-inserted key survives its own past deletion.
    */
  def deleteWhereEq(keys: DataFrame): SnapshotV2 = {
    val meta = metadata
    val schema = meta.currentSchema
    val sparkSchema = toSparkSchema(schema)
    val cols = keys.columns.toSeq
    cols.foreach(c => require(sparkSchema.fieldNames.contains(c),
      s"equality-delete column $c is not a table column"))
    val writeId = java.util.UUID.randomUUID.toString.take(8)
    val delDir = s"$location/deletes/$writeId"
    pinParquetTs(keys) // eq-delete keys may carry timestamp columns
    keys.distinct().write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
    val delEntries = footerCounts(delDir).map { case (p, n) =>
      DataFileEntry(p, n, PendingSnapshot, 0L, schema.schemaId,
        Map.empty, Map.empty, content = 2, eqColumns = cols) }
    // plain rebase is safe here: equality deletes scope by sequence
    // number, so whatever commits in between, this delete still applies
    // to exactly the data that predates it
    retryingCommit(() => commitSnapshot("delete", fresh =>
      (manifestsFor(fresh, None), PendingAdds(delEntries, Seq.empty),
        Map("equality-delete-files" -> delEntries.size.toString,
          "equality-columns" -> cols.mkString(",")))))
  }

  /** Rebuild position-delete files after `removedPaths` data files left
    * the table (CoW rewrite/overwrite/compaction): positions referencing
    * them are dead — the rewrite already applied those deletes (or the
    * overwrite dropped the rows) — and keeping them would corrupt the
    * metadata-only count (data minus deletes). Returns replacement
    * entries; the caller must NOT reuse the old delete manifests.
    */
  private def rebuildPosDeletes(oldDeletes: Seq[DataFileEntry],
      removedPaths: Set[String], schemaId: Int): Seq[DataFileEntry] = {
    if (oldDeletes.isEmpty) return Seq.empty
    // deletion vectors reference exactly one data file, so the rebuild is
    // METADATA-ONLY for them: a DV whose file is gone is dropped, every
    // other DV is carried verbatim (concrete ids survive the re-add)
    val (dvs, parqs) = oldDeletes.partition(_.dv.isDefined)
    val dvKept = dvs.filterNot(e =>
      removedPaths.contains(decodePath(e.dv.get.dataFile)))
    if (parqs.isEmpty) return dvKept
    val writeId = java.util.UUID.randomUUID.toString.take(8)
    val delDir = s"$location/deletes/$writeId"
    // broadcast anti-join against the tiny removed-paths table instead
    // of a closure-captured-Set UDF (which serialized per task and
    // blocked codegen for the whole rebuild stage)
    val deadDf = spark.createDataFrame(removedPaths.toSeq.map(Tuple1(_)))
      .toDF("__dead_path")
    spark.read.parquet(parqs.map(_.path): _*)
      .join(broadcast(deadDf),
        GraftTable.decodePathCol(col("file_path")) === col("__dead_path"),
        "left_anti")
      .write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
    dvKept ++ footerCounts(delDir).map { case (p, n) =>
      DataFileEntry(p, n, PendingSnapshot, 0L, schemaId,
        Map.empty, Map.empty, content = 1) }
  }

  /** Manifest-granular change split: manifests where NO data entry
    * satisfies the predicate are reused verbatim; the rest contribute
    * their entries (hit or not) to the new manifest — untouched entries
    * keep their original added-snapshot ids. Position/equality-delete
    * entries are never `hit` — their manifests are reused verbatim and
    * stay in force after the rewrite.
    *
    * Above the planning threshold the affected-manifest set is computed
    * DISTRIBUTEDLY: `hitCol` runs as a Spark filter over the manifest
    * dataset and only affected manifest PATHS reach the driver, whose
    * entries are then the only ones materialized — mutation planning is
    * O(affected manifests), not O(table), exactly like scan(). `hitCol`
    * and `hit` must express the same predicate (column form over
    * manifest rows / driver form over entries).
    *
    * Returns (reused refs, affected refs, affected entries).
    */
  private def splitManifests(meta: TableMetadataV2, hitCol: Column,
      hit: DataFileEntry => Boolean)
      : (Seq[ManifestRef], Seq[ManifestRef], Seq[DataFileEntry]) = {
    val refs = manifestsFor(meta, None)
    if (refs.map(_.entryCount).sum < distributedPlanningThreshold) {
      // materialize each manifest ONCE (entries re-reads the file)
      val loaded = refs.map(r => (r, r.entries))
      val (affected, reused) =
        loaded.partition(_._2.exists(e => e.isData && hit(e)))
      (reused.map(_._1), affected.map(_._1), affected.flatMap(_._2))
    } else {
      val hitSrcs = manifestDfForRefs(refs)
        .filter(coalesce(col("content"), lit(0)) === 0)
        .filter(hitCol)
        .select(SrcManifestCol).distinct()
        .collect().map(r => canonPath(decodePath(r.getString(0)))).toSet
      val (affected, reused) =
        refs.partition(r => hitSrcs.contains(canonPath(r.path)))
      (reused, affected, affected.flatMap(_.entries))
    }
  }

  /** Dynamic partition overwrite: replaces exactly the partitions present
    * in `df` (spec-derived), leaves all others untouched.
    */
  def overwritePartitions(df: DataFrame): SnapshotV2 = {
    require(metadata.defaultSpec.fields.nonEmpty,
      "overwritePartitions needs a partitioned table")
    // lineage: replacement rows are FRESH (new ids at commit — the v3
    // overwrite contract); untouched partitions carry their ids as-is
    val adds = writeFiles(df, lineageFresh = lineageEnabled(metadata))
    val touched: Set[Map[String, Option[String]]] = addedPartitions(adds)
    // the replaced-partition predicate in both planning forms: canonical
    // partition strings compare against the (small) touched set
    val touchedKeys = touched.map(canonPartition)
    val hitCol =
      if (touchedKeys.isEmpty) lit(false)
      else canonPartitionCol.isin(touchedKeys.toSeq: _*)
    // replacement files are written ONCE; a conflict retry re-refs the
    // same shards while re-deriving the replaced set against fresh state
    retryingCommit(() => commitSnapshot("overwrite", { meta =>
      val (reused, _, affected) =
        splitManifests(meta, hitCol, e => touched.contains(e.partition))
      val (dropped, carried) =
        affected.partition(e => touched.contains(e.partition))
      // positions into dropped files are dead (their rows were replaced)
      val posDels = reused.filter(_.content == 1).flatMap(_.entries)
      val (reusedRefs, newDels) =
        if (dropped.isEmpty || posDels.isEmpty) (reused, Seq.empty)
        else (reused.filterNot(_.content == 1),
          rebuildPosDeletes(posDels, dropped.map(_.path).toSet,
            meta.currentSchema.schemaId))
      (reusedRefs, PendingAdds(carried ++ newDels, adds.shards),
        Map("replaced-partitions" -> touched.size.toString))
    }))
  }

  /** DISTINCT partition tuples of freshly written shards — a tiny
    * distributed aggregate over the shard manifests (distinct partitions
    * are few by construction, so the collect is bounded).
    */
  private def addedPartitions(adds: PendingAdds)
      : Set[Map[String, Option[String]]] = {
    val fromEntries = adds.entries.map(_.partition).toSet
    val fromShards =
      if (adds.shards.isEmpty) Set.empty[Map[String, Option[String]]]
      else spark.read.schema(manifestSchema)
        .json(adds.shards.map(_.path): _*)
        // set ops don't support MAP columns — canonicalize to a sorted
        // entry array, which distincts fine
        .select(array_sort(map_entries(col("partition"))).as("p"))
        .distinct().collect()
        .map { r =>
          r.getSeq[Row](0)
            .map(e => e.getString(0) -> Option(e.getString(1))).toMap
        }.toSet
    fromEntries ++ fromShards
  }

  /** MERGE INTO (upsert) on equality keys: matched target rows take the
    * source's values, unmatched source rows are inserted. File-granular
    * CoW — only files whose key range intersects the source's key range
    * are rewritten (stats-conservative; disjoint files provably hold no
    * matching key). The star case of `mergeApply`.
    */
  def mergeInto(source: DataFrame, keys: Seq[String]): SnapshotV2 = {
    val allCols = toSparkSchema(metadata.currentSchema).fieldNames.toSeq
    val star = allCols.map(n =>
      n -> col(s"${GraftTable.MergeSourcePrefix}$n")).toMap
    mergeApply(source, keys.map(k => (k, k)),
      matched = Seq(MergeUpdate(None, star)),
      notMatched = Seq(MergeInsert(None, star)))
  }

  /** Throw the SQL MERGE cardinality violation when any identity group
    * in `grouped` (target-row identity: uid or file position) holds more
    * than one matched join row.
    */
  private def requireMergeCardinality(
      grouped: org.apache.spark.sql.RelationalGroupedDataset): Unit = {
    val dupes = grouped.agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count()
    if (dupes > 0) throw new IllegalStateException(
      "MERGE cardinality violation: a target row matches more than one " +
        "source row — the ON condition must match each target row at " +
        "most once (deduplicate the source or tighten the keys)")
  }

  /** Generalized MERGE on equality keys (the full SQL MERGE INTO shape):
    * `matched` actions apply to (target, source) key matches, `notMatched`
    * to source-only rows, `notMatchedBySource` to target-only rows — each
    * list first-match-wins on its optional condition, SQL-style (a null
    * condition is not a match; a row with no applicable action keeps its
    * current fate: matched/target-only rows survive unchanged, source-only
    * rows are not inserted).
    *
    * Action conditions and values reference TARGET columns by name and
    * SOURCE columns as `GraftTable.MergeSourcePrefix + name`.
    *
    * Scale: file-granular CoW — only files whose key envelope intersects
    * the source's are rewritten, unless `notMatchedBySource` actions are
    * present (those touch every target row by definition, so every data
    * file is affected).
    */
  def mergeApply(source: DataFrame, keys: Seq[(String, String)],
      matched: Seq[MergeAction],
      notMatched: Seq[MergeInsert],
      notMatchedBySource: Seq[MergeAction] = Seq.empty): SnapshotV2 = {
    val meta = metadata
    val lineage = lineageEnabled(meta)
    val schema = meta.currentSchema
    val sparkSchema = toSparkSchema(schema)
    val srcPfx = GraftTable.MergeSourcePrefix
    keys.foreach { case (t, s) =>
      require(sparkSchema.fieldNames.contains(t),
        s"merge key $t is not a table column")
      require(source.columns.contains(s),
        s"merge key $s is not a source column")
    }
    require(source.columns.distinct.length == source.columns.length,
      "merge source has duplicate column names")
    // the source plan is consumed THREE times (key envelope, cardinality
    // pre-join, the rewrite join) — at scale each pass re-runs the
    // caller's full source query (typically a scan + dedup aggregate).
    // Persist it for the span of this merge (guide §5: reuse × recompute
    // cost), in-run only, released in the finally below.
    val srcCached = source.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // key envelope of the source (tiny aggregate) → affected-file
    // predicate; not-matched-by-source actions touch every target row,
    // so they force every data file into the rewrite
    val preds: Seq[Pruning.Cmp] =
      if (notMatchedBySource.nonEmpty) Seq.empty
      else {
        val aggs = keys.map { case (t, s) => min(col(s)).as(s"mn::$t") } ++
          keys.map { case (t, s) => max(col(s)).as(s"mx::$t") }
        val bounds = srcCached.agg(aggs.head, aggs.tail: _*).head()
        keys.flatMap { case (t, _) =>
          val dt = sparkSchema(t).dataType
          Seq(
            Pruning.normalize(bounds.getAs[Any](s"mn::$t"), dt)
              .map(v => Pruning.Cmp(t, ">=", v)),
            Pruning.normalize(bounds.getAs[Any](s"mx::$t"), dt)
              .map(v => Pruning.Cmp(t, "<=", v))).flatten
        }
      }
    val hitAll = notMatchedBySource.nonEmpty
    def hit(e: DataFileEntry): Boolean = e.isData &&
      (hitAll || entryMayMatch(meta, e, preds, sparkSchema, schema))
    val hitCol =
      if (hitAll) lit(true)
      else mayMatchColumnFor(meta, preds, sparkSchema, schema)
    val (reused, affectedManifests, affectedEntries) =
      splitManifests(meta, hitCol, hit)
    val (affected, carried) = affectedEntries.partition(hit)
    // explicit presence markers: testing a KEY for null would
    // misclassify null-keyed rows on either side. On lineage tables the
    // target read carries _row_id/_last_updated so the rewrite preserves
    // row identity.
    val target = readAppliedForRewrite(meta, affected, schema)
      .withColumn("__tgt_present", lit(1))
    val src = srcCached.select(source.columns.toIndexedSeq.map(n =>
      col(n).as(s"$srcPfx$n")) :+ lit(1).as("__src_present"): _*)
    val joinCond = keys.map { case (t, s) =>
      col(t) === col(s"$srcPfx$s") }.reduce(_ && _)
    // SQL MERGE cardinality contract: a target row matched by MORE THAN
    // ONE source row is an error, never silent corruption (the
    // full-outer join below would otherwise emit the row once per
    // match — duplicating it in the rewrite, or double-applying its
    // action). Checked as a NARROW keys-only pre-join (uid + key
    // columns; column pruning reaches the scan) so the rewrite itself
    // stays a single streamed execution — no full-row persist.
    requireMergeCardinality(
      target.select(monotonically_increasing_id().as("__tgt_uid") +:
        keys.map(k => col(k._1)): _*)
        .join(src.select(keys.map(k =>
          col(s"$srcPfx${k._2}")): _*), joinCond, "inner")
        .groupBy(col("__tgt_uid")))
    val joined = target.join(src, joinCond, "full_outer")

    val isMatched =
      col("__tgt_present").isNotNull && col("__src_present").isNotNull
    val isTgtOnly =
      col("__tgt_present").isNotNull && col("__src_present").isNull
    def condOf(a: MergeAction): Column = a.condition.getOrElse(lit(true))
    // first-match-wins chains: value and keep fold over the SAME
    // conditions in the same order, so they always agree on which
    // action (if any) applied
    def keepChain(actions: Seq[MergeAction], default: Column): Column =
      actions.foldRight(default) { (a, els) =>
        when(condOf(a),
          lit(!a.isInstanceOf[MergeDelete])).otherwise(els)
      }
    def valueChain(actions: Seq[MergeAction], f: SparkField,
        default: Column): Column =
      actions.foldRight(default) { (a, els) =>
        val v = a match {
          case MergeUpdate(_, asg) =>
            asg.get(f.name).map(_.cast(f.dataType)).getOrElse(col(f.name))
          case MergeInsert(_, vals) => vals.get(f.name)
            .map(_.cast(f.dataType)).getOrElse(lit(null).cast(f.dataType))
          case _: MergeDelete => col(f.name) // dropped by keepChain
        }
        when(condOf(a), v).otherwise(els)
      }
    val keep =
      when(isMatched, keepChain(matched, lit(true)))
        .when(isTgtOnly, keepChain(notMatchedBySource, lit(true)))
        .otherwise(keepChain(notMatched, lit(false)))
    val outCols = sparkSchema.fields.toIndexedSeq.map { f =>
      when(isMatched, valueChain(matched, f, col(f.name)))
        .when(isTgtOnly, valueChain(notMatchedBySource, f, col(f.name)))
        .otherwise(valueChain(notMatched, f,
          lit(null).cast(f.dataType)))
        .cast(f.dataType).as(f.name)
    }
    val rewritten =
      if (!lineage) writeFiles(joined.filter(keep).select(outCols: _*))
      else {
        // split by origin: TARGET-derived rows rewrite with their ids
        // materialized (updated rows null their last-updated sequence,
        // inheriting this commit's — the v3 contract); SOURCE-ONLY
        // inserts write as FRESH shards and get new ids at commit
        def updatedChain(actions: Seq[MergeAction]): Column =
          actions.foldRight(lit(false)) { (a, els) =>
            when(condOf(a), lit(a.isInstanceOf[MergeUpdate])).otherwise(els)
          }
        val wasUpdated =
          when(isMatched, updatedChain(matched))
            .when(isTgtOnly, updatedChain(notMatchedBySource))
            .otherwise(lit(false))
        val lineageOut = Seq(
          col(GraftTable.RowIdCol),
          when(wasUpdated, lit(null).cast(LongType))
            .otherwise(col(GraftTable.LastUpdCol))
            .as(GraftTable.LastUpdCol))
        val tgtPart = joined.filter(keep && col("__tgt_present").isNotNull)
          .select(outCols ++ lineageOut: _*)
        val insPart = joined.filter(keep && col("__tgt_present").isNull)
          .select(outCols: _*)
        val a = writeFiles(tgtPart)
        val b = writeFiles(insPart, lineageFresh = true)
        PendingAdds(a.entries ++ b.entries, a.shards ++ b.shards)
      }
    commitSnapshot("overwrite", { freshMeta =>
      // the rewrite was derived from `meta`; if the manifest set moved
      // underneath us the merge must be re-run, not silently committed
      if (manifestsFor(freshMeta, None).map(_.path).sorted !=
          (reused ++ affectedManifests).map(_.path).sorted)
        throw new CommitConflictException(
          s"table changed during merge at $location")
      // positions into merged-away files are dead — rebuild the set
      val posDels = reused.filter(_.content == 1).flatMap(_.entries)
      val (reusedRefs, newDels) =
        if (affected.isEmpty || posDels.isEmpty) (reused, Seq.empty)
        else (reused.filterNot(_.content == 1),
          rebuildPosDeletes(posDels, affected.map(_.path).toSet,
            schema.schemaId))
      (reusedRefs, PendingAdds(carried ++ newDels, rewritten.shards),
        Map("merged-files" -> affected.size.toString))
    })
    } finally srcCached.unpersist(false)
  }

  /** Intra-partition bin-pack compaction: ONLY partitions holding ≥2
    * undersized files (< targetFileBytes) get those files merged;
    * right-sized files keep their original paths and their manifests are
    * reused untouched. At 100 TB a hot-partition compaction rewrites the
    * small-file tail, not terabytes of already-healthy data. Positions in
    * delete files that referenced a rewritten file are dropped (those
    * rows were applied during the rewrite); other delete files survive.
    */
  /** METADATA-ONLY manifest consolidation: rewrite the current snapshot's
    * many small manifests (one-plus per commit — after 10k appends,
    * planning reads 10k files) into few entry-count-sized ones. No data
    * file moves; per-entry snapshot/sequence ids are MATERIALIZED from
    * their inherited values, so incremental reads and delete sequencing
    * are byte-for-byte unaffected. The rewrite itself is a Spark job
    * over the manifest dataset (executors serialize the consolidated
    * shards; the driver sees only rollup counts) — consolidating a
    * million-file table's metadata never loads it on the driver.
    * Content types keep separate manifests (the read path locates delete
    * files from O(refs) metadata alone). Prior snapshots still reference
    * the old manifest files untouched — time travel is unaffected, and
    * expireSnapshots reclaims them once unreferenced.
    */
  def rewriteManifests(targetEntriesPerManifest: Long = 250000L)
      : SnapshotV2 =
    retryingCommit(() => {
      val meta = metadata
      val refs = manifestsFor(meta, None)
      val byContent = refs.groupBy(_.content)
      // already consolidated: one manifest per present content type
      if (byContent.values.forall(_.size <= 1))
        meta.currentSnapshot.getOrElse(
          throw new IllegalStateException("empty table"))
      else {
      val writeId = java.util.UUID.randomUUID.toString.take(8)
      val allShards = byContent.toSeq.sortBy(_._1).flatMap { case (ct, rs) =>
        val entriesN = rs.map(_.entryCount).sum
        if (entriesN == 0L) Seq.empty
        else {
          val nOut = math.max(1, math.ceil(
            entriesN.toDouble / targetEntriesPerManifest).toInt)
          val dir = metaDir.resolve(s"manifest-shards-rw-$writeId-c$ct")
          Files.createDirectories(dir)
          val dirStr = dir.toString
          val serConf = new SerConf(spark.sparkContext.hadoopConfiguration)
          // same fused shape as the commit path: each task writes its
          // own shard and returns one rollup line — no read-back job
          val lines = manifestDfForRefs(rs).drop(SrcManifestCol)
            .coalesce(nOut)
            .mapPartitions { it =>
              GraftTable.shardRollup(
                it.map(GraftTable.manifestRowToEntry), dirStr,
                serConf.value)
            }(org.apache.spark.sql.Encoders.STRING)
            .collect().toSeq
          val refs = GraftTable.parseRollups(lines)
          sweepOrphanShards(dir, refs)
          refs.map(_.copy(content = ct))
        }
      }
      commitSnapshot("replace", { fresh =>
        // rebase-unsafe: the consolidated shards snapshot THIS metadata
        // version's entries — a concurrent commit means re-derive
        if (fresh.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during rewriteManifests at $location")
        (Seq.empty, PendingAdds(Seq.empty, allShards),
          Map("rewritten-manifests" -> refs.size.toString,
            "consolidated-manifests" -> allShards.size.toString))
      })
      }
    })

  def compactBinPack(targetFileBytes: Long = 64L << 20): SnapshotV2 =
    // conflicts REBASE: the whole derivation re-runs against fresh state
    // with jittered backoff — a benign concurrent append must not abort
    // compaction (it used to surface a bare CommitConflictException)
    retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      val refs = manifestsFor(meta, None)
      // (path, schemaId, seq, size) of undersized files in partitions
      // holding ≥2 of them, plus their source-manifest paths. Distributed
      // above the planning threshold (a window count over the manifest
      // dataset); only the small-file tail reaches the driver —
      // O(affected), like every other mutation.
      val (small, affectedSrcs) =
        if (refs.map(_.entryCount).sum >= distributedPlanningThreshold) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(canonPartitionCol)
          val rows = manifestDfForRefs(refs)
            .filter(coalesce(col("content"), lit(0)) === 0)
            .filter(col("file-size") > 0L &&
              col("file-size") < targetFileBytes)
            .withColumn("__n", count(lit(1)).over(w))
            .filter(col("__n") >= 2)
            .select(col("path"), col("schema-id"), col("sequence-number"),
              col("file-size"), col(SrcManifestCol), col("first-row-id"),
              coalesce(col("format"), lit(DataFileEntry.Parquet)))
            .collect().toSeq
          (rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2),
              r.getLong(3),
              if (r.isNullAt(5)) None else Some(r.getLong(5)),
              r.getString(6))),
            rows.map(r => canonPath(decodePath(r.getString(4)))).toSet)
        } else {
          val loaded = refs.map(r => (r, r.entries))
          val srcByPath = loaded.flatMap { case (r, es) =>
            es.filter(_.isData).map(e => e.path -> r.path) }.toMap
          val under = loaded.flatMap(_._2).filter(_.isData)
            .groupBy(_.partition).values.flatMap { es =>
              val u = es.filter(e => e.fileSize > 0L &&
                e.fileSize < targetFileBytes)
              if (u.size >= 2) u else Seq.empty
            }.toSeq
          (under.map(e => (e.path, e.schemaId, e.sequenceNumber, e.fileSize,
              e.firstRowId, e.format)),
            under.map(e => canonPath(srcByPath(e.path))).toSet)
        }
      if (small.isEmpty)
        meta.currentSnapshot.getOrElse(
          throw new IllegalStateException("empty table"))
      else {
        val rewrittenPaths = small.map(_._1).toSet
        // the rewrite must actually PACK: without an explicit layout the
        // read keeps one split per input file and writes it straight back
        // out. Partitioned tables cluster on partition values (one file
        // per value); unpartitioned ones coalesce to ceil(bytes/target).
        val applied =
          if (lineageEnabled(meta))
            lineageReadFor(meta,
              small.map(s => (s._1, s._2, s._3, s._5)), schema)
          else readDeletesApplied(meta,
            small.map(s => (s._1, s._2, s._3)), schema, None,
            formatOf = small.collect {
              case t if t._6 != DataFileEntry.Parquet => t._1 -> t._6
            }.toMap)
        val rewritten =
          if (meta.defaultSpec.fields.nonEmpty)
            writeFiles(applied, repartitionByPartition = true)
          else {
            val outFiles = math.max(1, math.ceil(
              small.map(_._4).sum.toDouble / targetFileBytes).toInt)
            writeFiles(applied.coalesce(outFiles))
          }
        // delete files referencing a rewritten path hold dead positions
        // (the rewrite applied them); filter delete sets down, keep rest
        val newDeleteEntries = rebuildPosDeletes(
          refs.filter(_.content == 1).flatMap(_.entries),
          rewrittenPaths, schema.schemaId)
        commitSnapshot("replace", { freshMeta =>
          if (freshMeta.currentSnapshotId != meta.currentSnapshotId)
            throw new CommitConflictException(
              s"table changed during compactBinPack at $location")
          // manifests holding only untouched data files are reused;
          // delete manifests were rebuilt above, rewritten entries dropped
          val (affected, reusedRefs) = refs.partition(r =>
            r.content == 1 || affectedSrcs.contains(canonPath(r.path)))
          val carried = affected.filterNot(_.content == 1)
            .flatMap(_.entries).filter(e =>
              e.isData && !rewrittenPaths.contains(e.path))
          (reusedRefs,
            PendingAdds(carried ++ newDeleteEntries, rewritten.shards),
            Map("binpacked-files" -> small.size.toString))
        })
      }
    })

  /** Materialize live equality deletes as position deletes. Equality
    * deletes are the cheapest to WRITE (O(keys), no data read) but the
    * most expensive to READ — every scan runs a sequence-scoped
    * anti-join per column-set, and metadata-only COUNT/MIN/MAX refuse
    * while any are live. This maintenance pass resolves each doomed row
    * to its (file, position) once — under the exact scan semantics
    * (position deletes applied first, then the sequence-scoped key
    * match) — commits the positions, and drops the equality manifests.
    * Data files untouched; metadata-only counts work again afterward.
    * Candidate files are those with sequence below the newest equality
    * delete (older deletes cannot touch newer rows).
    */
  def convertEqualityDeletes(): SnapshotV2 = retryingCommit(() => {
    val meta = metadata
    val refs = manifestsFor(meta, None)
    val eqDels = refs.filter(_.content == 2).flatMap(_.entries)
      .filter(_.content == 2)
    if (eqDels.isEmpty)
      meta.currentSnapshot.getOrElse(
        throw new IllegalStateException("empty table"))
    else {
      val schema = meta.currentSchema
      val maxEq = eqDels.map(_.sequenceNumber).max
      // threshold-dispatched planning with the eq-scope sequence bound
      // pushed INTO the (possibly distributed) manifest filter — only
      // candidate rows reach the driver
      val files = plannedConnectorFiles(None, None,
          seqRange = Some((0L, maxEq - 1)))
        .map(f => (f.path, f.schemaId, f.sequenceNumber))
      val newEntries: Seq[DataFileEntry] =
        if (files.isEmpty) Seq.empty
        else {
          val writeId = java.util.UUID.randomUUID.toString.take(8)
          val delDir = s"$location/deletes/$writeId"
          val posDels = posDeleteEntriesFor(meta, None)
          val base = files.groupBy(_._3).map { case (seq, fs) =>
            val ann = readAlignedFilesFor(meta,
              fs.map(f => (f._1, f._2)), schema, withPos = true)
            (if (posDels.isEmpty) ann else applyDeletes(ann, posDels))
              .withColumn(SeqCol, lit(seq))
          }.reduce(_.unionByName(_))
          GraftTable.eqDeleteMatchesCore(spark, base, eqDels)
            .select(col(PosPathCol).as("file_path"),
              col(PosIdxCol).as("pos"))
            .distinct()
            .write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
          footerCounts(delDir).map { case (p, n) =>
            DataFileEntry(p, n, PendingSnapshot, 0L, schema.schemaId,
              Map.empty, Map.empty, content = 1) }
        }
      commitSnapshot("replace", fresh => {
        if (fresh.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during convertEqualityDeletes at $location")
        (manifestsFor(fresh, None).filterNot(_.content == 2),
          PendingAdds(newEntries, Seq.empty),
          Map("converted-equality-files" -> eqDels.size.toString,
            "materialized-positions" ->
              newEntries.map(_.recordCount).sum.toString))
      })
    }
  })

  /** Consolidate position-delete files. A long merge-on-read history
    * accumulates one small delete file per commit and EVERY scan opens
    * all of them; this delete-only rewrite unions the live position
    * deletes into ~targetRows-sized files (data files and data
    * manifests untouched — equality-delete manifests reused verbatim).
    * Positions name exact data-file paths, which are unique, so merging
    * across commit sequences cannot change which rows are deleted; the
    * distinct() guard keeps the metadata-only count exact even if a
    * duplicated position ever slipped in. Commits op=replace, so — like
    * compaction — changelog ranges crossing it refuse loudly.
    */
  def rewritePositionDeletes(targetRows: Long = 1L << 22): SnapshotV2 =
    retryingCommit(() => {
      val meta = metadata
      val refs = manifestsFor(meta, None)
      val allPos = refs.filter(_.content == 1).flatMap(_.entries)
        .filter(_.content == 1)
      // deletion vectors are already one-per-data-file — nothing to
      // consolidate; carry them and rewrite only the parquet form
      val (dvEntries, posEntries) = allPos.partition(_.dv.isDefined)
      if (posEntries.size <= 1)
        meta.currentSnapshot.getOrElse(
          throw new IllegalStateException("empty table"))
      else {
        val schema = meta.currentSchema
        val writeId = java.util.UUID.randomUUID.toString.take(8)
        val delDir = s"$location/deletes/$writeId"
        val delSchema = StructType(Seq(SparkField("file_path", StringType),
          SparkField("pos", LongType)))
        val total = posEntries.map(_.recordCount).sum
        val outFiles = math.max(1,
          math.ceil(total.toDouble / targetRows).toInt)
        // sorted by (file, pos): the scan-side per-file anti-join reads
        // tight clustered ranges instead of scattering over every file
        spark.read.schema(delSchema).parquet(posEntries.map(_.path): _*)
          .distinct().repartitionByRange(outFiles, col("file_path"))
          .sortWithinPartitions("file_path", "pos")
          .write.mode("errorifexists").option(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(delDir)
        val newEntries = footerCounts(delDir).map { case (p, n) =>
          DataFileEntry(p, n, PendingSnapshot, 0L, schema.schemaId,
            Map.empty, Map.empty, content = 1) }
        commitSnapshot("replace", fresh => {
          if (fresh.currentSnapshotId != meta.currentSnapshotId)
            throw new CommitConflictException(
              s"table changed during rewritePositionDeletes at $location")
          (manifestsFor(fresh, None).filterNot(_.content == 1),
            PendingAdds(dvEntries ++ newEntries, Seq.empty),
            Map("consolidated-delete-files" -> posEntries.size.toString))
        })
      }
    })

  /** Full rewrite: one file per partition value (op=replace). With
    * `sortWithin`, rows are clustered within each rewritten file (the
    * sort / z-order strategies of rewrite_data_files — pass a plain
    * column list or one z-order interleave column); scan-relevant
    * min/max stats tighten accordingly. Conflicts rebase: the rewrite
    * re-derives against fresh state like compactBinPack.
    */
  def compact(sortWithin: Seq[Column] = Seq.empty): SnapshotV2 = {
    val snap = retryingCommit(() => {
      val meta = metadata
      val schema = meta.currentSchema
      // deletes-applied read; the replace commit reuses no manifests, so
      // absorbed position-delete files drop out of the table here. On
      // lineage tables the read materializes _row_id columns into the
      // rewrite, so compaction preserves row identity.
      val df = readAppliedForRewrite(meta,
        manifestsFor(meta, None).flatMap(_.entries).filter(_.isData), schema)
      val partNames = meta.defaultSpec.fields.map(_.name)
      val rewritten =
        if (partNames.nonEmpty)
          writeFiles(df, sortWithin, repartitionByPartition = true)
        else writeFiles(df.coalesce(1), sortWithin)
      commitSnapshot("replace", { freshMeta =>
        // currentSnapshotId moves on BOTH data commits and rollbacks
        // (lastSequenceNumber would miss a racing rollback)
        if (freshMeta.currentSnapshotId != meta.currentSnapshotId)
          throw new CommitConflictException(
            s"table changed during compact at $location")
        (Seq.empty, rewritten, Map.empty)
      }, invalidateSortClaim = sortWithin.nonEmpty &&
        !sortsMatchDefault(meta, sortWithin))
    })
    // the full rewrite replaced every live data file with parquet — once
    // no RETAINED snapshot references avro either (time travel must keep
    // bridging until then), restore the vectorized DSv2 path
    clearAvroFlagIfMigrated()
    snap
  }

  /** Drop [[GraftTable.HasAvroProp]] when NO retained snapshot
    * references an avro data file anymore — after a full compact() has
    * replaced the live set AND expiry has dropped the pre-migration
    * snapshots (a time-travel read of those must keep routing through
    * the bridge). Checked only on flagged tables, with the usual
    * threshold dispatch; called from compact() and snapshot expiry.
    */
  /** True when the table property marks adopted-avro data files. The
    * ONE probe shared by the scan-builder bridge decision, the stream's
    * staging decision, and the maintenance clear — they must never
    * desynchronize.
    */
  private[graft] def hasAvroFlag: Boolean = metadata.properties
    .exists(_.get(GraftTable.HasAvroProp).contains("true"))

  private def clearAvroFlagIfMigrated(): Unit =
    // NOTHING may escape: this is a pure optimization running after a
    // maintenance op has already COMMITTED — a probe/clear failure must
    // neither fail nor re-run the succeeded op. Leaving the flag set is
    // conservative-correct (the bridge reads everything; the next
    // maintenance call retries).
    try {
      // ONE metadata read for the flag check, the format check, and the
      // ref walk — three separate loads could observe three snapshots
      val meta = metadata
      val props = meta.properties.getOrElse(Map.empty)
      if (!props.get(GraftTable.HasAvroProp).contains("true")) return
      // an avro-DEFAULT table never clears: future writes are avro
      // anyway, and clearing here would race an in-flight avro append
      // (its files are in no snapshot yet, so the probe below cannot
      // see them; the append stamped the flag BEFORE writing and must
      // not have it yanked between stamp and commit)
      if (props.get(GraftTable.WriteFormatProp)
          .contains(DataFileEntry.Avro)) return
      val refs = allRefsOf(meta)
      val stillAvro =
        if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
          !manifestDfForRefs(refs)
            .filter(coalesce(col("content"), lit(0)) === 0 &&
              col("format") === DataFileEntry.Avro)
            .isEmpty
        else refs.exists(_.entries.exists(e =>
          e.isData && e.format == DataFileEntry.Avro))
      if (!stillAvro)
        updateProperties(Map(GraftTable.HasAvroProp -> None))
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Incremental re-cluster: rewrite the live data files as a SERIES of
    * per-file-group `replace` commits, each bounded by `maxGroupBytes` —
    * the 100 TB shape of sort/zorder compaction. The whole-table
    * [[compact]] holds one commit open for the entire rewrite and
    * conflicts with EVERY concurrent commit; here each group lands as it
    * finishes and REBASES over concurrent traffic:
    *   - concurrent APPENDS never conflict (their manifests are reused
    *     verbatim by the manifest split);
    *   - a concurrent rewrite/delete of a group's own files re-derives
    *     that group against fresh metadata (retryingCommit), and a group
    *     whose files are no longer live is skipped — the work moved;
    *   - a concurrent MoR delete committed between a group's read and
    *     its commit forces a re-derive (the rewrite would resurrect the
    *     freshly deleted rows otherwise).
    * Returns the committed replace snapshots (empty groups skipped).
    */
  def compactIncremental(sortWithin: Seq[Column] = Seq.empty,
      maxGroupBytes: Long = 512L << 20): Seq[SnapshotV2] = {
    val entries0 = manifestsFor(metadata, None).flatMap(_.entries)
      .filter(_.isData)
      .sortBy(e => (canonPartition(e.partition), e.path))
    // greedy byte-bounded grouping (≥1 file per group)
    val groups = entries0.foldLeft(List.empty[(Seq[DataFileEntry], Long)]) {
      case (acc, e) =>
        val sz = math.max(e.fileSize, 1L)
        acc match {
          case (g, bytes) :: t if bytes + sz <= maxGroupBytes =>
            (g :+ e, bytes + sz) :: t
          case _ => (Seq(e), sz) :: acc
        }
    }.reverse.map(_._1)
    groups.flatMap { group =>
      val paths = group.map(_.path).toSet
      val skipped = new java.util.concurrent.atomic.AtomicBoolean(false)
      val snap = retryingCommit(() => {
        val meta = metadata
        val seqAtRead = meta.lastSequenceNumber
        val liveNow = manifestsFor(meta, None).flatMap(_.entries)
          .filter(e => e.isData && paths.contains(e.path))
        if (liveNow.isEmpty) {
          // the group's files were already rewritten/deleted — the work
          // moved out from under us; nothing left to re-cluster here
          skipped.set(true)
          meta.currentSnapshot.getOrElse(
            throw new IllegalStateException("empty table mid-compact"))
        } else {
          val schema = meta.currentSchema
          val rewritten = writeFiles(
            readAppliedForRewrite(meta, liveNow, schema), sortWithin)
          val livePaths = liveNow.map(_.path).toSet
          commitSnapshot("replace", { fresh =>
            val hit = (e: DataFileEntry) => e.isData &&
              paths.contains(e.path)
            val hitCol = col("path").isin(paths.toSeq: _*)
            val (reused, _, affected) = splitManifests(fresh, hitCol, hit)
            val mine = affected.filter(hit)
            if (mine.map(_.path).toSet != livePaths)
              throw new CommitConflictException(
                "group files changed during re-cluster")
            // any delete committed after our read may address group rows
            // the rewrite just resurrected — re-derive
            val newDeletes = manifestsFor(fresh, None).filter(r =>
              r.content != 0 &&
                r.addedSequenceNumber.exists(_ > seqAtRead))
            if (newDeletes.nonEmpty)
              throw new CommitConflictException(
                "deletes landed during re-cluster group rewrite")
            val carried = affected.filterNot(hit)
            // position deletes referencing the rewritten files are dead
            val posDels = reused.filter(_.content == 1).flatMap(_.entries)
            val (reusedRefs, newDels) =
              if (posDels.isEmpty) (reused, Seq.empty)
              else (reused.filterNot(_.content == 1),
                rebuildPosDeletes(posDels, paths, schema.schemaId))
            (reusedRefs, PendingAdds(carried ++ newDels, rewritten.shards),
              Map("compaction-group-files" -> mine.size.toString))
          }, invalidateSortClaim = sortWithin.nonEmpty &&
            !sortsMatchDefault(meta, sortWithin))
        }
      })
      if (skipped.get) None else Some(snap)
    }
  }

  // ---------------------------------------------------- schema evolution ----

  private def evolveSchema(f: SchemaV2 => SchemaV2): Unit =
    evolveSchemaAlloc((s, last) => (f(s), last))

  /** Schema evolution with field-id allocation REBASED per attempt: the
    * change function receives the FRESH metadata's lastColumnId on every
    * retry and returns the new schema plus the new lastColumnId. Ids must
    * derive from that argument — precomputing them outside the closure
    * would re-apply stale ids after a version-claim conflict, letting two
    * concurrent addColumn calls commit two columns sharing one field id
    * (field-id-based file alignment then silently reads the wrong
    * column's data).
    */
  private def evolveSchemaAlloc(
      f: (SchemaV2, Int) => (SchemaV2, Int)): Unit = retryingMetadata { meta =>
    val cur = meta.currentSchema
    val (changed, newLastColumnId) = f(cur, meta.lastColumnId)
    require(newLastColumnId >= meta.lastColumnId,
      "schema evolution may not shrink lastColumnId")
    val next = changed.copy(schemaId = cur.schemaId + 1)
    // name-mapping: every historical name of a field id keeps resolving
    val names = (meta.schemas :+ next).flatMap(_.fields)
      .groupBy(_.id).map { case (id, fs) =>
        NameMapping(Some(id), fs.map(_.name).distinct)
      }.toSeq.sortBy(_.fieldId)
    val mapped = next.copy(nameMapping = Some(NameMappings(names)))
    meta.copy(
      schemas = meta.schemas :+ mapped,
      currentSchemaId = mapped.schemaId,
      lastColumnId = newLastColumnId,
      lastUpdatedMs = System.currentTimeMillis)
  }

  /** Rename a column; field id is stable so existing files keep working.
    * `from` may be a dotted path into a struct ("info.status"); `to` is
    * then the new LEAF name — evolution happens in place, inside the
    * struct (reference schema.rs models nested fields as first-class).
    */
  def renameColumn(from: String, to: String): Unit =
    evolveSchema { s =>
      require(s.fieldByName(from).isDefined, s"no column $from")
      require(!to.contains('.'), "rename target is a leaf name")
      val parts = from.split('.').toList
      def ren(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil =>
            require(!fs.exists(_.name == to), s"column $to already exists")
            fs.map(f => if (f.name == leaf) f.copy(name = to) else f)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            // a literal dotted COLUMN name resolves via fieldByName but
            // is not a path — fail usably instead of fs(-1)
            require(i >= 0, s"no struct $p on path $from")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(ren(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      s.copy(fields = ren(s.fields, parts))
    }

  /** Promote a column's type in place — the Iceberg spec's third schema
    * evolution primitive after add/rename/drop (spec "Schema Evolution":
    * legal primitive promotions are `int -> long`, `float -> double`,
    * and `decimal(P,S) -> decimal(P',S)` with P' > P; the promotable
    * primitives are exactly the reference's schema.rs:16-28 set). The
    * field id is stable, so files written under the old type keep
    * reading: the scan aligns them to the promoted type (an exact
    * widening cast — no value can change), and stats pruning already
    * compares bounds in the decoded numeric domain, so old files' int
    * bounds prune correctly against long predicates. `name` may be a
    * dotted path into a struct.
    */
  def promoteColumn(name: String, to: DataType): Unit =
    evolveSchema { s =>
      val f = s.fieldByName(name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
      val toIce = toIceType(to)
      val legal = (f.fieldType, toIce) match {
        case (TInt, TLong) | (TFloat, TDouble) => true
        case (TDecimal(p, sc), TDecimal(p2, sc2)) => sc2 == sc && p2 > p
        case _ => false
      }
      require(legal,
        s"illegal type promotion for $name: ${f.fieldType.toJson} -> " +
          s"${toIce.toJson} (legal: int->long, float->double, " +
          "decimal(P,S)->decimal(P',S) with P'>P)")
      // defaults are stored in the spec string rendering, which reads
      // back identically under the widened type — keep them as-is
      val parts = name.split('.').toList
      def promote(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil =>
            fs.map(x => if (x.name == leaf) x.copy(fieldType = toIce) else x)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            // a literal dotted COLUMN name resolves via fieldByName but
            // is not a path — fail usably instead of fs(-1)
            require(i >= 0, s"no struct $p on path $name")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(promote(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      s.copy(fields = promote(s.fields, parts))
    }

  /** Add an optional column with fresh field ids; old files read null.
    * `dataType` may be nested (struct/list/map — every nested element
    * gets its own id), and `name` may be a dotted path targeting a
    * struct ("info.discount" adds `discount` INSIDE `info` — old files'
    * structs surface null for it, by field-id alignment).
    */
  def addColumn(name: String, dataType: DataType): Unit =
    addColumn(name, dataType, None, None)

  /** Add a column WITH v3 defaults: `initialDefault` (spec
    * `initial-default`) is what rows written before this evolution read
    * back — the metadata-only answer to "backfill this column" at any
    * table size; `writeDefault` fills future writes that omit the
    * column. Values use the spec's string rendering for the column
    * type; defaults are limited to primitive columns.
    */
  def addColumn(name: String, dataType: DataType,
      initialDefault: Option[String],
      writeDefault: Option[String]): Unit = {
    if (initialDefault.isDefined || writeDefault.isDefined) {
      require(dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }, s"column $name: defaults are limited to primitive columns")
      // validate the rendering NOW: an unparseable default would
      // otherwise surface as a bare NumberFormatException from inside
      // metadata serialization, with no hint which column caused it
      (initialDefault.toSeq ++ writeDefault.toSeq).foreach { v =>
        val ok =
          try {
            dataType match {
              case IntegerType => v.toInt; case LongType => v.toLong
              case FloatType => v.toFloat; case DoubleType => v.toDouble
              case BooleanType => v.toBoolean
              case DateType => java.time.LocalDate.parse(v)
              case _ => ()
            }
            true
          } catch { case _: RuntimeException | _: java.time.DateTimeException =>
            false }
        require(ok,
          s"column $name: default '$v' does not parse as $dataType")
      }
    }
    val parts = name.split('.').toList
    // id allocation lives INSIDE the change function: on a version-claim
    // conflict the retry rebases onto fresh metadata, and ids must be
    // re-derived from ITS lastColumnId — a concurrent addColumn may have
    // consumed the ones this attempt computed
    evolveSchemaAlloc { (s, lastColumnId) =>
      require(s.fieldByName(name).isEmpty, s"column $name already exists")
      var nextId = lastColumnId
      def alloc(): Int = { nextId += 1; nextId }
      def conv(dt: DataType): IceType = dt match {
        case st: StructType => TStruct(st.fields.toSeq.map(f =>
          StructField(alloc(), f.name, !f.nullable, conv(f.dataType))))
        case ArrayType(et, cn) => TList(alloc(), !cn, conv(et))
        case MapType(kt, vt, vn) =>
          TMap(alloc(), conv(kt), alloc(), !vn, conv(vt))
        case other => toIceType(other)
      }
      val fieldId = alloc()
      val iceType = conv(dataType)
      def add(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil =>
            fs :+ StructField(fieldId, leaf, required = false, iceType,
              initialDefault = initialDefault,
              writeDefault = writeDefault)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            require(i >= 0, s"no struct $p on path $name")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(add(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      (s.copy(fields = add(s.fields, parts)), nextId)
    }
  }

  /** Drop a column (metadata-only; data files retain the bytes). Columns
    * referenced by a partition spec or sort order cannot be dropped — the
    * table would be permanently unable to write.
    */
  /** Metadata-only property update: set the given keys, remove the keys
    * mapped to None. Atomic via the same version-claim as every commit.
    */
  def updateProperties(changes: Map[String, Option[String]]): Unit =
    retryingMetadata { meta =>
      // lineage cannot be turned on after rows exist: they have no ids,
      // and every lineage read/rewrite from then on would be meaningless
      if (changes.get(GraftTable.RowLineageProp)
          .exists(_.contains("true")) && !lineageEnabled(meta) &&
          meta.currentSnapshot.exists(
            _.summary.other.get("total-records").exists(_.toLong > 0L)))
        throw new IllegalArgumentException(
          s"cannot enable ${GraftTable.RowLineageProp} on $location: the " +
            "table already holds rows, which have no lineage ids")
      val cur = meta.properties.getOrElse(Map.empty)
      val next = changes.foldLeft(cur) {
        case (m, (k, Some(v))) => m + (k -> v)
        case (m, (k, None)) => m - k
      }
      meta.copy(
        properties = if (next.isEmpty) None else Some(next),
        lastUpdatedMs = System.currentTimeMillis)
    }

  /** Replace the default write sort order (metadata-only). Subsequent
    * writes cluster rows within files on the new order — tightening
    * min/max stats for scan pruning — while existing files keep their
    * layout (re-cluster them via compact with a sort strategy). Empty
    * fields reset to unsorted. Mirrors sort.rs:36-52 SortOrder
    * evolution: orders are append-only, the default id moves.
    */
  def replaceSortOrder(fields: Seq[(String, Transform)]): Unit =
      retryingMetadata { meta =>
    val schema = meta.currentSchema
    val order =
      if (fields.isEmpty) SortOrder.unsorted
      // maxOption: metadata deserialized from a file without the
      // sort-orders key carries an EMPTY list (the unsorted default only
      // applies at construction) — allocate from 0 instead of crashing
      else SortOrder(meta.sortOrders.map(_.orderId).maxOption.getOrElse(0) + 1,
        fields.map { case (src, t) =>
          val f = schema.fieldByName(src).getOrElse(
            throw new IllegalArgumentException(s"no column $src"))
          SortField(f.id, t, SortAsc, NullsFirst)
        })
    // record WHEN the new default took effect: every data file whose
    // sequence number is above this watermark was written (or
    // rewritten) under the order — writeFiles applies the default sort
    // on every append/rewrite — so the connector can honestly report
    // per-partition output ordering for fully-post-watermark scans
    val props = meta.properties.getOrElse(Map.empty)
    val nextProps =
      if (order.orderId == 0) props - GraftTable.SortSinceSeqProp
      else props +
        (GraftTable.SortSinceSeqProp -> meta.lastSequenceNumber.toString)
    meta.copy(
      sortOrders =
        if (order.orderId == 0) meta.sortOrders
        else meta.sortOrders :+ order,
      defaultSortOrderId = order.orderId.toLong,
      properties = if (nextProps.isEmpty) None else Some(nextProps),
      lastUpdatedMs = System.currentTimeMillis)
  }

  /** ANALYZE: compute per-column NDV sketches + exact rollups in ONE
    * distributed aggregate over the current snapshot (deletes applied),
    * write them to a puffin-style stats sidecar, and reference it from
    * metadata's `statistics` list keyed by snapshot id. Join planning
    * reads these through the connector's reported column statistics —
    * see [[Stats]] for the scale rationale. Driver memory is
    * O(columns × sketch), never O(rows).
    */
  def analyze(columns: Seq[String] = Seq.empty)
      : graft.model.StatisticsFileRef = {
    val meta0 = metadata
    val sid = meta0.currentSnapshotId.getOrElse(throw new IllegalStateException(
      s"no snapshot to analyze at $location"))
    // pin the snapshot: a concurrent commit must not shift what the
    // stats describe out from under the recorded snapshot id
    val df = scan(asOf = Some(sid))
    val all = df.schema.fields.filter(f => Stats.eligible(f.dataType)).toSeq
    val targets =
      if (columns.isEmpty) all
      else columns.map(c => all.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no analyzable column $c")))
    require(targets.nonEmpty, "no analyzable columns")
    val exprs = Stats.aggExprs(targets)
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val entries = Stats.entriesFromRow(row, targets)
    val seq = meta0.snapshotById(sid).map(_.sequenceNumber).getOrElse(0L)
    val fieldIds = meta0.currentSchema.fields.map(f => f.name -> f.id).toMap
    val ref = Stats.writeFile(Paths.get(location, "stats"), sid, seq,
      row.getAs[Long]("cnt"), entries, fieldIds)
    // metadata-only commit; re-derive against fresh state on conflict
    var attempts = 0
    while (true) {
      attempts += 1
      val (v, meta) = metadataWithVersion
      val kept = meta.statistics.getOrElse(Seq.empty)
        .filterNot(_.snapshotId == sid)
      try {
        writeMetadataAt(meta.copy(statistics = Some(kept :+ ref),
          lastUpdatedMs = System.currentTimeMillis), (v, meta))
        return ref
      } catch {
        case _: CommitConflictException if attempts < 20 =>
          Thread.sleep(5L * attempts + scala.util.Random.nextInt(25))
      }
    }
    ref
  }

  /** Write a PARTITION STATISTICS file for the current snapshot (the
    * public Iceberg v3 `partition-statistics` artifact): one row per
    * partition with the spec's field names — a typed unified partition
    * tuple, spec_id, data record/file counts, total data size, and the
    * last-updating snapshot — computed as ONE distributed aggregate
    * over the manifest dataset (at 100 TB the manifest is big data;
    * no driver loop) and registered in table metadata. Position-delete
    * attribution (DVs + parquet position deletes) is computed by
    * joining delete rows to their referenced files' partition tuples;
    * equality-delete attribution is exact when the delete keys cover
    * the spec's source columns (transforms applied to the key values)
    * and NULL otherwise (see equalityDeleteAttribution).
    */
  def writePartitionStats(): graft.model.StatisticsFileRef = {
    val meta = metadata
    val sid = meta.currentSnapshotId.getOrElse(
      throw new IllegalStateException(s"no snapshot at $location"))
    val schema = meta.currentSchema
    // unified tuple: every partition field of every spec, typed like
    // the manifest export types them (int-valued transforms → int,
    // long/time sources → long, date identity → date, else string)
    val pfields = meta.partitionSpecs.flatMap(_.fields)
      .groupBy(_.name).toSeq.sortBy(_._1).map(_._2.head)
    val tupleCols = pfields.map { pf =>
      val v = col("partition")(pf.name)
      (pf.transform match {
        case TBucket(_) | TYear | TMonth | TDay | THour => v.cast("int")
        case TVoid => v
        case TIdentity | TTruncate(_) =>
          schema.fieldById(pf.sourceId).map(_.fieldType) match {
            case Some(TInt) => v.cast("int")
            case Some(TLong) | Some(TTime) => v.cast("long")
            case Some(TDate) => to_date(v)
            case _ => v
          }
      }).as(pf.name)
    }
    val base = manifestDf(None)
      .filter(coalesce(col("content"), lit(0)) === 0)
      .select(
        (if (tupleCols.isEmpty) struct(lit(0).as("unpartitioned"))
        else struct(tupleCols: _*)).as("partition"),
        GraftTable.partitionKeyCol(col("partition")).as("__pkey"),
        coalesce(col("spec-id"), lit(0)).as("spec_id"),
        col("record-count").as("rc"),
        coalesce(col("file-size"), lit(0L)).as("fs"),
        col("snapshot-id").as("snap"),
        GraftTable.decodeCanonCol(col("path")).as("__dfile"))
    // __pkey rides along as the attribution join key (the typed tuple
    // and the injective JSON form are 1:1 — both derive from the map)
    val agg = base.groupBy("partition", "spec_id", "__pkey")
      .agg(
        sum("rc").as("data_record_count"),
        count(lit(1)).cast("int").as("data_file_count"),
        sum("fs").as("total_data_file_size_in_bytes"),
        max("snap").as("last_updated_snapshot_id"))
    // spec position_delete_* / equality_delete_* attribution: pos-delete
    // rows joined to their referenced data files' partition tuples over
    // the manifest dataset; eq-delete rows attributed by applying the
    // spec transforms to their key values — spec-optional, but a MoR
    // table owner reading partition stats wants to see where deletes
    // concentrate
    val rows = withDeleteAttribution(agg, base)
      .drop("__pkey").orderBy("partition")
    val target = writeSingleParquet(rows,
      Paths.get(location, "stats"), s"partition-stats-$sid")
    val ref = graft.model.StatisticsFileRef(sid, target.toString,
      Files.size(target))
    var attempts = 0
    while (true) {
      attempts += 1
      val (v, m) = metadataWithVersion
      val kept = m.partitionStatistics.getOrElse(Seq.empty)
        .filterNot(_.snapshotId == sid)
      try {
        writeMetadataAt(m.copy(partitionStatistics = Some(kept :+ ref),
          lastUpdatedMs = System.currentTimeMillis), (v, m))
        return ref
      } catch {
        case _: CommitConflictException if attempts < 20 =>
          Thread.sleep(5L * attempts + scala.util.Random.nextInt(25))
      }
    }
    ref
  }

  /** Column statistics for a read of `asOf` (default: current snapshot):
    * the stats file computed AT that snapshot, or at its nearest
    * ANCESTOR (appends since ANALYZE leave estimates useful; non-lineal
    * snapshots' stats never apply). Returns (ref, row-count, entries).
    */
  def columnStatistics(asOf: Option[Long] = None)
      : Option[(graft.model.StatisticsFileRef, Long, Seq[ColumnStatsEntry])] = {
    val meta = metadata
    val bySnap = meta.statistics.getOrElse(Seq.empty)
      .map(s => s.snapshotId -> s).toMap
    if (bySnap.isEmpty) return None
    var cur = asOf.orElse(meta.currentSnapshotId)
    while (cur.isDefined) {
      bySnap.get(cur.get) match {
        case Some(ref) if Files.exists(Paths.get(ref.path)) =>
          val (rows, entries) = Stats.readFile(ref.path)
          return Some((ref, rows, entries))
        case _ => cur = meta.snapshotById(cur.get).flatMap(_.parentSnapshotId)
      }
    }
    None
  }

  def dropColumn(name: String): Unit = {
    val meta = metadata
    val fid = meta.currentSchema.fieldByName(name).map(_.id)
    fid.foreach { id =>
      require(!meta.partitionSpecs.exists(_.fields.exists(_.sourceId == id)),
        s"column $name is referenced by a partition spec")
      require(!meta.sortOrders.exists(_.fields.exists(_.sourceId == id)),
        s"column $name is referenced by a sort order")
    }
    evolveSchema { s =>
      require(s.fieldByName(name).isDefined, s"no column $name")
      val parts = name.split('.').toList
      def drop(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil => fs.filterNot(_.name == leaf)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            // a literal dotted COLUMN name resolves via fieldByName but
            // is not a path — fail usably instead of fs(-1)
            require(i >= 0, s"no struct $p on path $name")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(drop(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      s.copy(fields = drop(s.fields, parts))
    }
  }

  /** Relax a column's nullability (required -> optional; dotted paths
    * descend into structs). The reverse is refused: declaring an
    * optional column required would assert a fact about already-written
    * rows no metadata commit can establish (Iceberg spec's rule).
    */
  def setColumnNullability(name: String, nullable: Boolean): Unit =
    evolveSchema { s =>
      val f = s.fieldByName(name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
      require(nullable || f.required,
        s"cannot make optional column $name required: existing rows " +
          "may hold nulls")
      val parts = name.split('.').toList
      def set(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil =>
            fs.map(x =>
              if (x.name == leaf) x.copy(required = !nullable) else x)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            // a literal dotted COLUMN name resolves via fieldByName but
            // is not a path — fail usably instead of fs(-1)
            require(i >= 0, s"no struct $p on path $name")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(set(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      s.copy(fields = set(s.fields, parts))
    }

  /** Change a column's `write-default` (v3): future writes omitting the
    * column fill with the new value; None clears it. `initial-default`
    * is immutable after creation — it defines what PRE-EXISTING rows
    * read, so changing it would rewrite history metadata-only.
    */
  def setWriteDefault(name: String, value: Option[String]): Unit =
    evolveSchema { s =>
      val f = s.fieldByName(name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
      require(f.fieldType match {
        case _: TStruct | _: TList | _: TMap => false
        case _ => true
      }, s"column $name: defaults are limited to primitive columns")
      value.foreach { v =>
        val ok =
          try {
            f.fieldType match {
              case TInt => v.toInt; case TLong => v.toLong
              case TFloat => v.toFloat; case TDouble => v.toDouble
              case TBoolean => v.toBoolean
              case TDate => java.time.LocalDate.parse(v)
              case _ => ()
            }
            true
          } catch {
            case _: RuntimeException | _: java.time.DateTimeException =>
              false
          }
        require(ok,
          s"column $name: default '$v' does not parse as ${f.fieldType}")
      }
      val parts = name.split('.').toList
      def set(fs: Seq[StructField], ps: List[String]): Seq[StructField] =
        ps match {
          case leaf :: Nil =>
            fs.map(x =>
              if (x.name == leaf) x.copy(writeDefault = value) else x)
          case p :: rest =>
            val i = fs.indexWhere(_.name == p)
            // a literal dotted COLUMN name resolves via fieldByName but
            // is not a path — fail usably instead of fs(-1)
            require(i >= 0, s"no struct $p on path $name")
            fs(i).fieldType match {
              case TStruct(nfs) => fs.updated(i,
                fs(i).copy(fieldType = TStruct(set(nfs, rest))))
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (got $other)")
            }
        }
      s.copy(fields = set(s.fields, parts))
    }

  /** Partition-spec evolution (metadata-only, like the reference's
    * plural `partition-specs` + `default-spec-id` at
    * /root/reference/src/model/table.rs:19): future writes derive
    * partition values under the NEW spec; existing files keep their
    * write-time spec (recorded per entry as `spec-id`) and scans prune
    * each file under the spec it was written with. Passing an empty list
    * un-partitions future writes. An identical existing spec is reused
    * instead of re-registered.
    */
  def evolvePartitionSpec(
      partitionBy: Seq[(String, Transform, String)]): Unit =
      retryingMetadata { meta =>
    val schema = meta.currentSchema
    partitionBy.foreach { case (_, _, name) =>
      require(schema.fieldByName(name).isEmpty,
        s"partition field name '$name' collides with a schema column")
    }
    var nextFieldId = meta.lastPartitionId
    val fields = partitionBy.map { case (src, t, name) =>
      val f = schema.fieldByName(src).getOrElse(
        throw new IllegalArgumentException(s"no column $src"))
      nextFieldId += 1
      PartitionField(f.id, nextFieldId, name, t)
    }
    val existing = meta.partitionSpecs.find(s =>
      s.fields.map(f => (f.sourceId, f.name, f.transform)) ==
        fields.map(f => (f.sourceId, f.name, f.transform)))
    val (spec, specs, lastPid) = existing match {
      case Some(s) => (s, meta.partitionSpecs, meta.lastPartitionId)
      case None =>
        val s = PartitionSpec(
          meta.partitionSpecs.map(_.specId).max + 1, fields)
        (s, meta.partitionSpecs :+ s, nextFieldId)
    }
    meta.copy(
      partitionSpecs = specs,
      defaultSpecId = spec.specId,
      lastPartitionId = lastPid,
      lastUpdatedMs = System.currentTimeMillis)
  }

  // ------------------------------------------------------- refs/expiry ----

  def createBranch(name: String, snapshotId: Long,
      retention: BranchRetention =
        BranchRetention(1, Long.MaxValue, Long.MaxValue)): Unit =
    retryingMetadata(meta =>
      meta.copy(refs = Some(meta.refs.getOrElse(Map.empty) +
        (name -> SnapshotRef(snapshotId, retention)))))

  def createTag(name: String, snapshotId: Long,
      maxRefAgeMs: Long = Long.MaxValue): Unit =
    retryingMetadata(meta =>
      meta.copy(refs = Some(meta.refs.getOrElse(Map.empty) +
        (name -> SnapshotRef(snapshotId, TagRetention(maxRefAgeMs))))))

  /** Append onto a BRANCH (write-audit-publish): the commit parents off
    * the branch head and moves only the branch ref — main readers never
    * see the staged rows until `fastForward` publishes them. Audit the
    * staged state via `scanRef(branch)`.
    */
  def appendToBranch(branch: String, df: DataFrame,
      sortWithin: Seq[Column] = Seq.empty,
      repartitionByPartition: Boolean = false): SnapshotV2 = {
    val adds = writeFiles(df, sortWithin, repartitionByPartition,
      lineageFresh = true)
    val nonDefaultSort = sortWithin.nonEmpty &&
      !sortsMatchDefault(metadata, sortWithin)
    retryingCommit(() => commitSnapshot("append", fresh => {
      val head = fresh.refs.flatMap(_.get(branch)).getOrElse(
        throw new IllegalArgumentException(s"no branch $branch")).snapshotId
      (manifestsFor(fresh, Some(head)), adds,
        Map("branch" -> branch))
    }, toBranch = Some(branch),
      invalidateSortClaim = nonDefaultSort))
  }

  /** Publish a branch: fast-forward main to the branch head. Requires
    * main's current snapshot to be an ANCESTOR of the branch head (the
    * branch must contain everything main has) — otherwise publishing
    * would silently drop main-only commits.
    */
  def fastForward(branch: String): Unit = {
    // retry on version conflicts like any commit: each attempt re-reads
    // metadata, so the ancestor check re-evaluates against fresh state
    var attempts = 0
    while (attempts < 20) {
      attempts += 1
      try return fastForwardOnce(branch)
      catch { case _: CommitConflictException if attempts < 20 =>
        Thread.sleep(5L * attempts + scala.util.Random.nextInt(25)) }
    }
  }

  private def fastForwardOnce(branch: String): Unit = {
    val (v, meta) = metadataWithVersion
    val head = meta.refs.flatMap(_.get(branch)).getOrElse(
      throw new IllegalArgumentException(s"no branch $branch")).snapshotId
    val ancestors = Iterator.iterate(Option(head))(cur => cur.flatMap(id =>
        meta.snapshotById(id).flatMap(_.parentSnapshotId)))
      .takeWhile(_.isDefined).map(_.get).toSet
    meta.currentSnapshotId.foreach(cur => require(ancestors.contains(cur),
      s"main ($cur) is not an ancestor of branch $branch ($head); " +
        "fast-forward would drop main-only commits"))
    val now = System.currentTimeMillis
    writeMetadataAt(meta.copy(
      currentSnapshotId = Some(head),
      snapshotLog = Some(meta.snapshotLog.getOrElse(Seq.empty) :+
        SnapshotLog(head, now)),
      refs = Some(meta.refs.getOrElse(Map.empty) +
        ("main" -> SnapshotRef(head,
          BranchRetention(1, Long.MaxValue, Long.MaxValue)))),
      lastUpdatedMs = now), (v, meta))
  }


  /** Expire all but the last `keepLast` snapshots. With `olderThanMs`
    * set, snapshots committed within that age also survive regardless of
    * count (Iceberg's expire-by-timestamp semantics — retention is the
    * UNION of both rules). Per-ref Retention policies (reference
    * snapshot.rs:70-95) are ENFORCED here, not just serialized:
    *   - a non-main ref whose referenced snapshot is older than its
    *     max-ref-age-ms drops out entirely (tag or branch);
    *   - each surviving branch keeps its newest min-snapshots-to-keep
    *     ancestors, plus every ancestor younger than max-snapshot-age-ms
    *     (Long.MaxValue = unset → only the global rules apply);
    *   - a surviving tag pins exactly its snapshot.
    * Deletes newly-orphaned data files and expired manifests; returns
    * the orphaned data file paths. Above the planning threshold the
    * entry-level orphan diff runs as anti-joins over the manifest
    * dataset — at 100 TB the expired history's entry list is big data
    * and only the DELETION SET reaches the driver.
    */
  def expireSnapshots(keepLast: Int,
      olderThanMs: Option[Long] = None): Seq[String] = {
    // the WHOLE derivation re-runs per attempt from a fresh metadata
    // read; files are only deleted after a successful commit, so a
    // conflicted attempt leaves everything intact — maintenance keeps
    // working while ingestion commits continuously
    var attempts = 0
    while (true) {
      attempts += 1
      try {
        val removed = expireOnce(keepLast, olderThanMs)
        // expiry may have dropped the last avro-bearing snapshots of a
        // compacted adopted table — restore the vectorized path. OUTSIDE
        // the retry semantics: a conflict here must neither re-run a
        // SUCCEEDED expiry (discarding its removed-paths result) nor
        // fail it — the clear is an optimization, retried at the next
        // maintenance call
        clearAvroFlagIfMigrated()
        return removed
      } catch {
        case _: CommitConflictException if attempts < 20 =>
          Thread.sleep(5L * attempts + scala.util.Random.nextInt(25))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def expireOnce(keepLast: Int,
      olderThanMs: Option[Long]): Seq[String] = {
    val (baseVersion, meta) = metadataWithVersion
    require(!meta.properties.exists(
      _.get(GraftTable.SharedFilesProp).contains("true")),
      s"expire_snapshots refused: ${GraftTable.SharedFilesProp}=true " +
        "marks this table's snapshots as referencing files shared with " +
        "other tables (metadata clone) — expiry would delete bytes the " +
        "other tables still read; unset the property only if this table " +
        "exclusively owns its files")
    val all = meta.snapshots.getOrElse(Seq.empty).sortBy(_.sequenceNumber)
    val now = System.currentTimeMillis
    val refs0 = meta.refs.getOrElse(Map.empty)
    val refs = refs0.filter { case (name, r) =>
      val maxRefAge = r.retention match {
        case BranchRetention(_, _, m) => m
        case TagRetention(m) => m
      }
      name == "main" || maxRefAge == Long.MaxValue ||
        meta.snapshotById(r.snapshotId).forall(s =>
          now - s.timestampMs <= maxRefAge)
    }
    // A live branch additionally pins its UNPUBLISHED lineage — every
    // ancestor down to the first snapshot reachable from main. Publish
    // (fast-forward / REST transaction) proves "main is an ancestor of
    // the branch head" by walking parent links; expiring an
    // intermediate staged commit would break that walk and turn a
    // legitimate publish into a false conflict (ancestry through an
    // expired region is unprovable — a fork below main's head would be
    // indistinguishable from a clean fast-forward). The pin is
    // metadata-plus-staged-data the branch needs until publish anyway,
    // and it dies with the ref.
    val mainReach: Set[Long] = refs.get("main")
      .map(r => ancestryOf(meta, r.snapshotId).toSet)
      .getOrElse(Set.empty)
    // lower bound of the pin: a branch ancestor with a sequence BELOW
    // everything main can reach cannot help the publish walk find main
    // (the walk would pass main's whole reachable range without a hit
    // and refuse anyway) — without the bound, a branch forked off a
    // rolled-back lineage, or any branch on a table with NO main ref,
    // would pin its entire ancestry forever and defeat retention aging
    val minMainSeq: Long = mainReach
      .flatMap(id => meta.snapshotById(id)).map(_.sequenceNumber)
      .minOption.getOrElse(Long.MaxValue)
    val refKeep: Set[Long] = refs.flatMap { case (name, r) =>
      r.retention match {
        case BranchRetention(minKeep, maxSnapAge, _) =>
          val aged = ancestryOf(meta, r.snapshotId).zipWithIndex.collect {
            case (id, i) if i < minKeep ||
              (maxSnapAge != Long.MaxValue &&
                meta.snapshotById(id).exists(s =>
                  now - s.timestampMs <= maxSnapAge)) => id
          }
          val staged =
            if (name == "main" || mainReach.isEmpty) Seq.empty
            else ancestryOf(meta, r.snapshotId)
              .takeWhile(id => !mainReach.contains(id) &&
                meta.snapshotById(id).exists(_.sequenceNumber >= minMainSeq))
          aged ++ staged
        case _: TagRetention => Seq(r.snapshotId)
      }
    }.toSet
    val cutoff = olderThanMs.map(now - _)
    val young = cutoff.map(c =>
      all.filter(_.timestampMs >= c).map(_.snapshotId).toSet)
      .getOrElse(Set.empty)
    val keep = all.takeRight(keepLast).map(_.snapshotId).toSet ++ refKeep ++
      young ++ meta.currentSnapshotId
    val (retained, expired) = all.partition(s => keep.contains(s.snapshotId))
    if (expired.isEmpty && refs.size == refs0.size) return Seq.empty
    // manifests are SHARED across snapshots: only delete manifests (and
    // their files) referenced exclusively by expired snapshots. A
    // manifest also referenced by a retained snapshot keeps ALL its
    // entries live, so only the exclusive set can contribute orphans.
    val retainedRefs = retained.flatMap(s =>
      ManifestList.read(Paths.get(s.manifestList)))
      .groupBy(_.path).map(_._2.head).toSeq
    val expiredRefs = expired.flatMap(s =>
      ManifestList.read(Paths.get(s.manifestList)))
    val retainedManifests = retainedRefs.map(_.path).toSet
    val orphanManifests = expiredRefs.map(_.path).distinct
      .filterNot(retainedManifests.contains)
    val exclusiveRefs = expiredRefs
      .filterNot(r => retainedManifests.contains(r.path))
      .groupBy(_.path).map(_._2.head).toSeq
    val (orphans, orphanBlooms) =
      if ((exclusiveRefs ++ retainedRefs).map(_.entryCount).sum >=
          distributedPlanningThreshold)
        expireDiffDistributed(retainedRefs, exclusiveRefs)
      else {
        val retainedEntries = retainedRefs.flatMap(_.entries)
        val exclusiveEntries = exclusiveRefs.flatMap(_.entries)
        val liveFiles = retainedEntries.map(_.path).toSet
        val o = exclusiveEntries
          .map(_.path).distinct.filterNot(liveFiles.contains)
        // bloom sidecars follow their data files (shared ones survive)
        val liveBlooms = retainedEntries.flatMap(_.bloom.map(_.path)).toSet
        val ob = exclusiveEntries.flatMap(_.bloom.map(_.path))
          .distinct.filterNot(liveBlooms.contains)
        (o, ob)
      }
    // stats files follow their snapshots: refs to expired snapshots go
    // (an ancestor-walk from any retained snapshot can never reach them)
    val (retainedStats, expiredStats) = meta.statistics.getOrElse(Seq.empty)
      .partition(s => keep.contains(s.snapshotId))
    val (retainedPStats, expiredPStats) = meta.partitionStatistics
      .getOrElse(Seq.empty).partition(s => keep.contains(s.snapshotId))
    // commit the metadata FIRST: if the commit conflicts, nothing has
    // been deleted and current metadata still references intact files
    writeMetadataAt(meta.copy(
      snapshots = Some(retained),
      snapshotLog = Some(meta.snapshotLog.getOrElse(Seq.empty)
        .filter(l => keep.contains(l.snapshotId))),
      refs = if (refs.isEmpty) None else Some(refs),
      statistics = if (retainedStats.isEmpty) None else Some(retainedStats),
      partitionStatistics =
        if (retainedPStats.isEmpty) None else Some(retainedPStats),
      lastUpdatedMs = System.currentTimeMillis), (baseVersion, meta))
    deleteDistributed(orphans ++ orphanBlooms)
    orphanManifests.foreach(p => Files.deleteIfExists(Paths.get(p)))
    (expiredStats ++ expiredPStats).foreach(s =>
      Files.deleteIfExists(Paths.get(s.path)))
    expired.foreach(s => Files.deleteIfExists(Paths.get(s.manifestList)))
    orphans
  }

  /** Snapshot ids reachable from `head` via parent links, newest first. */
  private def ancestryOf(meta: TableMetadataV2, head: Long): Seq[Long] =
    Iterator.iterate(Option(head))(cur => cur.flatMap(id =>
      meta.snapshotById(id).flatMap(_.parentSnapshotId)))
      .takeWhile(_.isDefined).map(_.get).toSeq

  /** Entry-level expiry diff as anti-joins over the manifest dataset:
    * data-file and bloom-sidecar paths of expired-exclusive manifests
    * minus those any retained manifest still references. Executors parse
    * and diff; only orphan paths reach the driver.
    */
  private def expireDiffDistributed(retainedRefs: Seq[ManifestRef],
      exclusiveRefs: Seq[ManifestRef]): (Seq[String], Seq[String]) = {
    if (exclusiveRefs.isEmpty) return (Seq.empty, Seq.empty)
    def paths(refs: Seq[ManifestRef]): DataFrame = {
      val df = manifestDfForRefs(refs)
      df.select(col("path").as("p"), lit(false).as("is_bloom"))
        .unionAll(df.select(col("bloom")("path").as("p"),
          lit(true).as("is_bloom")).where(col("p").isNotNull))
        .distinct()
    }
    val ex = paths(exclusiveRefs)
    val orphanRows =
      (if (retainedRefs.isEmpty) ex
       else ex.join(paths(retainedRefs).select("p"), Seq("p"), "left_anti"))
        .collect()
    (orphanRows.filter(!_.getBoolean(1)).map(_.getString(0)).toSeq,
      orphanRows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq)
  }

  /** Delete a set of files: driver loop for small sets, a parallelized
    * executor job above the planning threshold (expiring a 100 TB
    * table's history deletes millions of files — the storage client runs
    * where the work is).
    */
  private def deleteDistributed(paths: Seq[String]): Unit =
    if (paths.size < distributedPlanningThreshold)
      paths.foreach(p => Files.deleteIfExists(Paths.get(p)))
    else
      spark.sparkContext.parallelize(paths,
        math.max(1, math.min(paths.size / 1000, 256)))
        .foreach(p => Files.deleteIfExists(Paths.get(p)))

  /** Export the CURRENT snapshot's manifests and manifest list as
    * Iceberg-spec Avro files under `outDir` (see [[AvroManifest]]):
    * entries group by their write schema (the manifest's `schema`
    * metadata must describe its entries for field-id-addressed stats),
    * and the manifest list records per-manifest lengths and counts.
    * Returns the manifest-list path.
    */
  def exportAvro(outDir: String): Path = {
    val meta = metadata
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"no snapshot to export at $location"))
    // An Iceberg manifest holds entries of exactly ONE partition spec
    // (its list row records the partition-spec-id) — an evolved table
    // groups entries by their write-time spec and exports one manifest
    // per (schema, spec) group, each under THAT spec's layout. Entries
    // whose values can't be attributed to a known spec would export with
    // mislabeled partition tuples — fail loudly instead.
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val refs = manifestsFor(meta, None)
    val listEntries =
      if (refs.map(_.entryCount).sum < distributedPlanningThreshold) {
        var i = 0
        refs.flatMap { r =>
          r.entries.groupBy(e => (e.schemaId, specForEntry(meta, e).specId))
            .toSeq.sortBy(_._1).map { case ((sid, specId), es) =>
              val spec = meta.partitionSpecs.find(_.specId == specId)
                .getOrElse(PartitionSpec.unpartitioned)
              val specNames = spec.fields.map(_.name).toSet
              es.filter(_.isData).foreach { e =>
                require(e.partition.keySet == specNames,
                  s"data file ${e.path} has partition keys " +
                    s"${e.partition.keySet} but spec $specId defines " +
                    s"$specNames — written under an unregistered spec?")
              }
              val schema = meta.schemaById(sid).getOrElse(meta.currentSchema)
              val p = dir.resolve(f"manifest-$i%05d.avro")
              i += 1
              val len = AvroManifest.writeManifest(p, es, schema, spec,
                snap.snapshotId, r.content)
              // spec field 515 = sequence the manifest was ADDED at (the
              // ref's inherited sequence, else the newest entry — carried
              // entries keep older sequences), 516 = min entry sequence
              AvroManifest.ListEntry(p, len, r.content,
                addedSequenceNumber = r.addedSequenceNumber
                  .getOrElse(es.map(_.sequenceNumber).max),
                minSequenceNumber = es.map(_.sequenceNumber).min,
                addedSnapshotId = snap.snapshotId,
                fileCount = es.size.toLong,
                rowCount = es.map(_.recordCount).sum,
                specId = Some(spec.specId),
                partitions =
                  AvroManifest.partitionSummaries(es, spec, schema))
            }
        }
      } else {
        // above the planning threshold the export fans out: one executor
        // task per source manifest reads ITS entries, writes the Avro
        // manifests, and returns O(1) list rows — exporting a
        // million-file table is a Spark job, never a driver loop
        val specs = meta.partitionSpecs
        val defaultSpec = meta.defaultSpec
        val schemas = meta.schemas
        val currentSchema = meta.currentSchema
        val snapId = snap.snapshotId
        val dirStr = dir.toString
        val indexed = refs.zipWithIndex
        spark.sparkContext
          .parallelize(indexed, math.max(1, math.min(indexed.size, 256)))
          .flatMap { case (r, idx) =>
            GraftTable.exportOneManifest(r, idx, dirStr, specs, defaultSpec,
              schemas, currentSchema, snapId)
          }
          .collect().toSeq.sortBy(_._1)
          .map { case (p, len, content, addedSeq, minSeq, nFiles, nRows,
              specId, summaries) =>
            AvroManifest.ListEntry(Paths.get(p), len, content,
              addedSequenceNumber = addedSeq, minSequenceNumber = minSeq,
              addedSnapshotId = snapId, fileCount = nFiles,
              rowCount = nRows, specId = Some(specId),
              partitions = summaries)
          }
      }
    val listPath = dir.resolve(s"snap-${snap.snapshotId}.avro")
    AvroManifest.writeManifestList(listPath, listEntries,
      meta.defaultSpec.specId)
    listPath
  }

  // ----------------------------------------------------- metadata tables ----

  /** `.snapshots` metadata table. */
  def snapshotsDf: DataFrame = {
    import spark.implicits._
    metadata.snapshots.getOrElse(Seq.empty).map(s =>
      (s.snapshotId, s.parentSnapshotId, s.sequenceNumber, s.timestampMs,
        s.summary.operation.getOrElse(""),
        s.summary.other.getOrElse("total-records", "0").toLong))
      .toDF("snapshot_id", "parent_id", "sequence_number", "committed_at_ms",
        "operation", "total_records")
  }

  /** `.history` metadata table. */
  def historyDf: DataFrame = {
    import spark.implicits._
    metadata.snapshotLog.getOrElse(Seq.empty)
      .map(l => (l.timestampMs, l.snapshotId))
      .toDF("made_current_at_ms", "snapshot_id")
  }

  /** `.files` metadata table. Above the planning threshold it is served
    * straight off the manifest dataset — a million-file table's file
    * listing is a Spark scan, not a driver-side Seq.
    */
  def filesDf: DataFrame = {
    val refs = liveManifests(None)
    if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
      manifestDfForRefs(refs).select(
        col("path").as("file_path"),
        col("record-count").as("record_count"),
        col("snapshot-id").as("added_snapshot_id"),
        col("sequence-number").as("sequence_number"),
        col("schema-id").as("schema_id"),
        concat_ws(",", transform(array_sort(map_entries(col("partition"))),
          e => concat(e("key"), lit("="),
            coalesce(e("value"), lit("null"))))).as("partition"))
    else {
      import spark.implicits._
      refs.flatMap(_.entries).map(e => (e.path, e.recordCount, e.snapshotId,
        e.sequenceNumber, e.schemaId,
        e.partition.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${v.getOrElse("null")}" }.mkString(",")))
        .toDF("file_path", "record_count", "added_snapshot_id",
          "sequence_number", "schema_id", "partition")
    }
  }

  /** Per-data-file position-delete attribution over the LIVE delete
    * entries: (canonical data-file path, deleted-row count, delete-file
    * count). DV entries resolve metadata-only — each references exactly
    * one data file and carries its cardinality; parquet position-delete
    * files are read distributed and grouped by referenced path —
    * O(deleted rows), never O(table). None when no position deletes.
    * Equality deletes are NOT attributed (their keys are not
    * partition-scoped; applying them is a data-plane job, not stats).
    */
  private def positionDeleteAttribution(): Option[DataFrame] = {
    val delRefs = liveManifests(None).filter(_.content == 1)
    if (delRefs.isEmpty) return None
    // entries stay on executors: the manifest DATASET carries the DV
    // refs, and only the parquet delete-file PATHS (O(delete files))
    // reach the driver to seed the distributed read
    val mdf = manifestDfForRefs(delRefs).filter(col("content") === 1)
    val dvDf = mdf.filter(col("dv").isNotNull)
      .select(
        GraftTable.decodeCanonCol(col("dv")("data-file")).as("__dfile"),
        GraftTable.decodeCanonCol(col("path")).as("__delfile"),
        col("record-count").as("__n"))
    val parqPaths = mdf.filter(col("dv").isNull)
      .select("path").distinct().collect().map(_.getString(0))
    val pqDf =
      if (parqPaths.isEmpty) None
      else {
        val delSchema = StructType(Seq(
          SparkField("file_path", StringType), SparkField("pos", LongType)))
        Some(spark.read.schema(delSchema).parquet(parqPaths.toSeq: _*)
          .select(GraftTable.decodeCanonCol(col("file_path")).as("__dfile"),
            GraftTable.decodeCanonCol(col("_metadata.file_path"))
              .as("__delfile"))
          .groupBy("__dfile", "__delfile")
          .agg(count(lit(1)).as("__n")))
      }
    Some((Seq(dvDf) ++ pqDf.toSeq).reduce(_.unionByName(_)))
  }

  /** Per-partition EQUALITY-delete attribution. Exact whenever every
    * source column of a spec is among a delete file's equality key
    * columns: each delete ROW's partition tuple is then recomputed by
    * applying the spec's transforms to its key values — O(delete rows),
    * distributed, no data files touched. A (spec, delete-file) pair the
    * keys cannot cover yields NULL (unknown) for that spec's partitions:
    * graft's equality deletes are table-wide, so an uncovered tuple
    * genuinely cannot be attributed without applying the delete to data
    * (a data-plane job, not stats). Sequence scoping is intentionally
    * ignored — the spec counts delete RECORDS per partition, not the
    * rows they ultimately strike (matching Iceberg, where the counted
    * tuple is the delete file's own manifest partition).
    *
    * Returns (attribution rows keyed (__pstr, spec_id) with __eqr row
    * and __eqf distinct-file counts; uncoverable spec ids; whether any
    * equality deletes exist at all).
    */
  private def equalityDeleteAttribution()
      : (Option[DataFrame], Set[Int], Boolean) = {
    val meta = metadata
    val eqEntries = liveManifests(None).filter(_.content == 2)
      .flatMap(_.entries)
    if (eqEntries.isEmpty) return (None, Set.empty, false)
    val schema = meta.currentSchema
    val sparkSchema = GraftTable.toSparkSchema(schema)
    val bySig = eqEntries.groupBy(_.eqColumns)
    // one read per key-column signature, shared across specs; delete
    // files must be parquet (feeding an adopted avro/orc delete file
    // to the parquet reader would die inside a task, or misparse)
    val keyDfBySig =
      scala.collection.mutable.Map.empty[Seq[String], DataFrame]
    def keyDfFor(sig: Seq[String],
        entries: Seq[DataFileEntry]): DataFrame =
      keyDfBySig.getOrElseUpdate(sig, {
        entries.find(_.format != DataFileEntry.Parquet).foreach(e =>
          throw new IllegalArgumentException(
            s"equality-delete file ${e.path} is ${e.format}; this " +
              "build reads parquet equality deletes only"))
        spark.read.parquet(entries.map(_.path).distinct: _*)
      })
    val uncov = Set.newBuilder[Int]
    val parts = meta.partitionSpecs.flatMap { spec =>
      // (partition field, source column name, source Spark type) — None
      // when a source column no longer exists in the current schema
      val srcs = spec.fields.foldLeft(
        Option(Seq.empty[(PartitionField, String, DataType)])) {
        case (acc, pf) => for {
          a <- acc
          f <- schema.fieldById(pf.sourceId)
        } yield a :+ ((pf, f.name, sparkSchema(f.name).dataType))
      }
      bySig.toSeq.flatMap { case (sig, entries) =>
        srcs match {
          case Some(ss) if ss.forall(s => sig.contains(s._2)) =>
            val keyDf = keyDfFor(sig, entries)
            // cast-to-string matches the hive-dir-decoded manifest
            // values for every transform output type; the injective
            // JSON form is the join key (see partitionKeyCol)
            val tuple =
              if (ss.isEmpty) map()
              else map(ss.flatMap { case (pf, srcName, dt) =>
                Seq(lit(pf.name), GraftTable
                  .transformColumn(pf.transform, col(srcName), dt)
                  .cast("string"))
              }: _*)
            Some(keyDf.select(
              GraftTable.partitionKeyCol(tuple).as("__pkey"),
              GraftTable.decodeCanonCol(col("_metadata.file_path"))
                .as("__eqfile"))
              .withColumn("spec_id", lit(spec.specId)))
          case _ =>
            uncov += spec.specId
            None
        }
      }
    }
    if (parts.isEmpty) return (None, uncov.result(), true)
    val att = parts.reduce(_.unionByName(_))
      .groupBy("__pkey", "spec_id")
      .agg(count(lit(1)).as("__eqr"),
        count_distinct(col("__eqfile")).as("__eqf"))
    (Some(att), uncov.result(), true)
  }

  /** Materialize `df` as ONE parquet file `<prefix>-<rand>.parquet`
    * under `dir`: coalesce(1)-write into a temp dir, move the part file
    * into place, sweep the temp dir (success markers etc.). Both stats
    * artifacts (partition statistics, exact attribution sidecar) share
    * this dance so fixes land once.
    */
  private def writeSingleParquet(df: DataFrame, dir: Path,
      prefix: String): Path = {
    Files.createDirectories(dir)
    val rand = java.util.UUID.randomUUID.toString.take(8)
    val tmpDir = dir.resolve(s"$prefix-tmp-$rand")
    pinParquetTs(df)
    df.coalesce(1).write.parquet(tmpDir.toString)
    val part = {
      val ls = Files.list(tmpDir)
      try ls.iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"no parquet written under $tmpDir"))
      finally ls.close()
    }
    val target = dir.resolve(s"$prefix-$rand.parquet")
    Files.move(part, target)
    val walk = Files.walk(tmpDir)
    // sorted() materializes the listing first, so deleting while
    // iterating is safe; reverse order empties directories before them
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator.asScala.foreach(Files.deleteIfExists(_))
    finally walk.close()
    target
  }

  /** Validity key of the exact-attribution cache: the snapshot id plus
    * everything coverage depends on that can change WITHOUT a snapshot —
    * schema evolution (a rename flips a spec between covered and
    * uncovered; metadata-only, bumps currentSchemaId) and partition-spec
    * evolution (metadata-only, changes the spec set).
    */
  private def eqAttributionFingerprint(meta: TableMetadataV2): String =
    s"${meta.currentSnapshotId.getOrElse(-1L)}:${meta.currentSchemaId}:" +
      meta.partitionSpecs.map(_.specId).sorted.mkString("-")

  /** The exact-attribution cache written by [[computeDeleteAttribution]]
    * — (__pkey, spec_id, __xeqr, __xeqf) — but ONLY if it was computed
    * at the CURRENT (snapshot, schema, spec-set) state; any commit or
    * metadata-only evolution since invalidates it (the stale
    * registration stays in properties, harmlessly ignored, until the
    * next CALL overwrites it).
    */
  private def exactEqAttributionSidecar(): Option[DataFrame] = {
    val meta = metadata
    val props = meta.properties.getOrElse(Map.empty)
    for {
      s <- props.get(GraftTable.EqAttributionSnapProp)
      p <- props.get(GraftTable.EqAttributionPathProp)
      if s == eqAttributionFingerprint(meta) && Files.exists(Paths.get(p))
    } yield spark.read.parquet(p)
      .select(col("__pkey"), col("spec_id"),
        col("__xeqr"), col("__xeqf"))
  }

  /** Compute EXACT equality-delete attribution for specs the delete
    * keys do not cover, by applying the deletes to data once (the
    * data-plane answer the NULL-means-unknown metadata path cannot
    * give): a delete RECORD attributes to a partition iff at least one
    * row of that partition's data files matches it under the scan's own
    * rule — null-safe key equality, delete sequence STRICTLY above the
    * row's. Record count is delete records (a record matching rows in
    * two partitions counts toward both); file count is distinct delete
    * files. Signatures that DO cover the spec stay key-mapped (same
    * numbers as the covered-spec path), so the two sum without double
    * counting — a delete file has exactly one signature.
    *
    * The result is cached as a sidecar parquet under `stats/` and
    * registered in table properties keyed by the current snapshot;
    * `.partitions` and the partition-statistics writer serve exact
    * counts from it until the next commit invalidates it. Returns the
    * partition-statistics file written AFTER registration, which
    * therefore carries the exact counts.
    */
  def computeDeleteAttribution(): graft.model.StatisticsFileRef = {
    val meta = metadata
    val sid = meta.currentSnapshotId.getOrElse(
      throw new IllegalStateException(s"no snapshot at $location"))
    val (attOpt, uncovSpecs, _) = equalityDeleteAttribution()
    if (uncovSpecs.nonEmpty) {
      import spark.implicits._
      val schema = meta.currentSchema
      val eqEntries = liveManifests(None).filter(_.content == 2)
        .flatMap(_.entries)
      val bySig = eqEntries.groupBy(_.eqColumns)
      def covers(spec: PartitionSpec, sig: Seq[String]): Boolean =
        spec.fields.forall(pf =>
          schema.fieldById(pf.sourceId).exists(f => sig.contains(f.name)))
      val specsById = meta.partitionSpecs.map(s => s.specId -> s).toMap
      // (signature, uncovered specs it fails to cover) — only these
      // pairs need the data pass; covering signatures reuse the
      // key-mapped rows already in attOpt
      val uncovPairs = bySig.keys.toSeq.map(sig =>
        sig -> uncovSpecs.filter(id =>
          specsById.get(id).exists(sp => !covers(sp, sig))))
        .filter(_._2.nonEmpty)
      // data files of uncovered specs — a maintenance CALL, so the
      // driver-side entry list (O(files), same plane as filesDf) is the
      // honest cost; the matching itself is fully distributed
      val dataEntries = liveManifests(None).filter(_.content == 0)
        .flatMap(_.entries)
        .filter(e => uncovSpecs.contains(e.specId.getOrElse(0)))
      // a sized LocalRelation: Spark broadcasts it while it is small
      // and falls back to a shuffle join at millions of files — do NOT
      // force a broadcast that grows with the table. Keyed by the
      // decoded CANONICAL path (like __dfile/__eqfile everywhere else):
      // adopted layouts may store URI-form or non-normalized paths that
      // the raw string would silently fail to match, yielding exact-0s
      val fileMeta = dataEntries.map(e => (
          GraftTable.canonPath(GraftTable.decodePath(e.path)),
          e.partition.map { case (k, v) => k -> v.orNull },
          e.specId.getOrElse(0), e.sequenceNumber))
        .toDF("__dfkey", "__pmap", "spec_id", "__dseq")
      val neededCols = uncovPairs.flatMap(_._1).distinct
      val missing = neededCols.filterNot(c =>
        schema.fields.exists(_.name == c))
      require(missing.isEmpty,
        s"equality-delete key column(s) ${missing.mkString(", ")} no " +
          "longer exist in the current schema (renamed or dropped); " +
          "exact attribution cannot match them against data")
      val readSchema = schema.copy(fields =
        schema.fields.filter(f => neededCols.contains(f.name)))
      val aligned = GraftTable.readAlignedFilesCore(spark, meta,
          dataEntries.map(e => (e.path, e.schemaId)), readSchema,
          withFile = true,
          formatOf = dataEntries.map(e => e.path -> e.format).toMap)
        .withColumn("__dfkey",
          GraftTable.decodeCanonCol(col(GraftTable.FileCol)))
        .drop(GraftTable.FileCol)
        .join(fileMeta, Seq("__dfkey"))
        .withColumn("__pkey", GraftTable.partitionKeyCol(col("__pmap")))
      val matchedParts = uncovPairs.map { case (sig, specs) =>
        val dels = bySig(sig)
        dels.find(_.format != DataFileEntry.Parquet).foreach(e =>
          throw new IllegalArgumentException(
            s"equality-delete file ${e.path} is ${e.format}; this " +
              "build reads parquet equality deletes only"))
        // one row per delete RECORD (duplicate keys count separately,
        // like the key-mapped count(1)), with its file and sequence
        val recs = dels.groupBy(_.sequenceNumber).map { case (dseq, ds) =>
          spark.read.parquet(ds.map(_.path).distinct: _*)
            .select(sig.map(c => col(c).as(s"__gfeq_$c")) ++ Seq(
              GraftTable.decodeCanonCol(col("_metadata.file_path"))
                .as("__eqfile"),
              lit(dseq).as("__delseq")): _*)
        }.reduce(_.unionByName(_))
        // existence witness per (key tuple, partition): the EARLIEST
        // data sequence — "some row below the delete's sequence" is
        // exactly min(data seq) < delete seq
        val cand = aligned
          .filter(col("spec_id").isin(specs.toSeq: _*))
          .groupBy(sig.map(col) ++ Seq(col("__pkey"), col("spec_id")): _*)
          .agg(min(col("__dseq")).as("__minseq"))
        val cond = sig.map(c => col(c) <=> col(s"__gfeq_$c"))
          .reduce(_ && _) && col("__delseq") > col("__minseq")
        recs.join(cand, cond)
          .groupBy("__pkey", "spec_id")
          .agg(count(lit(1)).as("__eqr"),
            count_distinct(col("__eqfile")).as("__eqf"))
      }
      val coveredParts = attOpt.map(_.filter(
        col("spec_id").isin(uncovSpecs.toSeq: _*))).toSeq
      val exact = (matchedParts ++ coveredParts)
        .reduce(_.unionByName(_))
        .groupBy("__pkey", "spec_id")
        .agg(sum("__eqr").as("__xeqr"), sum("__eqf").as("__xeqf"))
      val target = writeSingleParquet(exact,
        Paths.get(location, "stats"), s"eq-attribution-$sid")
      val prev = meta.properties.getOrElse(Map.empty)
        .get(GraftTable.EqAttributionPathProp)
      updateProperties(Map(
        GraftTable.EqAttributionSnapProp ->
          Some(eqAttributionFingerprint(meta)),
        GraftTable.EqAttributionPathProp -> Some(target.toString)))
      // sweep the superseded sidecar AFTER the registration commits
      // (same order as expire: a failed commit deletes nothing)
      prev.filter(_ != target.toString)
        .foreach(p => Files.deleteIfExists(Paths.get(p)))
    }
    writePartitionStats()
  }

  /** Join per-partition delete attribution onto a per-partition
    * aggregate: `agg` and `base` must carry (`__pkey`, `spec_id`) —
    * the INJECTIVE partition join key (see partitionKeyCol) — and
    * `base` additionally `__dfile` per data file; emits the four spec
    * columns, zero-filled when the table has no deletes of that form.
    * Position-delete attribution rows are (data file, delete file,
    * rows) so the per-partition file count is a DISTINCT count — one
    * delete file covering several data files of a partition counts
    * once for it. Equality columns are exact for specs the delete keys
    * cover and NULL for specs they cannot (see
    * equalityDeleteAttribution).
    */
  private def withDeleteAttribution(agg: DataFrame,
      base: DataFrame): DataFrame = {
    val withPos = positionDeleteAttribution() match {
      case None =>
        agg.withColumn("position_delete_record_count", lit(0L))
          .withColumn("position_delete_file_count", lit(0L))
      case Some(att) =>
        val perPart = base.select("__pkey", "spec_id", "__dfile")
          .join(att, Seq("__dfile"))
          .groupBy("__pkey", "spec_id")
          .agg(sum("__n").as("__pdr"),
            count_distinct(col("__delfile")).as("__pdf"))
        agg.join(perPart, Seq("__pkey", "spec_id"), "left")
          .withColumn("position_delete_record_count",
            coalesce(col("__pdr"), lit(0L)))
          .withColumn("position_delete_file_count",
            coalesce(col("__pdf"), lit(0L)))
          .drop("__pdr", "__pdf")
    }
    val (eqAtt, uncovSpecs, anyEq) = equalityDeleteAttribution()
    if (!anyEq)
      withPos.withColumn("equality_delete_record_count", lit(0L))
        .withColumn("equality_delete_file_count", lit(0L))
    else {
      val joined = eqAtt match {
        case Some(att) => withPos.join(att, Seq("__pkey", "spec_id"), "left")
        case None => withPos
          .withColumn("__eqr", lit(null).cast(LongType))
          .withColumn("__eqf", lit(null).cast(LongType))
      }
      val unknown =
        if (uncovSpecs.isEmpty) lit(false)
        else col("spec_id").isin(uncovSpecs.toSeq: _*)
      // exact attribution cache (computeDeleteAttribution): valid only
      // while its snapshot id matches — a commit reverts to NULL
      val sidecar = exactEqAttributionSidecar()
      val withExact = sidecar match {
        case Some(x) =>
          joined.join(x, Seq("__pkey", "spec_id"), "left")
        case None => joined
          .withColumn("__xeqr", lit(null).cast(LongType))
          .withColumn("__xeqf", lit(null).cast(LongType))
      }
      def eqCol(exact: String, mapped: String): Column =
        when(unknown,
          if (sidecar.isDefined) coalesce(col(exact), lit(0L))
          else lit(null).cast(LongType))
          .otherwise(coalesce(col(mapped), lit(0L)))
      withExact
        .withColumn("equality_delete_record_count",
          eqCol("__xeqr", "__eqr"))
        .withColumn("equality_delete_file_count",
          eqCol("__xeqf", "__eqf"))
        .drop("__eqr", "__eqf", "__xeqr", "__xeqf")
    }
  }

  /** `.partitions` metadata table: per partition tuple — live file and
    * record counts, position-delete attribution (rows vectored/deleted
    * per partition under MoR), plus the spec the tuple was written
    * under. Computed as a distributed aggregate over the manifest
    * dataset: at millions of files this is a Spark job over manifest
    * rows, never a driver loop (contrast filesDf, which is a
    * driver-side listing by design).
    */
  def partitionsDf: DataFrame = {
    val base = manifestDf(None)
      .filter(coalesce(col("content"), lit(0)) === 0)
      .select(
        GraftTable.partitionKeyCol(col("partition")).as("__pkey"),
        GraftTable.renderPartitionCol(col("partition")).as("__pstr"),
        coalesce(col("spec-id"), lit(0)).as("spec_id"),
        col("record-count").as("rc"),
        GraftTable.decodeCanonCol(col("path")).as("__dfile"))
    val agg = base.groupBy("__pkey", "__pstr", "spec_id")
      .agg(count(lit(1)).as("file_count"), sum("rc").as("record_count"))
    withDeleteAttribution(agg, base).drop("__pkey")
      .withColumnRenamed("__pstr", "partition")
  }

  /** `.manifests` metadata table: one row per manifest the current
    * snapshot references (data and delete manifests; `content` 0 = data,
    * 1 = position deletes, 2 = equality deletes).
    */
  def manifestsDf: DataFrame = {
    import spark.implicits._
    liveManifests(None).map(m => (m.path, m.content, m.entryCount,
      m.recordCount, m.addedSnapshotId, m.addedSequenceNumber))
      .toDF("path", "content", "entry_count", "record_count",
        "added_snapshot_id", "added_sequence_number")
  }

  /** `.entries` metadata table: one row per LIVE manifest entry of the
    * current snapshot — data AND delete entries (content 0/1/2), with
    * the manifest that carries each. `status` follows the spec's
    * live-entry semantics: 1 (ADDED) when the entry landed in the
    * current snapshot, 0 (EXISTING) otherwise; DELETED entries never
    * appear in a live manifest. Same threshold dispatch as `.files` —
    * above it the view is a projection over the distributed manifest
    * dataset, never a driver entry loop.
    */
  def entriesDf: DataFrame = {
    // ONE metadata read pins both the manifest set and the snapshot the
    // `status` column is computed against — a commit landing between
    // two independent loads would mislabel the listed entries
    val meta = metadata
    entriesDfFor(manifestsFor(meta, None), meta)
  }

  /** `.all_entries`: entries of every manifest any retained snapshot
    * references (deduplicated), status relative to the current snapshot.
    */
  def allEntriesDf: DataFrame = {
    val meta = metadata
    entriesDfFor(allRefsOf(meta), meta).distinct()
  }

  private def entriesDfFor(refs: Seq[ManifestRef],
      meta: TableMetadataV2): DataFrame = {
    val curSnap = meta.currentSnapshotId.getOrElse(-1L)
    if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
      manifestDfForRefs(refs).select(
        when(col("snapshot-id") === curSnap, lit(1)).otherwise(lit(0))
          .as("status"),
        col("snapshot-id").as("snapshot_id"),
        col("sequence-number").as("sequence_number"),
        GraftTable.decodeCanonCol(col(SrcManifestCol))
          .as("manifest_path"),
        coalesce(col("content"), lit(0)).as("content"),
        col("path").as("file_path"),
        col("record-count").as("record_count"),
        col("schema-id").as("schema_id"),
        concat_ws(",", transform(array_sort(map_entries(col("partition"))),
          e => concat(e("key"), lit("="),
            coalesce(e("value"), lit("null"))))).as("partition"))
    else {
      import spark.implicits._
      refs.flatMap(r => r.entries.map(e =>
        (if (e.snapshotId == curSnap) 1 else 0, e.snapshotId,
          e.sequenceNumber, GraftTable.canonPath(r.path), e.content,
          e.path, e.recordCount, e.schemaId,
          e.partition.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=${v.getOrElse("null")}" }
            .mkString(","))))
        .toDF("status", "snapshot_id", "sequence_number", "manifest_path",
          "content", "file_path", "record_count", "schema_id", "partition")
    }
  }

  /** `.metadata_log_entries` metadata table: every metadata.json version
    * this table has ever committed, oldest first.
    */
  def metadataLogDf: DataFrame = {
    import spark.implicits._
    metadata.metadataLog.getOrElse(Seq.empty)
      .map(l => (l.timestampMs, l.metadataFile))
      .toDF("timestamp_ms", "file")
  }

  /** `.position_deletes` metadata table: every live (data file, row
    * position) delete tuple plus the delete file holding it — the MoR
    * debugging view. Reads the delete parquet distributed; row volume
    * is O(deleted rows).
    */
  def positionDeletesDf: DataFrame = {
    val entries = liveManifests().filter(_.content == 1)
      .flatMap(_.entries).filter(_.content == 1)
    val (dvs, parqs) = entries.partition(_.dv.isDefined)
    val delSchema = StructType(Seq(SparkField("file_path", StringType),
      SparkField("pos", LongType)))
    val parts = Seq(
      if (parqs.isEmpty) None
      else Some(spark.read.schema(delSchema).parquet(parqs.map(_.path): _*)
        .withColumn("delete_file", col("_metadata.file_path"))),
      if (dvs.isEmpty) None
      else {
        val withSidecar = Dv.positionsDf(spark,
            dvs.map(e => (e.dv.get, e.path)))
          .join(broadcast(spark.createDataFrame(
            dvs.map(e => (e.dv.get.dataFile, e.path)))
            .toDF("file_path", "delete_file")), Seq("file_path"))
        Some(withSidecar.select(col("file_path"), col("pos"),
          col("delete_file")))
      }).flatten
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(delSchema.fields :+
          SparkField("delete_file", StringType)))
    else parts.reduce(_.unionByName(_))
  }

  /** `.all_files` metadata table: every file any RETAINED snapshot
    * references (time-travel debugging — shows files the current
    * snapshot no longer holds). Above the planning threshold the whole
    * history's entry list is served off the manifest dataset; the
    * driver never materializes it.
    */
  def allFilesDf: DataFrame = {
    val refs = allRefs
    if (refs.map(_.entryCount).sum >= distributedPlanningThreshold)
      manifestDfForRefs(refs).select(
        col("path").as("file_path"),
        coalesce(col("content"), lit(0)).as("content"),
        col("record-count").as("record_count"),
        col("snapshot-id").as("added_snapshot_id"),
        col("sequence-number").as("sequence_number"))
        .distinct()
    else {
      import spark.implicits._
      refs.flatMap(_.entries)
        .map(e => (e.path, e.content, e.recordCount, e.snapshotId,
          e.sequenceNumber))
        .distinct
        .toDF("file_path", "content", "record_count", "added_snapshot_id",
          "sequence_number")
    }
  }

  /** `.all_manifests` metadata table: every manifest any retained
    * snapshot references.
    */
  def allManifestsDf: DataFrame = {
    import spark.implicits._
    allRefs.map(r => (r.path, r.content, r.entryCount, r.recordCount,
        r.addedSnapshotId, r.addedSequenceNumber))
      .distinct
      .toDF("path", "content", "entry_count", "record_count",
        "added_snapshot_id", "added_sequence_number")
  }

  private def allRefs: Seq[ManifestRef] = allRefsOf(metadata)

  private def allRefsOf(meta: TableMetadataV2): Seq[ManifestRef] =
    meta.snapshots.getOrElse(Seq.empty)
      .flatMap(s => ManifestList.read(Paths.get(s.manifestList)))
      .distinct

  /** refs metadata table. */
  def refsDf: DataFrame = {
    import spark.implicits._
    metadata.refs.getOrElse(Map.empty).toSeq.sortBy(_._1).map { case (n, r) =>
      (n, if (r.isBranch) "branch" else "tag", r.snapshotId)
    }.toDF("name", "type", "snapshot_id")
  }
}

/** A concurrent writer claimed the metadata version this commit wanted.
  * The operation should be re-derived against the refreshed table state.
  */
class CommitConflictException(msg: String) extends RuntimeException(msg)

/** One pruned data file as the DSv2 connector consumes it: bin-packing
  * needs (schemaId, fileSize); storage-partitioned joins need the
  * partition tuple.
  */
case class ConnectorFile(path: String, schemaId: Int,
    sequenceNumber: Long, fileSize: Long,
    partition: Map[String, Option[String]],
    format: String = DataFileEntry.Parquet)

/** One WHEN clause of a generalized MERGE (`GraftTable.mergeApply`):
  * within a clause list, the first action whose condition evaluates TRUE
  * applies (SQL MERGE semantics). Conditions and values reference target
  * columns by name and source columns as
  * `GraftTable.MergeSourcePrefix + name`.
  */
sealed trait MergeAction { def condition: Option[Column] }

/** WHEN [NOT] MATCHED ... THEN UPDATE SET — columns absent from
  * `assignments` keep their current value.
  */
case class MergeUpdate(condition: Option[Column],
    assignments: Map[String, Column]) extends MergeAction

/** WHEN MATCHED ... THEN DELETE. */
case class MergeDelete(condition: Option[Column]) extends MergeAction

/** WHEN NOT MATCHED ... THEN INSERT — columns absent from `values`
  * insert NULL.
  */
case class MergeInsert(condition: Option[Column],
    values: Map[String, Column]) extends MergeAction

object GraftTable {

  /** Thrown inside a streaming-epoch commit closure when the fresh
    * metadata shows the epoch already committed (a restarted driver won
    * the race) — the caller reclaims its staged copy instead of
    * double-committing.
    */
  private[table] final class EpochAlreadyCommitted extends RuntimeException

  /** Marks a table whose snapshots reference data/manifest files SHARED
    * with other tables (e.g. a metadata clone of a cached build). File
    * deletion funnels through snapshot expiry, so [[GraftTable
    * .expireSnapshots]] refuses while this is set — expiring a clone
    * would delete bytes other tables still read. The orphan sweep is
    * inherently safe (it only walks THIS table's location).
    */
  val SharedFilesProp = "graft.shared-files"

  /** Per-array cap for the CoW changelog's two-level replication explode
    * (256Ki longs = 2 MB per group array): bounds memory regardless of a
    * group's net count where one sequence() call was O(count) and failed
    * above ~2.1B elements.
    */
  val ChangelogChunk: Long = 1L << 18

  /** Prefix under which `mergeApply` action expressions reference SOURCE
    * columns (target columns go by their bare names).
    */
  val MergeSourcePrefix = "__src_"

  /** Table property routing deleteWhereMoR's output form: unset/"parquet"
    * writes (file_path, pos) position-delete files, "deletion-vectors"
    * writes one merged DV per affected data file (see deleteWhereDv).
    */
  val DeleteFormatProp = "write.delete.format"

  /** Iceberg's delete-mode property: tables declaring "merge-on-read"
    * get their SQL `DELETE FROM` routed to deleteWhereMoR by
    * GraftSparkSessionExtensions instead of the CoW SupportsDeleteV2
    * path.
    */
  val DeleteModeProp = "write.delete.mode"

  /** Sequence-number watermark recording when the CURRENT default sort
    * order took effect: every data file with a larger sequence number
    * was written under it (writeFiles applies the default sort on every
    * append and rewrite), so a scan whose planned files all clear the
    * watermark can report per-partition output ordering to Spark
    * (SupportsReportOrdering — sort-free SortMergeJoins on co-sorted
    * tables).
    */
  val SortSinceSeqProp = "graft.sort-order.since-seq"

  /** Iceberg's update-mode property: tables declaring "merge-on-read"
    * get SQL `UPDATE` routed to updateWhereMoR (position deletes/DVs +
    * appended new versions, zero data-file rewrites) instead of the
    * CoW updateWhere.
    */
  val UpdateModeProp = "write.update.mode"

  /** Iceberg's merge-mode property: tables declaring "merge-on-read"
    * get SQL `MERGE INTO` routed to mergeApplyMoR instead of the CoW
    * mergeApply.
    */
  val MergeModeProp = "write.merge.mode"

  /** Table property enabling row lineage (Iceberg v3 semantics): every
    * row gets a stable `_row_id`, assigned once at append and preserved
    * across merge-on-read deletes and compaction.
    */
  val RowLineageProp = "graft.row-lineage"

  /** Properties registering the exact equality-delete attribution
    * sidecar written by [[GraftTable.computeDeleteAttribution]]: the
    * (snapshot, schema, spec-set) fingerprint it was computed at and
    * the sidecar parquet path. Served by `.partitions` / partition
    * statistics ONLY while the fingerprint still matches — any commit,
    * schema evolution, or spec evolution invalidates the cache back to
    * the NULL-means-unknown answer.
    */
  val EqAttributionSnapProp = "graft.eq-attribution.state"
  val EqAttributionPathProp = "graft.eq-attribution.path"

  /** Set by adoption when the external layout carries AVRO data files —
    * the one format Spark has no vectorized FileFormat for in this
    * build. While set, the DSv2 connector routes scans through the V1
    * bridge (the engine scan decodes avro); a full [[GraftTable.compact]]
    * rewrites every live data file to parquet and clears it, restoring
    * the columnar path. Conservative by design: avro files only ever
    * ENTER via adoption, so the flag never under-reports.
    */
  val HasAvroProp = "graft.scan.has-avro"

  /** Iceberg's data-file write format property (Table Spec:
    * `write.format.default`): `parquet` (the default) or `orc`. The
    * format is PER FILE — flipping the property affects only future
    * writes, existing files keep reading through their manifest-recorded
    * format, and mixed tables scan each group through its own reader.
    * ORC files carry the same footer-derived manifest stats as parquet
    * (see [[OrcFooter]] for the ORC-specific bound suppressions).
    * Restrictions, enforced loudly: row lineage and position-addressed
    * reads (MoR position deletes, `_pos`) require parquet — ORC lacks
    * `_metadata.row_index` in this Spark — so ORC-format tables mutate
    * via copy-on-write or equality deletes.
    */
  val WriteFormatProp = "write.format.default"

  /** `_row_id` lineage column name (Iceberg v3 reserved name). Virtual
    * on freshly appended files (first-row-id + position); physical in
    * files a lineage-preserving rewrite materialized.
    */
  val RowIdCol = "_row_id"

  /** `_last_updated_sequence_number` lineage column name (Iceberg v3):
    * the data sequence number that last wrote the row — the file's own
    * sequence unless a rewrite materialized an older one.
    */
  val LastUpdCol = "_last_updated_sequence_number"

  /** Sentinel for entries not yet bound to a committed snapshot. */
  private val PendingSnapshot = DataFileEntry.PendingSnapshot

  /** Internal column names carrying (file, row-index) identity through a
    * position-annotated read for the MoR delete anti-join.
    */
  private val PosPathCol = "__gf_file_path"
  private val PosIdxCol = "__gf_pos"

  /** Internal column carrying each manifest row's source manifest file
    * (raw URI) through distributed mutation planning.
    */
  private val SrcManifestCol = "__gf_manifest"

  /** Internal column carrying each data row's sequence number through
    * the equality-delete anti-join.
    */
  private val SeqCol = "__gf_seq"

  // ------------------------------------------------------- read core ----
  // Static so the external-layout reader (IcebergInterop) applies the
  // EXACT same alignment and MoR-delete semantics as native scans — two
  // implementations of sequence-scoped delete application would drift.

  /** Schema-aligned read of `(path, schemaId)` files: each schema group
    * is read with its write-time schema, then projected to `readSchema`
    * by FIELD ID (renames resolve, dropped fields null-fill).
    */
  /** Read-side session pin (same documented session-wide contract as
    * [[GraftTable.pinParquetTs]]): graft reads hand Spark explicit LEAF
    * FILE paths whose existence and sizes the manifests already
    * certified, yet InMemoryFileIndex re-stats them — and above the
    * default threshold of 32 paths it launches a whole Spark LISTING JOB
    * to do it (one job per scan-side DataFrame; a scan of an 84-file
    * table paid ~0.2 s per read in job latency alone). 512 keeps the
    * re-stat a driver-side threaded pass for every plan the demo scale
    * produces while leaving genuinely huge plans (100 TB scans reference
    * thousands of files) on the distributed listing the default exists
    * for.
    */
  private def pinReadDiscovery(spark: SparkSession): Unit = {
    // guard (r20 ADVICE): only lift the conf while it sits at Spark's
    // default — an explicit user setting for their own non-graft reads
    // must survive (our own 512 passes the guard idempotently)
    val k = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val cur = spark.conf.get(k, "32")
    if (cur == "32" || cur == "512") spark.conf.set(k, 512)
  }

  /** See [[pinReadDiscovery]] — instance-constructor entry point. */
  private[table] def pinReadDiscoveryFor(spark: SparkSession): Unit =
    pinReadDiscovery(spark)

  private[table] def readAlignedFilesCore(spark: SparkSession,
      meta: TableMetadataV2, files: Seq[(String, Int)],
      readSchema: SchemaV2, withPos: Boolean = false,
      withFile: Boolean = false, withRowPos: Boolean = false,
      withLineage: Boolean = false,
      formatOf: Map[String, String] = Map.empty): DataFrame = {
    pinReadDiscovery(spark)
    val targetSpark0 = toSparkSchema(readSchema)
    val targetSpark = StructType(targetSpark0.fields ++
      (if (withPos) Seq(SparkField(PosPathCol, StringType),
        SparkField(PosIdxCol, LongType)) else Seq.empty) ++
      (if (withFile) Seq(SparkField(FileCol, StringType)) else Seq.empty) ++
      (if (withRowPos) Seq(SparkField(RowPosCol, LongType)) else Seq.empty) ++
      (if (withLineage) Seq(SparkField(RowIdCol, LongType),
        SparkField(LastUpdCol, LongType)) else Seq.empty))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], targetSpark)
    // group by (schema, format): adopted external tables may reference
    // orc data files alongside parquet — each group reads through its
    // own datasource instead of silently parsing everything as parquet
    val groups = files.groupBy(f =>
      (f._2, formatOf.getOrElse(f._1, DataFileEntry.Parquet)))
    groups.map { case ((sid, fmt), es) =>
      if (fmt != DataFileEntry.Parquet) {
        require(fmt == DataFileEntry.Orc || fmt == DataFileEntry.Avro,
          s"unsupported data-file format '$fmt' (${es.head._1}): this " +
            "build reads parquet, orc, and avro data files")
        // ORC lacks _metadata.row_index in this Spark and the avro
        // decode is positionless, so every position-addressed read
        // (MoR position deletes, _pos, lineage) is parquet-only —
        // refuse loudly rather than mis-position rows
        require(!withPos && !withRowPos && !withLineage,
          s"position-addressed reads (MoR position deletes, _pos, row " +
            s"lineage) require parquet data files; ${es.head._1} is $fmt")
      }
      val fileSchema = meta.schemaById(sid).getOrElse(readSchema)
      val readFields = toSparkSchema(fileSchema).fields ++
        // lineage-materialized files carry these as ordinary physical
        // columns (outside the id-tracked table schema); naming them in
        // the read schema projects them straight off the parquet scan
        (if (withLineage) Seq(SparkField(RowIdCol, LongType),
          SparkField(LastUpdCol, LongType)) else Seq.empty)
      val df =
        if (fmt == DataFileEntry.Avro) {
          // no avro DataFrame datasource in this build: plain-Avro
          // decode, one task per file, `_file` synthesized. Prune to
          // the projected columns FIRST — the decode is row-by-row,
          // so a wide fileSchema would convert every column per row
          val wanted = readSchema.fields.map(_.id).toSet
          AvroDataRead.read(spark, es.map(_._1),
            fileSchema.copy(fields =
              fileSchema.fields.filter(f => wanted.contains(f.id))),
            withFile = withFile)
        }
        else spark.read
          .schema(StructType(readFields))
          .format(fmt)
          .load(es.map(_._1): _*)
      val cols = readSchema.fields.map { f =>
        fileSchema.fields.find(_.id == f.id) match {
          case Some(ff) =>
            alignColumn(col(ff.name), ff.fieldType, f.fieldType).as(f.name)
          case None =>
            // v3 initial-default: rows written before the column existed
            // read the declared default instead of null
            defaultLiteral(f.initialDefault, f.fieldType).as(f.name)
        }
      } ++ (if (withPos) Seq(
        // raw (undecoded) file path: both sides of the delete anti-join
        // come from _metadata.file_path, so the encoding cancels out
        col("_metadata.file_path").as(PosPathCol),
        col("_metadata.row_index").as(PosIdxCol)) else Seq.empty) ++
        (if (withFile) Seq(
          // user-facing virtual column: the DECODED on-disk path, same
          // form the manifest stores (and the native DSv2 path emits);
          // the avro decode already carries it as a literal per file
          (if (fmt == DataFileEntry.Avro) col(FileCol)
          else decodePathCol(col("_metadata.file_path"))).as(FileCol))
        else Seq.empty) ++
        // original in-file position (file-absolute even under parquet
        // row-group skipping — Spark's reader tracks it)
        (if (withRowPos) Seq(col("_metadata.row_index").as(RowPosCol))
        else Seq.empty) ++
        (if (withLineage) Seq(col(RowIdCol), col(LastUpdCol))
        else Seq.empty)
      df.select(cols: _*)
    }.reduce(_.union(_))
  }

  /** Typed literal for a spec single-value default (string rendering);
    * None → typed null. Spark's string cast covers every primitive the
    * default surface admits (int/long/float/double/decimal/boolean/
    * string/date/timestamp).
    */
  private[table] def defaultLiteral(v: Option[String],
      t: IceType): Column =
    v.map(s => lit(s).cast(toSparkType(t)))
      .getOrElse(lit(null).cast(toSparkType(t)))

  /** `_file` metadata-column name (Iceberg-parity virtual column). */
  val FileCol = "_file"

  /** `_pos` metadata-column name: the row's ORIGINAL position within its
    * data file (survives MoR delete application — it is the position an
    * Iceberg position-delete would reference).
    */
  val RowPosCol = "_pos"

  /** Codegen'd per-row path decode: a StaticInvoke expression compiles
    * to a direct static call inside WholeStageCodegen, unlike a Scala
    * UDF which would break fusion for the whole stage it appears in.
    */
  private[table] def decodePathCol(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        PathCodec.getClass, StringType, "decode",
        Seq(org.apache.spark.sql.graft.Bridge.expression(c)),
        inputTypes = Seq(StringType), propagateNull = true,
        returnNullable = false))

  /** Canonical rendered form of a partition MAP column: `k=v` pairs
    * sorted by key, comma-joined, null values as the literal "null".
    * The one rendering `.partitions`, the partition-statistics writer,
    * and delete attribution all share — the strings must join exactly.
    */
  private[table] def renderPartitionCol(m: Column): Column =
    concat_ws(",", transform(array_sort(map_entries(m)),
      e => concat(e("key"), lit("="),
        coalesce(e("value"), lit("null")))))

  /** INJECTIVE join form of a partition MAP column: sorted-key JSON.
    * The display rendering above is not injective (a literal "null"
    * value collides with NULL; a value containing ",k=" collides with
    * a neighboring entry) — joining attribution on it could double-
    * count deletes across colliding tuples. JSON escaping keeps
    * distinct tuples distinct; attribution joins on THIS form only.
    */
  private[table] def partitionKeyCol(m: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(m))))

  /** Codegen'd decode + canonicalize (see [[PathCodec.decodeCanon]]). */
  private[table] def decodeCanonCol(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        PathCodec.getClass, StringType, "decodeCanon",
        Seq(org.apache.spark.sql.graft.Bridge.expression(c)),
        inputTypes = Seq(StringType), propagateNull = true,
        returnNullable = false))

  /** All deleted (file_path, pos) pairs of a position-delete entry set —
    * parquet entries as a parquet scan, deletion vectors decoded on
    * executors — in the raw `_metadata.file_path` form scans observe.
    */
  private[table] def posDeletePositionsCore(spark: SparkSession,
      posDels: Seq[DataFileEntry]): DataFrame = {
    val (dvs, parqs) = posDels.partition(_.dv.isDefined)
    // deletes are correctness-bearing: an external layout declaring a
    // non-parquet position-delete FILE must refuse, not misread it
    parqs.find(_.format != DataFileEntry.Parquet).foreach(e =>
      throw new IllegalArgumentException(
        s"position-delete file ${e.path} is ${e.format}; this build " +
          "reads parquet position deletes only"))
    val parts = Seq(
      if (parqs.isEmpty) None
      else Some(spark.read.parquet(parqs.map(_.path).distinct: _*)
        .select(col("file_path").cast(StringType),
          col("pos").cast(LongType))),
      if (dvs.isEmpty) None
      else Some(Dv.positionsDf(spark,
        dvs.map(e => (e.dv.get, e.path))))).flatten
    parts.reduce(_.unionByName(_))
  }

  /** Anti-join position deletes (parquet (file_path, pos) files AND
    * deletion vectors) against a position-annotated read. Delete sets
    * are small relative to data — Spark broadcasts them and the scan
    * stays map-side.
    */
  private[table] def applyPosDeletesCore(spark: SparkSession, df: DataFrame,
      posDels: Seq[DataFileEntry]): DataFrame =
    if (posDels.isEmpty) df
    else {
      val d = posDeletePositionsCore(spark, posDels)
        .select(col("file_path").as(PosPathCol), col("pos").as(PosIdxCol))
      df.join(d, Seq(PosPathCol, PosIdxCol), "left_anti")
    }

  /** Anti-join equality deletes against a read carrying `SeqCol` (the
    * per-row data sequence number); see the instance doc on
    * [[GraftTable.applyEqDeletesSeq]] semantics.
    */
  private[table] def applyEqDeletesSeqCore(spark: SparkSession, df: DataFrame,
      eqDels: Seq[DataFileEntry]): DataFrame =
    eqDels.groupBy(_.eqColumns).foldLeft(df) { case (d, (cols, ds)) =>
      val keys = eqKeySets(spark, cols, ds)
      d.join(keys, eqMatchCond(cols), "left_anti")
    }

  /** Rows of `df` an equality delete WOULD remove (the semi-join dual of
    * applyEqDeletesSeqCore) — rows matching ANY column-set's keys under
    * the same sequence scoping. Used to materialize eq deletes as
    * positions.
    */
  private[table] def eqDeleteMatchesCore(spark: SparkSession, df: DataFrame,
      eqDels: Seq[DataFileEntry]): DataFrame =
    eqDels.groupBy(_.eqColumns).map { case (cols, ds) =>
      df.join(eqKeySets(spark, cols, ds), eqMatchCond(cols), "left_semi")
    }.reduce(_.unionByName(_))

  private def eqKeySets(spark: SparkSession, cols: Seq[String],
      ds: Seq[DataFileEntry]): DataFrame = {
    // deletes are correctness-bearing: an external layout declaring a
    // non-parquet equality-delete FILE must refuse, not misread it
    ds.find(_.format != DataFileEntry.Parquet).foreach(e =>
      throw new IllegalArgumentException(
        s"equality-delete file ${e.path} is ${e.format}; this build " +
          "reads parquet equality deletes only"))
    ds.groupBy(_.sequenceNumber).map { case (dseq, dfs) =>
      spark.read.parquet(dfs.map(_.path).distinct: _*)
        .select(cols.map(c => col(c).as(s"__gfeq_$c")): _*)
        .withColumn("__gfeq_seq", lit(dseq))
    }.reduce(_.unionByName(_))
      .groupBy(cols.map(c => col(s"__gfeq_$c")): _*)
      .agg(max(col("__gfeq_seq")).as("__gfeq_seq"))
  }

  private def eqMatchCond(cols: Seq[String]): Column =
    cols.map(c => col(c) <=> col(s"__gfeq_$c"))
      .reduce(_ && _) && col("__gfeq_seq") > col(SeqCol)

  /** The deletes-applied read over explicit delete sets: position deletes
    * anti-join on (file, pos); equality deletes once per column-set with
    * sequence scoping (a delete applies iff strictly newer than the row).
    */
  private[table] def readDeletesAppliedCore(spark: SparkSession,
      meta: TableMetadataV2, files: Seq[(String, Int, Long)],
      readSchema: SchemaV2, posDels: Seq[DataFileEntry],
      eqDels0: Seq[DataFileEntry], withFile: Boolean = false,
      withRowPos: Boolean = false,
      withLineage: Boolean = false,
      formatOf: Map[String, String] = Map.empty): DataFrame = {
    // a delete at or below EVERY planned file's sequence can never apply
    val minSeq = files.map(_._3).minOption.getOrElse(Long.MaxValue)
    val eqDels = eqDels0.filter(_.sequenceNumber > minSeq)
    def posApplied(fs: Seq[(String, Int)]): DataFrame = if (fs.isEmpty)
      readAlignedFilesCore(spark, meta, Seq.empty, readSchema,
        withFile = withFile, withRowPos = withRowPos,
        withLineage = withLineage)
    else {
      // non-parquet files cannot take the position-annotated branch
      // (no _metadata.row_index) — they read plain, which is correct
      // ONLY while no position delete targets them; verify that and
      // refuse loudly otherwise rather than resurrect deleted rows
      val (nonPq, pq) = fs.partition(f =>
        formatOf.getOrElse(f._1, DataFileEntry.Parquet) !=
          DataFileEntry.Parquet)
      val parts = Seq(
        if (pq.isEmpty) None
        else if (posDels.isEmpty)
          Some(readAlignedFilesCore(spark, meta, pq, readSchema,
            withFile = withFile, withRowPos = withRowPos,
            withLineage = withLineage, formatOf = formatOf))
        else Some(applyPosDeletesCore(spark,
          readAlignedFilesCore(spark, meta, pq, readSchema, withPos = true,
            withFile = withFile, withRowPos = withRowPos,
            withLineage = withLineage, formatOf = formatOf),
          posDels).drop(PosPathCol, PosIdxCol)),
        if (nonPq.isEmpty) None
        else {
          if (posDels.nonEmpty) {
            val canon = nonPq.map(f => canonPath(decodePath(f._1))).toSet
            val dvHit = posDels.exists(_.dv.exists(d =>
              canon.contains(canonPath(decodePath(d.dataFile)))))
            val parqs = posDels.filter(_.dv.isEmpty)
            lazy val pqHit = parqs.nonEmpty && {
              val delSchema = StructType(Seq(
                SparkField("file_path", StringType),
                SparkField("pos", LongType)))
              spark.read.schema(delSchema).parquet(parqs.map(_.path): _*)
                .select("file_path").distinct().collect()
                .exists(r => canon.contains(canonPath(decodePath(
                  r.getString(0)))))
            }
            require(!dvHit && !pqHit,
              "position deletes reference non-parquet data files — " +
                "unsupported (no _metadata.row_index outside parquet)")
          }
          Some(readAlignedFilesCore(spark, meta, nonPq, readSchema,
            withFile = withFile, withRowPos = withRowPos,
            withLineage = withLineage, formatOf = formatOf))
        }).flatten
      parts.reduce(_.unionByName(_))
    }
    if (eqDels.isEmpty || files.isEmpty)
      posApplied(files.map(f => (f._1, f._2)))
    else {
      val base = files.groupBy(_._3).map { case (seq, fs) =>
        posApplied(fs.map(f => (f._1, f._2))).withColumn(SeqCol, lit(seq))
      }.reduce(_.unionByName(_))
      applyEqDeletesSeqCore(spark, base, eqDels).drop(SeqCol)
    }
  }

  /** The lineage-annotated read over an explicit plan of (path,
    * schemaId, sequenceNumber, firstRowId): table columns + `_row_id` +
    * `_last_updated_sequence_number`, deletes applied. Files with a
    * first-row-id serve lineage VIRTUALLY (base + position via a
    * broadcast of the plan); files a lineage-preserving rewrite
    * produced carry both columns physically and project them straight
    * off the parquet scan — so a fully-compacted table's lineage read
    * is a single join-free map-side scan. Shared by native scans and
    * the external-layout (Iceberg interop) read, so id semantics cannot
    * drift between the two paths.
    */
  private[table] def lineageReadCore(spark: SparkSession,
      meta: TableMetadataV2,
      planned: Seq[(String, Int, Long, Option[Long])], schema: SchemaV2,
      posDels: Seq[DataFileEntry],
      eqDels: Seq[DataFileEntry]): DataFrame = {
    import spark.implicits._
    val (virtuals, materialized) = planned.partition(_._4.isDefined)
    val outCols = toSparkSchema(schema).fieldNames.toSeq ++
      Seq(RowIdCol, LastUpdCol)
    val parts = Seq(
      if (virtuals.isEmpty) None
      else {
        // per-file constants attach via a BROADCAST join on the decoded
        // path (`_file` and entry paths both come from decodePath, so
        // exact equality holds) — a codegen'd hash join
        val baseDf = broadcast(virtuals.map(f => (f._1, f._4.get, f._3))
          .toDF(FileCol, "__lin_base", "__lin_fseq"))
        Some(readDeletesAppliedCore(spark, meta,
            virtuals.map(f => (f._1, f._2, f._3)), schema, posDels,
            eqDels, withFile = true, withRowPos = true)
          .join(baseDf, Seq(FileCol))
          .withColumn(RowIdCol, col("__lin_base") + col(RowPosCol))
          .withColumn(LastUpdCol, col("__lin_fseq"))
          .select(outCols.map(col): _*))
      },
      if (materialized.isEmpty) None
      else Some {
        // group by data sequence so the per-file "null last-updated
        // means this file's own commit" fallback (v3 contract) is a
        // LITERAL per group — no per-file join at all
        materialized.groupBy(_._3).map { case (seq, fs) =>
          readDeletesAppliedCore(spark, meta,
              fs.map(f => (f._1, f._2, f._3)), schema, posDels, eqDels,
              withLineage = true)
            .withColumn(LastUpdCol, coalesce(col(LastUpdCol), lit(seq)))
        }.reduce(_.unionByName(_)).select(outCols.map(col): _*)
      }).flatten
    parts.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(toSparkSchema(schema).fields ++ Seq(
          SparkField(RowIdCol, LongType),
          SparkField(LastUpdCol, LongType)))))
  }

  /** Canonical string form of a partition tuple (sorted key order;
    * \u0001 marks null). The driver-side and column-side forms MUST
    * agree — distributed mutation planning compares one to the other.
    */
  private[table] def canonPartition(p: Map[String, Option[String]]): String =
    p.toSeq.sortBy(_._1).map { case (k, v) =>
      k + "\u0000" + v.getOrElse("\u0001") }.mkString("\u0002")

  /** Column form of [[canonPartition]] over a manifest row's `partition`
    * map column.
    */
  private[table] def canonPartitionCol: Column =
    array_join(transform(array_sort(map_entries(col("partition"))),
      e => concat(e.getField("key"), lit("\u0000"),
        coalesce(e.getField("value"), lit("\u0001")))), "\u0002")

  /** An executor-written manifest shard (JSONL of pending entries) plus
    * the rollup counts the manifest list records.
    */
  case class ShardRef(path: String, entryCount: Long, recordCount: Long,
      content: Int = 0,
      // row lineage: fresh rows (appends, MERGE inserts) get first-row-id
      // bases assigned at commit; rewrites carry materialized ids instead
      lineageFresh: Boolean = false,
      // distinct partition tuples of the shard's entries (≤ SummaryCap,
      // computed in the same distributed rollup) — feeds the manifest
      // list's partition summaries for manifest-level pruning
      partitions: Option[Seq[PartitionTuple]] = None)

  /** What a mutation hands to commitSnapshot: carried-over driver-side
    * entries (from existing manifests) plus executor-written shard
    * manifests for freshly written data.
    */
  case class PendingAdds(entries: Seq[DataFileEntry], shards: Seq[ShardRef])

  object PendingAdds {
    val empty: PendingAdds = PendingAdds(Seq.empty, Seq.empty)
  }

  /** Leaf primitive stat paths of a schema: top-level primitives plus
    * dotted struct leaves (arbitrary nesting). Arrays/maps carry no
    * min/max semantics and are skipped.
    */
  private[table] def statPaths(schema: StructType): Seq[(String, DataType)] = {
    def walk(prefix: String, st: StructType): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => walk(p, s)
          case dt @ (_: NumericType | StringType | TimestampType |
              TimestampNTZType | DateType | BooleanType) => Seq(p -> dt)
          case _ => Seq.empty
        }
      }
    walk("", schema)
  }

  /** _metadata.file_path is URI-encoded (space→%20, literal %→%25);
    * decode to the on-disk path or reads of escaped partition dirs
    * (e.g. identity timestamps, ':'→%3A in the dir name) break.
    */
  /** Canonical absolute path — the single comparison form for manifest
    * and data-file identity (mutation planning decides manifest reuse by
    * it, orphan collection decides deletion by it).
    */
  private[table] def canonPath(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** Align a file column to the read-schema type INSIDE nested structs:
    * subfields match by FIELD ID (rename-safe), subfields the file
    * predates surface null — the same id-based alignment the top level
    * gets, applied recursively. Identical types pass through untouched;
    * a null struct stays null (not a struct of nulls).
    */
  private[table] def alignColumn(c: Column, fileT: IceType,
      readT: IceType): Column =
    if (fileT == readT) c
    else (fileT, readT) match {
      case (TStruct(ffs), TStruct(rfs)) =>
        val rebuilt = struct(rfs.map { rf =>
          ffs.find(_.id == rf.id) match {
            case Some(ff) => alignColumn(c.getField(ff.name),
              ff.fieldType, rf.fieldType).as(rf.name)
            case None => lit(null).cast(toSparkType(rf.fieldType)).as(rf.name)
          }
        }: _*)
        when(c.isNull, lit(null).cast(toSparkType(readT))).otherwise(rebuilt)
      // primitive promotion (int->long, float->double, decimal widen):
      // the file group was read under its write-time type — an exact
      // widening cast aligns it to the promoted read type
      case _ => c.cast(toSparkType(readT))
    }

  /** The spec an entry's partition values were derived under — static so
    * the distributed Avro export can resolve it on executors. See the
    * instance [[GraftTable.specForEntry]] doc for the fallback rules.
    */
  private[table] def specForEntryOf(specs: Seq[PartitionSpec],
      defaultSpec: PartitionSpec, e: DataFileEntry): PartitionSpec =
    e.specId.flatMap(id => specs.find(_.specId == id))
      .orElse {
        if (specs.size <= 1) Some(defaultSpec)
        else specs.find(_.fields.map(_.name).toSet == e.partition.keySet)
      }.getOrElse(PartitionSpec.unpartitioned)

  /** Export ONE source manifest's entries as Avro manifests (one per
    * (schema, spec) group), returning serializable list-row surrogates.
    * Runs on EXECUTORS — captures no table instance.
    */
  private[table] def exportOneManifest(r: ManifestRef, idx: Int,
      dir: String, specs: Seq[PartitionSpec], defaultSpec: PartitionSpec,
      schemas: Seq[SchemaV2], currentSchema: SchemaV2, snapshotId: Long)
      : Seq[(String, Long, Int, Long, Long, Long, Long, Int,
        Option[Seq[AvroManifest.FieldSummary]])] =
    r.entries.groupBy(e =>
      (e.schemaId, specForEntryOf(specs, defaultSpec, e).specId))
      .toSeq.sortBy(_._1).zipWithIndex.map {
        case (((sid, specId), es), g) =>
          val spec = specs.find(_.specId == specId)
            .getOrElse(PartitionSpec.unpartitioned)
          val specNames = spec.fields.map(_.name).toSet
          es.filter(_.isData).foreach { e =>
            require(e.partition.keySet == specNames,
              s"data file ${e.path} has partition keys " +
                s"${e.partition.keySet} but spec $specId defines " +
                s"$specNames — written under an unregistered spec?")
          }
          val schema = schemas.find(_.schemaId == sid)
            .getOrElse(currentSchema)
          val p = Paths.get(dir, f"manifest-$idx%05d-$g%02d.avro")
          val len = AvroManifest.writeManifest(p, es, schema, spec,
            snapshotId, r.content)
          (p.toString, len, r.content,
            r.addedSequenceNumber.getOrElse(es.map(_.sequenceNumber).max),
            es.map(_.sequenceNumber).min, es.size.toLong,
            es.map(_.recordCount).sum, spec.specId,
            AvroManifest.partitionSummaries(es, spec, schema))
      }

  /** Whether a type contains `time` anywhere (write admission). */
  private[table] def containsTime(t: IceType): Boolean = t match {
    case TTime => true
    case TStruct(fs) => fs.exists(f => containsTime(f.fieldType))
    case TList(_, _, el) => containsTime(el)
    case TMap(_, k, _, _, v) => containsTime(k) || containsTime(v)
    case _ => false
  }

  /** A directory's immediate children — the walk units the distributed
    * orphan scan fans out over executors (O(children) driver work).
    */
  private[table] def listChildren(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val ls = Files.list(dir)
      try ls.iterator.asScala.map(_.toString).toList finally ls.close()
    }

  /** Recursively list regular files under `root` (a directory or a
    * single file) older than `cutoff` and matching `pred`, as canonical
    * paths. Static so executor closures capture no table instance.
    */
  private[table] def walkFilesOlder(root: String, cutoff: Long,
      pred: Path => Boolean): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) return Seq.empty
    val s = Files.walk(r)
    try s.iterator.asScala
      .filter(p => Files.isRegularFile(p) && pred(p) &&
        Files.getLastModifiedTime(p).toMillis < cutoff)
      .map(p => canonPath(p.toString)).toList
    finally s.close()
  }

  private[table] val isDataCandidate: Path => Boolean = p => {
    val n = p.getFileName.toString
    n.endsWith(".parquet") || n.endsWith(".orc") ||
      // manifests/manifest-lists are .avro too but live in metadata/,
      // never under data dirs; only sweep data-plane avro (defensive)
      (n.endsWith(".avro") &&
        !n.startsWith("manifest-") && !n.startsWith("snap-")) ||
      // deletion-vector sidecars live in the data plane (they are
      // content=1 entry paths): abandoned ones must be sweepable
      (n.endsWith(".puffin") && Option(p.getParent).exists(
        _.getFileName.toString.startsWith("dv-")))
  }

  private[table] val isMetaCandidate: Path => Boolean = p => {
    val n = p.getFileName.toString
    n.startsWith("manifest-") || n.endsWith(".manifest-list.json") ||
      (n.endsWith(".bloom") && Option(p.getParent).exists(
        _.getFileName.toString.startsWith("blooms-"))) ||
      (n.startsWith("part-") && Option(p.getParent).exists(
        _.getFileName.toString.startsWith("manifest-shards-")))
  }

  private[table] def decodePath(raw: String): String =
    try new java.net.URI(raw).getPath
    catch { case _: Exception => raw.stripPrefix("file:") }

  /** Inverse of [[decodePath]] for local-FS paths: the qualified raw URI
    * form Spark's `_metadata.file_path` serves (`file:` scheme, percent-
    * encoded path). Used when importing spec-form decoded paths (e.g. a
    * manifest's `referenced_data_file`) into the raw-form join domain.
    * Paths already carrying a scheme pass through unchanged.
    */
  private[table] def encodePath(decoded: String): String =
    if (decoded.contains(":/")) decoded
    else new java.net.URI("file", null, decoded, null).toString

  /** Parse `name=value` partition dirs out of a written file path. */
  private[table] def parsePartition(path: String,
      spec: PartitionSpec): Map[String, Option[String]] =
    if (spec.fields.isEmpty) Map.empty
    else {
      val segs = path.split('/').filter(_.contains('='))
        .map { s =>
          val Array(k, v) = s.split("=", 2)
          // URLDecoder turns literal '+' into space, but Hive-style dir
          // escaping never encodes spaces as '+' — protect it first
          k -> (if (v == "__HIVE_DEFAULT_PARTITION__") None
          else Some(java.net.URLDecoder.decode(
            v.replace("+", "%2B"), "UTF-8")))
        }.toMap
      spec.fields.map(pf => pf.name -> segs.getOrElse(pf.name, None)).toMap
    }

  /** One aggregated stats row → one manifest-entry JSON line. Runs on
    * EXECUTORS (static: captures nothing), so manifests are written where
    * the stats are computed.
    */
  /** Write one manifest shard holding this task's entries (attempt-
    * unique name; a failed or speculative attempt's file is orphaned and
    * referenced by nothing) and emit its single rollup line — entry
    * count, record count, distinct partition tuples. Static: captures
    * nothing, runs on EXECUTORS; the driver only ever parses the rollup
    * lines (see [[parseRollups]]).
    */
  private[table] def shardRollup(entries: Iterator[DataFileEntry],
      shardDirStr: String,
      conf: org.apache.hadoop.conf.Configuration): Iterator[String] = {
    if (!entries.hasNext) return Iterator.empty
    var n = 0L
    var rc = 0L
    val cap = ManifestRef.SummaryCap
    val tuples = scala.collection.mutable.LinkedHashSet.empty[PartitionTuple]
    val p = new org.apache.hadoop.fs.Path(shardDirStr,
      s"shard-${java.util.UUID.randomUUID.toString.take(12)}.jsonl")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try entries.foreach { e =>
      out.write((graft.model.Json.write(e.toJson) + "\n").getBytes("UTF-8"))
      n += 1
      rc += e.recordCount
      if (tuples.size <= cap) tuples += PartitionTuple(e.specId, e.partition)
    } finally out.close()
    // local FS writes go through ChecksumFileSystem — don't leave a
    // .crc sidecar per shard accumulating in the table's metadata dir
    // (one shard per commit on a streaming sink)
    fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        c.delete(c.getChecksumFile(p), false); ()
      case _ => ()
    }
    val o = graft.model.Json.obj
    o.put("path", p.toString)
    o.put("n", n)
    o.put("rc", rc)
    // over-cap or information-free tuple sets carry no summary (None =
    // the manifest is always read)
    if (tuples.size <= cap && tuples.nonEmpty &&
        tuples.exists(_.partition.nonEmpty)) {
      val a = o.putArray("pts")
      tuples.foreach(t => a.add(t.toJson))
    }
    Iterator(graft.model.Json.write(o))
  }

  /** Sweep shard files under `shardDir` that no returned rollup line
    * references: a failed or speculative task attempt's attempt-unique
    * file is orphaned (referenced by nothing) and nothing else ever
    * deletes it, so retried commits would slowly accumulate junk JSONL
    * inside metadata/manifest-shards-*. One dir listing right after the
    * rollup collect; best-effort (an orphan that survives — e.g. a
    * speculative attempt finishing its create after the sweep — is
    * inert, just dead bytes).
    */
  private[graft] def sweepOrphanShards(shardDir: java.nio.file.Path,
      refs: Seq[ShardRef]): Unit = {
    val live = refs.map(r => new java.io.File(r.path).getName).toSet
    try {
      val ls = Files.list(shardDir)
      try ls.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("shard-") && !live.contains(n))
          Files.deleteIfExists(p)
      } finally ls.close()
    } catch { case _: java.io.IOException => () }
  }

  /** Driver-side inverse of [[shardRollup]]'s emitted lines. */
  private[table] def parseRollups(lines: Seq[String]): Seq[ShardRef] =
    lines.map { line =>
      val o = graft.model.Json.parse(line)
      val summary = Option(o.get("pts")).map { a =>
        import scala.jdk.CollectionConverters._
        a.elements.asScala.toSeq.map(PartitionTuple.fromJson)
      }
      ShardRef(o.path("path").asText, o.path("n").asLong,
        o.path("rc").asLong, partitions = summary)
    }

  /** Manifest entry for a freshly written parquet file built from its
    * FOOTER alone: per-column min/max/null-count merged across row
    * groups, plus row count and file size — O(footer bytes) per file
    * instead of re-scanning the data. Values convert to the exact same
    * normalized string encoding the scan-based pass produces (both call
    * Pruning.normalize; FooterStatsSpec pins byte equality), so the two
    * paths are interchangeable. SOUNDNESS RULES: a column whose footer
    * carries NO statistics at all, or an inexact null count, is OMITTED
    * from the stats map (missing stats are never pruned on and never
    * certify a count); a column whose BOUNDS are suppressed (huge
    * binaries, NaN-containing doubles) but whose null count is exact
    * keeps (None, None, nulls) — boundless stats never prune a range
    * filter while IS [NOT] NULL pruning stays exact. Worst case is a
    * file read that exact stats would have skipped, never a skipped
    * file that held matching rows.
    */
  private[table] def footerEntry(pathStr: String,
      conf: org.apache.hadoop.conf.Configuration,
      statFields: Seq[(String, DataType)], schemaId: Int,
      spec: PartitionSpec): DataFileEntry = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    // Path built through a proper URI: partition dir names carry LITERAL
    // percent signs (Hive escaping), which Path(String) would misparse
    val hPath = new org.apache.hadoop.fs.Path(
      java.net.URI.create(encodePath(pathStr)))
    val inFile = HadoopInputFile.fromPath(hPath, conf)
    val reader = ParquetFileReader.open(inFile)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      val byName = statFields.toMap
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, org.apache.parquet.column.statistics.Statistics[_]]
      val bad = scala.collection.mutable.Set.empty[String]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          if (byName.contains(name) && !bad(name)) {
            val s = cc.getStatistics
            // one chunk without usable stats or an exact null count
            // poisons the whole column — absent stats are sound, wrong
            // stats are not
            if (s == null || s.isEmpty || !s.isNumNullsSet) bad += name
            else acc.get(name) match {
              case None =>
                val copy = org.apache.parquet.column.statistics.Statistics
                  .createStats(cc.getPrimitiveType)
                copy.mergeStatistics(s)
                acc(name) = copy
              case Some(m) => m.mergeStatistics(s)
            }
          }
        }
      }
      val stats = acc.iterator.filterNot(kv => bad(kv._1))
        .map { case (name, s) =>
          val dt = byName(name)
          val (mn, mx) =
            if (!s.hasNonNullValue) (None, None) // all-null column
            else (Pruning.normalize(footerValue(s.genericGetMin, dt), dt),
              Pruning.normalize(footerValue(s.genericGetMax, dt), dt))
          name -> ColStats(mn, mx, s.getNumNulls)
        }.toMap
      DataFileEntry(pathStr, rowCount, PendingSnapshot, 0L, schemaId,
        parsePartition(pathStr, spec), stats, fileSize = inFile.getLength,
        specId = Some(spec.specId))
    } finally reader.close()
  }

  /** Row count of one parquet file from its footer. `decodedPath` is the
    * on-disk (manifest-domain) form; the Path is rebuilt through a
    * proper URI so literal '%' in hive-escaped dir names survives.
    */
  private[table] def footerRowCount(decodedPath: String,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val p = new org.apache.hadoop.fs.Path(
      java.net.URI.create(encodePath(decodedPath)))
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
    try r.getRecordCount
    finally r.close()
  }

  /** Footer statistics value → the Spark-typed value the scan aggregate
    * would have produced for the same column, so Pruning.normalize
    * renders the identical canonical string. Int/long already match
    * normalize's date/timestamp branches; binaries become UTF8 strings
    * or scaled decimals.
    */
  private def footerValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (b: org.apache.parquet.io.api.Binary, d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), d.scale)
    case (b: org.apache.parquet.io.api.Binary, _) => b.toStringUsingUTF8
    case (i: java.lang.Integer, d: DecimalType) =>
      java.math.BigDecimal.valueOf(i.longValue, d.scale)
    case (l: java.lang.Long, d: DecimalType) =>
      java.math.BigDecimal.valueOf(l.longValue, d.scale)
    case (other, _) => other
  }

  private[table] def statsRowToEntry(r: Row,
      statFields: Seq[(String, DataType)], schemaId: Int,
      spec: PartitionSpec, bloomCols: Seq[String] = Seq.empty,
      bloomDir: String = "", rowIdOffset: Option[Long] = None,
      format: String = DataFileEntry.Parquet)
      : DataFileEntry = {
    val path = decodePath(r.getAs[String]("__path"))
    val stats = statFields.map { case (name, dt) =>
      name -> ColStats(
        Pruning.normalize(r.getAs[Any](s"min::$name"), dt),
        Pruning.normalize(r.getAs[Any](s"max::$name"), dt),
        r.getAs[Long](s"nulls::$name"))
    }.toMap
    // bloom sidecar: written HERE on the executor, next to the stats that
    // sized it — the manifest entry carries only {path, off, len} ranges
    val bloomRef = {
      val bytes = bloomCols.flatMap(c =>
        Option(r.getAs[Array[Byte]](s"bloom::$c")).map(c -> _))
      if (bytes.isEmpty) None
      else {
        val dir = Paths.get(bloomDir)
        Files.createDirectories(dir)
        val f = dir.resolve(java.util.UUID.randomUUID.toString + ".bloom")
        val out = Files.newOutputStream(f)
        var off = 0L
        val cols = Seq.newBuilder[(String, (Long, Long))]
        try bytes.foreach { case (c, b) =>
          out.write(b)
          cols += c -> (off, b.length.toLong)
          off += b.length
        } finally out.close()
        Some(Blooms.BloomRef(f.toString, cols.result().toMap))
      }
    }
    DataFileEntry(path, r.getAs[Long]("cnt"), PendingSnapshot,
      0L, schemaId, parsePartition(path, spec), stats,
      fileSize = r.getAs[Long]("__size"), specId = Some(spec.specId),
      bloom = bloomRef, rowIdOffset = rowIdOffset, format = format)
  }

  /** Inverse of the manifest-dataset read: one manifest DF row back to a
    * DataFileEntry (all fields, including equality columns and bloom
    * refs). Runs on EXECUTORS during manifest consolidation — the driver
    * never materializes entry lists.
    */
  /** (path → format) for the non-parquet entries only — empty for pure
    * native tables, so the common case carries no per-file driver map.
    */
  private[table] def fmtOf(entries: Seq[DataFileEntry]): Map[String, String] =
    entries.filter(_.format != DataFileEntry.Parquet)
      .map(e => e.path -> e.format).toMap

  private[table] def manifestRowToEntry(r: Row): DataFileEntry = {
    def opt[T](name: String)(get: Int => T): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(get(i))
    }
    DataFileEntry(
      path = r.getAs[String]("path"),
      recordCount = r.getAs[Long]("record-count"),
      snapshotId = r.getAs[Long]("snapshot-id"),
      sequenceNumber = r.getAs[Long]("sequence-number"),
      schemaId = r.getAs[Int]("schema-id"),
      partition = opt("partition")(i => r.getMap[String, String](i))
        .map(_.toMap.map { case (k, v) => k -> Option(v) })
        .getOrElse(Map.empty),
      stats = opt("stats")(i => r.getMap[String, Row](i))
        .map(_.toMap.map { case (k, s) =>
          k -> ColStats(Option(s.getAs[String]("min")),
            Option(s.getAs[String]("max")), s.getAs[Long]("nulls"))
        }).getOrElse(Map.empty),
      content = opt("content")(r.getInt).getOrElse(0),
      fileSize = opt("file-size")(r.getLong).getOrElse(0L),
      eqColumns = opt("equality-columns")(i => r.getSeq[String](i))
        .getOrElse(Seq.empty),
      specId = opt("spec-id")(r.getInt),
      bloom = opt("bloom")(i => r.getStruct(i)).map { b =>
        Blooms.BloomRef(b.getAs[String]("path"),
          Option(b.getAs[scala.collection.Map[String, Row]]("cols"))
            .map(_.toMap.map { case (k, c) =>
              k -> (c.getAs[Long]("off"), c.getAs[Long]("len"))
            }).getOrElse(Map.empty))
      },
      dv = opt("dv")(i => r.getStruct(i)).map { d =>
        Dv.DvRef(d.getAs[String]("data-file"), d.getAs[Long]("off"),
          d.getAs[Long]("len"))
      },
      firstRowId = opt("first-row-id")(r.getLong),
      rowIdOffset = opt("row-id-offset")(r.getLong),
      format = opt("format")(r.getString).getOrElse(DataFileEntry.Parquet))
  }

  private def newSnapshotId(): Long =
    java.util.UUID.randomUUID.getMostSignificantBits & Long.MaxValue

  def load(spark: SparkSession, location: String): GraftTable =
    new GraftTable(spark, location)

  /** Load with a non-default metadata IO (the REST catalog mode routes
    * commits through the REST service instead of file CREATE_NEW).
    */
  def load(spark: SparkSession, location: String,
      io: MetadataIo): GraftTable =
    new GraftTable(spark, location, io)

  /** Create a new table (fails if metadata already exists). Partitioning is
    * given as (sourceColumn, transform, partitionFieldName).
    */
  def create(spark: SparkSession, location: String, schema: StructType,
      partitionBy: Seq[(String, Transform, String)] = Seq.empty,
      sortOrder: Seq[(String, Transform)] = Seq.empty,
      properties: Map[String, String] = Map.empty): GraftTable = {
    val iceSchema = toIceSchema(schema, schemaId = 0)
    partitionBy.foreach { case (_, _, name) =>
      // an identity partition named like its source column would shadow
      // the data column at write time (partitionBy moves it into the
      // directory only) and read back all-null — reject loudly
      require(iceSchema.fieldByName(name).isEmpty,
        s"partition field name '$name' collides with a schema column; " +
          "use a distinct name (e.g. '" + name + "_p')")
    }
    val specFields = partitionBy.zipWithIndex.map {
      case ((src, t, name), i) =>
        val f = iceSchema.fieldByName(src).getOrElse(
          throw new IllegalArgumentException(s"no column $src"))
        PartitionField(f.id, 1000 + i, name, t)
    }
    val order =
      if (sortOrder.isEmpty) SortOrder.unsorted
      else SortOrder(1, sortOrder.map { case (src, t) =>
        val f = iceSchema.fieldByName(src).get
        SortField(f.id, t, SortAsc, NullsFirst)
      })
    val meta = TableMetadataV2(
      tableUuid = java.util.UUID.randomUUID.toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis,
      lastColumnId = maxFieldId(iceSchema), // includes NESTED field ids
      schemas = Seq(iceSchema),
      currentSchemaId = 0,
      partitionSpecs = Seq(
        if (specFields.isEmpty) PartitionSpec.unpartitioned
        else PartitionSpec(if (specFields.isEmpty) 0 else 1, specFields)),
      defaultSpecId = if (specFields.isEmpty) 0 else 1,
      lastPartitionId = specFields.map(_.fieldId).maxOption.getOrElse(999),
      properties = {
        // a sort order set at CREATE covers the table's whole history:
        // watermark 0 (see replaceSortOrder / SortSinceSeqProp)
        val p =
          if (order.orderId == 0) properties
          else properties + (GraftTable.SortSinceSeqProp -> "0")
        if (p.isEmpty) None else Some(p)
      },
      sortOrders = Seq(SortOrder.unsorted) ++
        (if (order.orderId == 0) Seq.empty else Seq(order)),
      defaultSortOrderId = order.orderId.toLong)
    val t = new GraftTable(spark, location)
    if (t.latestVersion(Paths.get(location, "metadata")).isDefined)
      throw new IllegalStateException(s"table already exists at $location")
    t.writeMetadata(meta)
    t
  }

  // --------------------------------------------------- type conversion ----

  /** Highest field id allocated anywhere in the schema, including nested
    * struct/list/map element ids — addColumn must never reuse one.
    */
  def maxFieldId(s: SchemaV2): Int = {
    def walk(t: IceType): Seq[Int] = t match {
      case TStruct(fs) => fs.flatMap(f => f.id +: walk(f.fieldType))
      case TList(id, _, el) => id +: walk(el)
      case TMap(kid, k, vid, _, v) => Seq(kid, vid) ++ walk(k) ++ walk(v)
      case _ => Seq.empty
    }
    (s.fields.flatMap(f => f.id +: walk(f.fieldType)) :+ 0).max
  }

  def toIceSchema(schema: StructType, schemaId: Int): SchemaV2 = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    def conv(dt: DataType): IceType = dt match {
      case st: StructType =>
        TStruct(st.fields.map(f =>
          StructField(alloc(), f.name, !f.nullable, conv(f.dataType))))
      case ArrayType(et, containsNull) => TList(alloc(), !containsNull, conv(et))
      case MapType(kt, vt, vn) => TMap(alloc(), conv(kt), alloc(), !vn, conv(vt))
      case other => toIceType(other)
    }
    SchemaV2(schemaId, None, None, schema.fields.map(f =>
      StructField(alloc(), f.name, !f.nullable, conv(f.dataType))).toSeq)
  }

  def toIceType(dt: DataType): IceType = dt match {
    case BooleanType => TBoolean
    case IntegerType | ShortType | ByteType => TInt
    case LongType => TLong
    case FloatType => TFloat
    case DoubleType => TDouble
    case StringType => TString
    case DateType => TDate
    case TimestampType => TTimestamptz
    case TimestampNTZType => TTimestamp
    case BinaryType => TBinary
    case d: DecimalType => TDecimal(d.precision, d.scale)
    case other =>
      throw new IllegalArgumentException(s"unsupported type $other")
  }

  def toSparkType(t: IceType): DataType = t match {
    case TBoolean => BooleanType
    case TInt => IntegerType
    case TLong => LongType
    case TFloat => FloatType
    case TDouble => DoubleType
    case TString => StringType
    case TDate => DateType
    case TTimestamp => TimestampNTZType
    case TTimestamptz => TimestampType
    // Spark has no time-of-day type: surface `time` (schema.rs:16) as
    // its spec-defined physical form, microseconds since midnight. The
    // mapping is one-way (LongType infers back to TLong) — readable,
    // filterable, never a MatchError
    case TTime => LongType
    case TBinary => BinaryType
    case TUuid => StringType
    case TFixed(_) => BinaryType
    case TDecimal(p, s) => DecimalType(p, s)
    case TStruct(fs) => StructType(fs.map(f =>
      SparkField(f.name, toSparkType(f.fieldType), !f.required)))
    case TList(_, req, el) => ArrayType(toSparkType(el), !req)
    case TMap(_, k, _, vreq, v) =>
      MapType(toSparkType(k), toSparkType(v), !vreq)
  }

  def toSparkSchema(s: SchemaV2): StructType =
    StructType(s.fields.map(f =>
      SparkField(f.name, toSparkType(f.fieldType), !f.required)))

  /** Transform → Column using graft.functions (bucket is the native
    * murmur3 Catalyst expression).
    */
  def transformColumn(t: Transform, c: Column, srcType: DataType): Column =
    t match {
      case TIdentity => c
      case TVoid => transforms.voidT(c)
      case TYear => transforms.years(c)
      case TMonth => transforms.months(c)
      case TDay => transforms.days(c)
      case THour => transforms.hours(c)
      case TBucket(n) => transforms.bucket(n, c)
      case TTruncate(w) => srcType match {
        case StringType => transforms.truncateString(w, c)
        case _ => transforms.truncateInt(w, c)
      }
    }
}

/** Static holder for the path decode StaticInvoke target: a top-level
  * object gets a static forwarder, which generated code calls directly.
  */
object PathCodec {
  def decode(raw: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    if (raw == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      GraftTable.decodePath(raw.toString))

  /** decode + canonicalize in one static call — the manifest-identity
    * form driver-side maps are keyed by, usable as a broadcast-join key
    * inside WholeStageCodegen.
    */
  def decodeCanon(raw: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    if (raw == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      GraftTable.canonPath(GraftTable.decodePath(raw.toString)))
}
