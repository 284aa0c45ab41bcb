package graft.table

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Full Iceberg table-layout interop: a graft snapshot exported as the
  * directory layout external Iceberg readers discover on their own —
  * `metadata/vN.metadata.json` (+ `version-hint.text`) pointing at an
  * Avro manifest list and Avro manifests — and an import path that reads
  * such a layout back WITHOUT graft's native JSONL manifests, going only
  * through the spec-shaped files (the same metadata surface the
  * reference models at /root/reference/src/model/table.rs:19 and
  * snapshot.rs).
  *
  * The export is a metadata overlay: data and delete files are
  * referenced at their original absolute paths (Iceberg permits absolute
  * `file_path`s), so exporting a 100 TB table costs O(metadata), never a
  * data copy. The import applies position AND equality deletes through
  * [[GraftTable.readDeletesAppliedCore]] — the exact logic native scans
  * use, so merge-on-read semantics cannot drift between the two paths.
  */
object IcebergInterop {

  /** Export `t`'s current snapshot as a self-contained Iceberg layout
    * under `dir`. Only the current snapshot travels (older snapshots'
    * manifest lists are native JSONL and would dangle for an external
    * reader); refs are trimmed to those pinning the exported snapshot.
    * Returns the metadata.json path.
    */
  def exportTable(t: GraftTable, dir: String): Path = {
    val meta = t.metadata
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException("no snapshot to export"))
    // Deletion vectors and row lineage travel through the v3 form:
    // DV sidecars are spec-layout Puffin files holding spec-encoded
    // (portable-roaring) blobs, referenced like data files at their
    // absolute paths with `referenced_data_file`/`content_offset`/
    // `content_size_in_bytes` in the Avro manifests; lineage exports
    // per-entry `first_row_id` plus the table's `next-row-id`, with
    // format-version 3 declared in the metadata JSON.
    val metaDir = Paths.get(dir, "metadata")
    Files.createDirectories(metaDir)
    val listPath = t.exportAvro(metaDir.toString)
    // backstop for tables whose DVs were committed before the sticky
    // format floor existed: if any live manifest carries a DV entry,
    // the exported metadata MUST declare v3 regardless of the parsed
    // floor — v2 metadata over v3 manifests is spec-invalid
    val liveMs = t.liveManifests(None)
    val liveDvs = liveMs.exists(m =>
      m.content == 1 && m.entries.exists(_.dv.isDefined))
    val extMeta0 = meta.copy(
      formatVersion =
        if (liveDvs) math.max(meta.formatVersion, 3) else meta.formatVersion,
      location = dir,
      snapshots = Some(Seq(snap.copy(manifestList = listPath.toString))),
      snapshotLog = Some(Seq(SnapshotLog(snap.snapshotId, snap.timestampMs))),
      metadataLog = None,
      refs = meta.refs.map(_.filter(_._2.snapshotId == snap.snapshotId))
        .filter(_.nonEmpty))
    // Iceberg v3 REQUIRES `next-row-id` in the metadata document. A
    // table forced to v3 by DVs or column defaults (row lineage never
    // enabled) stamps the high-water mark its entries imply — 0 when no
    // row ids were ever assigned, which is spec-valid: files with null
    // `first_row_id` serve null row ids (the v2→v3 upgrade state).
    val extMeta =
      if (extMeta0.effectiveFormatVersion >= 3 && extMeta0.nextRowId.isEmpty) {
        val hwm = liveMs.filter(_.content == 0).flatMap(_.entries)
          .flatMap(e => e.firstRowId.map(_ + e.recordCount))
        extMeta0.copy(nextRowId = Some(if (hwm.isEmpty) 0L else hwm.max))
      } else extMeta0
    val p = metaDir.resolve("v1.metadata.json")
    Files.writeString(p, Json.write(extMeta.toJson))
    Files.writeString(metaDir.resolve("version-hint.text"), "1")
    p
  }

  /** Locate the current metadata.json of an Iceberg-layout table dir:
    * `version-hint.text` if present, else the highest `vN.metadata.json`.
    */
  def currentMetadataPath(dir: String): Path = {
    val metaDir = Paths.get(dir, "metadata")
    val hint = metaDir.resolve("version-hint.text")
    if (Files.exists(hint))
      metaDir.resolve(s"v${Files.readString(hint).trim}.metadata.json")
    else {
      val ls = Files.list(metaDir)
      val vs = try ls.iterator.asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
        .toSeq
      finally ls.close()
      require(vs.nonEmpty, s"no metadata.json under $metaDir")
      metaDir.resolve(s"v${vs.max}.metadata.json")
    }
  }

  /** Read an Iceberg-layout table through the external format only:
    * metadata.json → Avro manifest list → Avro manifests → schema-aligned
    * parquet read with position and sequence-scoped equality deletes
    * applied. `asOf` selects a snapshot id (must be reachable from the
    * exported metadata).
    */
  def readTable(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val meta = TableMetadataV2.fromJsonString(
      Files.readString(currentMetadataPath(dir)))
    val snap = asOf
      .map(id => meta.snapshotById(id).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $id in layout")))
      .orElse(meta.currentSnapshot)
      .getOrElse(throw new IllegalStateException(s"no snapshot in $dir"))
    val manifests = AvroManifest.readManifestList(Paths.get(snap.manifestList))
    val entries = manifests.flatMap { case (p, _, _) =>
      AvroManifest.readManifest(Paths.get(p))
    }
    val data = entries.filter(_.isData)
    val posDels = entries.filter(_.content == 1)
    val eqDels = entries.filter(_.content == 2)
    val schemaId = snap.schemaId.map(_.toInt).getOrElse(meta.currentSchemaId)
    val readSchema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    GraftTable.readDeletesAppliedCore(spark, meta,
      data.map(e => (e.path, e.schemaId, e.sequenceNumber)),
      readSchema, posDels, eqDels,
      formatOf = GraftTable.fmtOf(data))
  }

  /** ADOPT an external Iceberg layout as a LIVE native table: the
    * current snapshot's Avro manifests convert to native JSONL
    * manifests (metadata-only — data, delete, and DV files are
    * referenced at their absolute paths, never copied), and a fresh
    * native version chain starts at the adopted snapshot. Every
    * subsequent operation — scans, mutations, maintenance, ANALYZE,
    * even re-export — runs natively: the in-place migration path for
    * an existing Iceberg table. History before the adopted snapshot
    * does not travel (its manifest lists live only in the source
    * layout); lineage state (`next-row-id`, per-entry first-row-ids)
    * and table properties carry over, so a lineage table keeps minting
    * correct ids after adoption.
    */
  def adoptTable(spark: SparkSession, layoutDir: String,
      targetLocation: String): GraftTable = {
    val extMeta = TableMetadataV2.fromJsonString(
      Files.readString(currentMetadataPath(layoutDir)))
    val snap = extMeta.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"no snapshot to adopt in $layoutDir"))
    val metaDir = Paths.get(targetLocation, "metadata")
    require(!Files.exists(metaDir.resolve("v1.metadata.json")),
      s"table already exists at $targetLocation")
    Files.createDirectories(metaDir)
    val manifests = AvroManifest.readManifestList(Paths.get(snap.manifestList))
    def sfxOf(ct: Int) = ct match {
      case 0 => ""; case 1 => "-deletes"; case _ => "-eq-deletes" }
    // native convention: manifests are split per content kind (data /
    // position-deletes / equality-deletes). Adoption of a big table is
    // a Spark job — one task per source Avro manifest converts it to a
    // native JSONL manifest on an executor and returns O(1) ref rows;
    // a million-file table never funnels its entries through the driver.
    // avro data files need the engine scan (no vectorized FileFormat);
    // record their presence so the DSv2 connector routes through the V1
    // bridge instead of refusing — detected per converted manifest, no
    // extra pass
    var hasAvro = false
    val refs: Seq[ManifestRef] =
      if (manifests.size <= 1) {
        val allEntries = manifests.flatMap { case (p, _, _) =>
          AvroManifest.readManifest(Paths.get(p))
        }
        hasAvro = allEntries.exists(e =>
          e.isData && e.format == DataFileEntry.Avro)
        allEntries.groupBy(_.content).toSeq.sortBy(_._1)
          .map { case (ct, es) =>
            val mf = metaDir.resolve(
              s"manifest-${snap.snapshotId}${sfxOf(ct)}.jsonl")
            DataFileEntry.writeManifest(mf, es)
            ManifestRef(mf.toString, es.size.toLong,
              es.map(_.recordCount).sum, Some(snap.snapshotId),
              Some(snap.sequenceNumber), content = ct,
              partitionSummary =
                if (ct == 0) ManifestRef.summarize(es) else None)
          }
      } else {
        val metaDirStr = metaDir.toString
        val snapId = snap.snapshotId
        val converted = spark.sparkContext
          .parallelize(manifests.zipWithIndex,
            math.max(1, math.min(manifests.size, 256)))
          .flatMap { case ((p, _, _), idx) =>
            val es = AvroManifest.readManifest(Paths.get(p))
            es.groupBy(_.content).toSeq.map { case (ct, g) =>
              val mf = Paths.get(metaDirStr,
                f"manifest-adopt-$snapId-$idx%05d${sfxOf(ct)}.jsonl")
              DataFileEntry.writeManifest(mf, g)
              (mf.toString, g.size.toLong, g.map(_.recordCount).sum, ct,
                g.exists(e => e.isData && e.format == DataFileEntry.Avro),
                if (ct == 0) ManifestRef.summarize(g) else None)
            }
          }.collect().toSeq.sortBy(_._1)
        hasAvro = converted.exists(_._5)
        converted.map { case (mf, n, rc, ct, _, summary) =>
          ManifestRef(mf, n, rc, Some(snap.snapshotId),
            Some(snap.sequenceNumber), content = ct,
            partitionSummary = summary)
        }
      }
    val listPath = metaDir.resolve(
      s"snap-${snap.snapshotId}.manifest-list.json")
    ManifestList.write(listPath, refs)
    val now = System.currentTimeMillis
    val adopted = extMeta.copy(
      location = targetLocation,
      snapshots = Some(Seq(snap.copy(manifestList = listPath.toString))),
      snapshotLog = Some(Seq(SnapshotLog(snap.snapshotId, now))),
      metadataLog = None,
      lastUpdatedMs = now,
      properties =
        if (!hasAvro) extMeta.properties
        else Some(extMeta.properties.getOrElse(Map.empty) +
          (GraftTable.HasAvroProp -> "true")),
      refs = Some(Map("main" -> SnapshotRef(snap.snapshotId,
        BranchRetention(1, Long.MaxValue, Long.MaxValue)))))
    Files.write(metaDir.resolve("v1.metadata.json"),
      adopted.toJsonString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    GraftTable.load(spark, targetLocation)
  }

  /** Read an exported ROW-LINEAGE table through the external format
    * only: the v3 metadata's `next-row-id` proves lineage, per-entry
    * `first_row_id` serves virtual ids, and rewrite-materialized files
    * project their physical `_row_id`/`_last_updated_sequence_number`
    * columns — the same [[GraftTable.lineageReadCore]] native scans
    * use, over entries recovered purely from the Avro manifests.
    */
  def readTableWithLineage(spark: SparkSession, dir: String): DataFrame = {
    val meta = TableMetadataV2.fromJsonString(
      Files.readString(currentMetadataPath(dir)))
    require(meta.nextRowId.isDefined,
      s"layout at $dir carries no next-row-id — not a lineage table")
    val snap = meta.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"no snapshot in $dir"))
    val manifests = AvroManifest.readManifestList(Paths.get(snap.manifestList))
    val entries = manifests.flatMap { case (p, _, _) =>
      AvroManifest.readManifest(Paths.get(p))
    }
    val schemaId = snap.schemaId.map(_.toInt).getOrElse(meta.currentSchemaId)
    val readSchema = meta.schemaById(schemaId).getOrElse(meta.currentSchema)
    GraftTable.lineageReadCore(spark, meta,
      entries.filter(_.isData).map(e =>
        (e.path, e.schemaId, e.sequenceNumber, e.firstRowId)),
      readSchema,
      entries.filter(_.content == 1), entries.filter(_.content == 2))
  }
}
