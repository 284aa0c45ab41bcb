package graft.table

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.Json
import scala.jdk.CollectionConverters._

/** Per-column min/max/null stats for one data file, in a normalized string
  * encoding (timestamps as zero-padded UTC strings, dates ISO, numerics as
  * plain decimal strings) so driver-side pruning compares without schema
  * round-trips.
  */
case class ColStats(min: Option[String], max: Option[String], nulls: Long) {
  def toJson: ObjectNode = {
    val o = Json.obj
    min.foreach(o.put("min", _))
    max.foreach(o.put("max", _))
    o.put("nulls", nulls)
    o
  }
}

object ColStats {
  // executor-serialized shards write explicit nulls (ignoreNullFields
  // off keeps the format deterministic) — a JSON null node must read
  // back as None, not the string "null"
  def fromJson(n: JsonNode): ColStats = ColStats(
    Option(n.get("min")).filterNot(_.isNull).map(_.asText),
    Option(n.get("max")).filterNot(_.isNull).map(_.asText),
    n.path("nulls").asLong)
}

/** One live file in a snapshot's manifest. `snapshotId` is the
  * snapshot that ADDED the file (drives incremental reads); `schemaId` is
  * the schema the file was written with (drives evolution-aware reads);
  * `partition` holds the spec's derived partition values (None = null
  * partition); `content` distinguishes DATA files (0) from POSITION
  * DELETE files (1, parquet of (file_path, pos) pairs) and EQUALITY
  * DELETE files (2, parquet of key tuples over `eqColumns`) — merge-on-
  * read deletes applied at scan time via anti-join. Sequence numbers
  * order deletes against data exactly as the reference models at
  * /root/reference/src/model/snapshot.rs:54: an equality delete applies
  * only to data files with a STRICTLY SMALLER sequence number, so a
  * re-inserted key survives its own past deletion.
  *
  * Manifests are JSON-lines — one complete file list per snapshot. At
  * 100 TB the same files would be read as a Spark JSON dataset instead of
  * driver-side (format chosen for exactly that migration); per-snapshot
  * full lists trade manifest size for O(1) time travel, with compaction
  * bounding the file count.
  */
case class DataFileEntry(
    path: String,
    recordCount: Long,
    snapshotId: Long,
    sequenceNumber: Long,
    schemaId: Int,
    partition: Map[String, Option[String]],
    stats: Map[String, ColStats],
    content: Int = 0,
    fileSize: Long = 0L,
    eqColumns: Seq[String] = Seq.empty,
    // spec the partition values were derived under — entries written
    // before spec evolution existed carry None and prune by stats only
    // once the table holds several specs (resolving them under the NEW
    // default spec could prune a matching file)
    specId: Option[Int] = None,
    // per-column bloom-filter sidecar ranges (point-lookup file skipping;
    // see Blooms) — absent on tables without graft.bloom.columns
    bloom: Option[Blooms.BloomRef] = None,
    // deletion vector (content=1 only): this entry's `path` is a sidecar
    // and `dv` names the referenced data file + blob byte range — the
    // Iceberg-v3 one-DV-per-data-file delete form (see Dv)
    dv: Option[Dv.DvRef] = None,
    // row lineage (Iceberg v3): the id of this data file's FIRST row
    // (row N of the file has id firstRowId + N). Concrete once resolved;
    // executor-written shards instead carry `rowIdOffset` — the running
    // record count of prior data entries in the same shard — and inherit
    // `firstRowId = ref.firstRowId + rowIdOffset` at read time, so the
    // commit assigns O(shards) bases, never per-file ids. A LINEAGE
    // table's entry with NEITHER field marks a rewritten file whose ids
    // are materialized as physical columns (see GraftTable.RowIdCol)
    firstRowId: Option[Long] = None,
    rowIdOffset: Option[Long] = None,
    // data-file format (spec `file_format`, lowercase): graft writes
    // parquet only, but ADOPTED external tables may reference orc (or
    // avro) data files — scans must branch the reader instead of
    // silently parsing every file as parquet
    format: String = DataFileEntry.Parquet) {

  def isData: Boolean = content == 0

  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("path", path)
    o.put("record-count", recordCount)
    o.put("snapshot-id", snapshotId)
    o.put("sequence-number", sequenceNumber)
    o.put("schema-id", schemaId)
    specId.foreach(o.put("spec-id", _))
    if (content != 0) o.put("content", content)
    if (fileSize != 0L) o.put("file-size", fileSize)
    if (eqColumns.nonEmpty) {
      val a = o.putArray("equality-columns")
      eqColumns.foreach(a.add)
    }
    val p = o.putObject("partition")
    partition.toSeq.sortBy(_._1).foreach {
      case (k, Some(v)) => p.put(k, v)
      case (k, None) => p.putNull(k)
    }
    val s = o.putObject("stats")
    stats.toSeq.sortBy(_._1).foreach { case (k, v) =>
      s.set[ObjectNode](k, v.toJson)
    }
    bloom.foreach { b =>
      val bo = o.putObject("bloom")
      bo.put("path", b.path)
      val cs = bo.putObject("cols")
      b.cols.toSeq.sortBy(_._1).foreach { case (k, (off, len)) =>
        val c = cs.putObject(k)
        c.put("off", off)
        c.put("len", len)
      }
    }
    dv.foreach { d =>
      val dn = o.putObject("dv")
      dn.put("data-file", d.dataFile)
      dn.put("off", d.off)
      dn.put("len", d.len)
    }
    firstRowId.foreach(o.put("first-row-id", _))
    rowIdOffset.foreach(o.put("row-id-offset", _))
    if (format != DataFileEntry.Parquet) o.put("format", format)
    o
  }
}

object DataFileEntry {

  /** Sentinel for entries not yet bound to a committed snapshot. Entries
    * carrying it in a committed manifest INHERIT snapshot id and sequence
    * number from their ManifestRef (the reference models per-snapshot
    * sequence numbers for exactly this ordering role:
    * /root/reference/src/model/snapshot.rs:54) — so executors can write
    * manifest shards BEFORE the commit allocates ids, and the driver never
    * rewrites or materializes per-file rows.
    */
  val PendingSnapshot = -1L

  /** Canonical lowercase data-file format names (spec `file_format`). */
  val Parquet = "parquet"
  val Orc = "orc"
  val Avro = "avro"

  def fromJson(n: JsonNode): DataFileEntry = DataFileEntry(
    n.path("path").asText,
    n.path("record-count").asLong,
    n.path("snapshot-id").asLong,
    n.path("sequence-number").asLong,
    n.path("schema-id").asInt,
    n.path("partition").properties.asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText))
    }.toMap,
    n.path("stats").properties.asScala.map { e =>
      e.getKey -> ColStats.fromJson(e.getValue)
    }.toMap,
    n.path("content").asInt(0),
    n.path("file-size").asLong(0L),
    Option(n.get("equality-columns")).map(_.elements.asScala.toSeq
      .map(_.asText)).getOrElse(Seq.empty),
    Option(n.get("spec-id")).filterNot(_.isNull).map(_.asInt),
    Option(n.get("bloom")).filterNot(_.isNull).map { b =>
      Blooms.BloomRef(b.path("path").asText,
        b.path("cols").properties.asScala.map { e =>
          e.getKey -> (e.getValue.path("off").asLong,
            e.getValue.path("len").asLong)
        }.toMap)
    },
    Option(n.get("dv")).filterNot(_.isNull).map { d =>
      Dv.DvRef(d.path("data-file").asText, d.path("off").asLong,
        d.path("len").asLong)
    },
    Option(n.get("first-row-id")).filterNot(_.isNull).map(_.asLong),
    Option(n.get("row-id-offset")).filterNot(_.isNull).map(_.asLong),
    Option(n.get("format")).map(_.asText).getOrElse(Parquet))

  def writeManifest(file: java.nio.file.Path, entries: Seq[DataFileEntry]): Unit = {
    val lines = entries.map(e => Json.write(e.toJson))
    java.nio.file.Files.write(file,
      lines.mkString("\n").getBytes("UTF-8"))
  }

  def readManifest(file: java.nio.file.Path): Seq[DataFileEntry] = {
    val text = new String(java.nio.file.Files.readAllBytes(file), "UTF-8")
    text.split('\n').iterator.filter(_.nonEmpty)
      .map(l => fromJson(Json.parse(l))).toSeq
  }
}

/** One manifest file referenced by a snapshot's manifest list, with the
  * rollup counts the commit path needs without re-reading the manifest.
  *
  * `addedSnapshotId`/`addedSequenceNumber` implement sequence-number
  * INHERITANCE: a manifest written by executors before its commit carries
  * `PendingSnapshot` per entry, and readers substitute the ref-level
  * values — commit metadata stays O(1) per manifest, never O(files).
  */
/** One distinct (spec, partition tuple) a manifest's entries cover —
  * the manifest-list-level analogue of Iceberg's partition summaries.
  * Planning skips a whole manifest when NO tuple may-matches the
  * filter, so partition-aligned queries on a 10k-manifest table plan
  * O(matching manifests) instead of reading every manifest's entries.
  */
case class PartitionTuple(specId: Option[Int],
    partition: Map[String, Option[String]]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    specId.foreach(o.put("spec-id", _))
    val po = o.putObject("partition")
    partition.toSeq.sortBy(_._1).foreach {
      case (k, Some(v)) => po.put(k, v)
      case (k, None) => po.putNull(k)
    }
    o
  }
}

object PartitionTuple {
  def fromJson(tn: JsonNode): PartitionTuple = PartitionTuple(
    Option(tn.get("spec-id")).filterNot(_.isNull).map(_.asInt),
    Option(tn.get("partition")).map(_.fields.asScala.toSeq.map { e =>
      e.getKey ->
        (if (e.getValue.isNull) None else Some(e.getValue.asText))
    }.toMap).getOrElse(Map.empty))
}

/** Minimal serializable Hadoop Configuration carrier (Spark's own
  * SerializableConfiguration is private[spark]) — Writable round-trip,
  * so executor tasks can open the table's FileSystem when they write
  * manifest shards.
  */
private[graft] class SerConf(
    @transient private var c: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(in)
  }
}

case class ManifestRef(path: String, entryCount: Long, recordCount: Long,
    addedSnapshotId: Option[Long] = None,
    addedSequenceNumber: Option[Long] = None,
    content: Int = 0,
    // row lineage: id of the first row of this manifest's FIRST data
    // entry; entries inherit firstRowId = this + their rowIdOffset
    firstRowId: Option[Long] = None,
    // DISTINCT partition tuples of this manifest's entries, capped at
    // [[ManifestRef.SummaryCap]] — None (unknown / too many / legacy
    // list) always keeps the manifest. MUST cover every entry when
    // present: planning may SKIP the whole manifest on its strength.
    partitionSummary: Option[Seq[PartitionTuple]] = None) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("path", path)
    o.put("entry-count", entryCount)
    o.put("record-count", recordCount)
    addedSnapshotId.foreach(v => o.put("added-snapshot-id", v))
    addedSequenceNumber.foreach(v => o.put("added-sequence-number", v))
    if (content != 0) o.put("content", content)
    firstRowId.foreach(v => o.put("first-row-id", v))
    partitionSummary.foreach { ts =>
      val a = o.putArray("partition-summary")
      ts.foreach(t => a.add(t.toJson))
    }
    o
  }
  def entries: Seq[DataFileEntry] = {
    ManifestRef.entriesReads.incrementAndGet()
    val raw = DataFileEntry.readManifest(java.nio.file.Paths.get(path))
    val stamped = (addedSnapshotId, addedSequenceNumber) match {
      case (Some(sid), Some(seq)) => raw.map(e =>
        if (e.snapshotId == DataFileEntry.PendingSnapshot)
          e.copy(snapshotId = sid, sequenceNumber = seq)
        else e)
      case _ => raw
    }
    firstRowId match {
      case Some(base) => stamped.map(e =>
        if (e.firstRowId.isEmpty && e.rowIdOffset.isDefined && e.isData)
          e.copy(firstRowId = Some(base + e.rowIdOffset.get))
        else e)
      case None => stamped
    }
  }
}

object ManifestRef {
  /** Driver-side manifest-entry materializations (tests assert mutations
    * planned distributedly never load full entry lists on the driver).
    */
  private[graft] val entriesReads = new java.util.concurrent.atomic.AtomicLong

  /** Above this many distinct tuples a manifest carries no summary
    * (always read) — bounds manifest-list size and keeps the evaluation
    * O(small); a well-clustered manifest covers far fewer partitions.
    */
  val SummaryCap = 16

  /** Distinct (spec, partition) tuples of `entries`, or None when over
    * the cap or when the tuples carry no information (all empty —
    * unpartitioned table).
    */
  def summarize(entries: Seq[DataFileEntry]): Option[Seq[PartitionTuple]] = {
    val ts = scala.collection.mutable.LinkedHashSet.empty[PartitionTuple]
    val it = entries.iterator
    while (it.hasNext) {
      val e = it.next()
      ts += PartitionTuple(e.specId, e.partition)
      if (ts.size > SummaryCap) return None
    }
    if (ts.isEmpty || ts.forall(_.partition.isEmpty)) None
    else Some(ts.toSeq)
  }

  def fromJson(n: JsonNode): ManifestRef = ManifestRef(
    n.path("path").asText,
    n.path("entry-count").asLong,
    n.path("record-count").asLong,
    Option(n.get("added-snapshot-id")).filterNot(_.isNull).map(_.asLong),
    Option(n.get("added-sequence-number")).filterNot(_.isNull).map(_.asLong),
    n.path("content").asInt(0),
    Option(n.get("first-row-id")).filterNot(_.isNull).map(_.asLong),
    Option(n.get("partition-summary")).filterNot(_.isNull)
      .map(_.elements.asScala.toSeq.map(PartitionTuple.fromJson)))
}

/** Per-snapshot manifest LIST: snapshots share unchanged manifest files,
  * so an append commits O(new files) metadata regardless of table size —
  * the property that keeps commits viable at millions of files.
  */
object ManifestList {
  def write(file: java.nio.file.Path, refs: Seq[ManifestRef]): Unit = {
    val o = Json.obj
    val a = o.putArray("manifests")
    refs.foreach(r => a.add(r.toJson))
    java.nio.file.Files.write(file, Json.write(o).getBytes("UTF-8"))
  }

  def read(file: java.nio.file.Path): Seq[ManifestRef] = {
    val n = Json.parse(new String(java.nio.file.Files.readAllBytes(file), "UTF-8"))
    n.path("manifests").elements.asScala.toSeq.map(ManifestRef.fromJson)
  }
}
