package graft.table

import graft.model.{MetadataLog, TableMetadataV2}
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Pluggable table-metadata persistence: how a [[GraftTable]] reads its
  * latest committed metadata and claims the next version. The file form
  * is the default (atomic CREATE_NEW of `v{N}.metadata.json` — the
  * HadoopCatalog model); the REST catalog mode routes commits through
  * the Iceberg REST protocol instead, so the REST service stays the
  * single commit authority while data/manifest files still go straight
  * to shared storage (the standard REST deployment model).
  */
trait MetadataIo {
  /** Latest committed (version, metadata), None when no table exists. */
  def latest(location: String): Option[(Int, TableMetadataV2)]

  /** Atomically commit `meta` as the version after `base` (version 1
    * when `base` is None — CREATE). Must throw CommitConflictException
    * when another commit claimed the slot / moved the asserted state.
    */
  def commit(location: String, base: Option[(Int, TableMetadataV2)],
      meta: TableMetadataV2): Unit
}

/** Direct-filesystem metadata IO: `location/metadata/v{N}.metadata.json`,
  * commits are atomic CREATE_NEW version claims (optimistic concurrency;
  * the loser gets CommitConflictException and re-derives).
  */
object FileMetadataIo extends MetadataIo {

  private def metaDir(location: String): Path =
    Paths.get(location, "metadata")

  private[table] def latestVersion(dir: Path): Option[(Int, Path)] = {
    if (!Files.isDirectory(dir)) return None
    val re = """v(\d+)\.metadata\.json""".r
    val stream = Files.list(dir)
    try stream.iterator.asScala
      .flatMap(p => p.getFileName.toString match {
        case re(n) => Some((n.toInt, p))
        case _ => None
      }).toSeq.sortBy(-_._1).headOption
    finally stream.close()
  }

  override def latest(location: String)
      : Option[(Int, TableMetadataV2)] =
    latestVersion(metaDir(location)).map { case (v, p) =>
      (v, TableMetadataV2.fromJsonString(
        new String(Files.readAllBytes(p), "UTF-8")))
    }

  override def commit(location: String,
      base: Option[(Int, TableMetadataV2)],
      meta: TableMetadataV2): Unit = {
    val dir = metaDir(location)
    val next = base.map(_._1 + 1).getOrElse(
      latestVersion(dir).map(_._1 + 1).getOrElse(1))
    val target = dir.resolve(s"v$next.metadata.json")
    Files.createDirectories(dir)
    val withLog = meta.copy(metadataLog = Some(
      meta.metadataLog.getOrElse(Seq.empty) ++
        latestVersion(dir).map { case (_, p) =>
          MetadataLog(p.toString, System.currentTimeMillis)
        }.toSeq))
    // CREATE_NEW = atomic claim of the version slot (optimistic commit);
    // losing the race surfaces as CommitConflictException so callers can
    // re-derive their change against the new table state and retry
    try Files.write(target, withLog.toJsonString.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"concurrent commit claimed v$next at $location")
    }
    Files.write(dir.resolve("version-hint.text"),
      next.toString.getBytes("UTF-8"))
  }
}
