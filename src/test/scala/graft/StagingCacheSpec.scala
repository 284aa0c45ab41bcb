package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._

/** The round-15 staged-feed cache: staging is reused across calls only
  * while the SOURCE files' (path, size, mtime) fingerprint matches — the
  * one way this cache could go wrong is serving a stale feed after the
  * source changed, so that is what this spec attacks.
  */
class StagingCacheSpec extends SparkSpec {

  private def writeEvents(dir: Path, n: Int): Unit = {
    val df = spark.range(n).selectExpr(
      "id as event_id", "id % 7 as user_id",
      "timestamp_micros(id * 60000000) as ts",
      "case when id % 2 = 0 then 'view' else 'purchase' end as event_type",
      "cast(id as double) as value")
    val tmp = Files.createTempDirectory("evt-src")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val ls = Files.list(tmp)
    val part =
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator.asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally ls.close()
    Files.deleteIfExists(dir.resolve("events.parquet"))
    Files.move(part, dir.resolve("events.parquet"))
  }

  test("staged feed reuses while source unchanged, re-stages on change") {
    val dir = Files.createTempDirectory("stage-cache")
    writeEvents(dir, 100)
    val staged1 = Paths.get(
      graft.streaming.StreamingQueries.stageEvents(spark, dir.toString))
    val manifest = staged1.resolve("_MANIFEST")
    assert(Files.isRegularFile(manifest))
    val stamp1 = Files.getLastModifiedTime(manifest)
    assert(spark.read.parquet(staged1.toString).count() == 100)

    // unchanged source → the SAME staging, not rebuilt (manifest file
    // untouched — a rebuild rewrites it)
    Thread.sleep(20)
    val staged2 = Paths.get(
      graft.streaming.StreamingQueries.stageEvents(spark, dir.toString))
    assert(staged2 == staged1)
    assert(Files.getLastModifiedTime(manifest) == stamp1,
      "unchanged source must not re-stage")

    // changed source (different size/mtime) → re-staged, new data served;
    // a stale cache here would silently feed 100 old rows to every
    // streaming query over this directory
    writeEvents(dir, 250)
    val staged3 = Paths.get(
      graft.streaming.StreamingQueries.stageEvents(spark, dir.toString))
    assert(staged3 == staged1)
    assert(Files.getLastModifiedTime(manifest) != stamp1,
      "changed source must re-stage")
    assert(spark.read.parquet(staged3.toString).count() == 250)

    // a half-finished staging (no manifest — crash between link and
    // manifest write) is rebuilt, never trusted
    Files.delete(manifest)
    val staged4 = Paths.get(
      graft.streaming.StreamingQueries.stageEvents(spark, dir.toString))
    assert(Files.isRegularFile(staged4.resolve("_MANIFEST")))
    assert(spark.read.parquet(staged4.toString).count() == 250)

    // an extra stray file in the staging dir (stale link set from an
    // earlier layout) also invalidates — a doubled feed must be
    // impossible
    Files.createSymbolicLink(staged4.resolve("events-99999.parquet"),
      dir.resolve("events.parquet"))
    val staged5 = Paths.get(
      graft.streaming.StreamingQueries.stageEvents(spark, dir.toString))
    assert(!Files.exists(staged5.resolve("events-99999.parquet")),
      "stray staged file must be wiped on re-stage")
    assert(spark.read.parquet(staged5.toString).count() == 250)
  }

  test("cachedBuild: reuse on hit, rebuild on source or recipe change") {
    val src = Files.createTempDirectory("cb-src")
    val f = src.resolve("t.parquet")
    Files.writeString(f, "payload-v1")
    var builds = 0
    def build(name: String, recipe: String): Path =
      Staging.cachedBuild(name, recipe, Seq(f)) { d =>
        builds += 1
        Files.writeString(d.resolve("artifact"), s"built-$builds")
      }
    val name = s"cb-test-${System.nanoTime()}"
    val d1 = build(name, "r1")
    assert(builds == 1 && Files.readString(d1.resolve("artifact"))
      == "built-1")
    // unchanged source + recipe → the SAME artifact, no rebuild
    assert(build(name, "r1") == d1 && builds == 1)
    // recipe change (the build code evolved) → rebuild
    build(name, "r2")
    assert(builds == 2)
    // source change (size/mtime fingerprint) → rebuild
    Thread.sleep(5)
    Files.writeString(f, "payload-v2-longer")
    build(name, "r2")
    assert(builds == 3)
    // a crash mid-build leaves no marker → next call rebuilds (marker
    // is written LAST)
    val name2 = s"cb-crash-${System.nanoTime()}"
    intercept[RuntimeException](Staging.cachedBuild(name2, "r1", Seq(f)) {
      d => Files.writeString(d.resolve("artifact"), "half")
        throw new RuntimeException("boom")
    })
    var rebuilt = false
    Staging.cachedBuild(name2, "r1", Seq(f))(_ => rebuilt = true)
    assert(rebuilt, "half-finished build (no marker) must rebuild")
  }

  test("corrupt CDC manifest re-stages instead of throwing") {
    val dir = Files.createTempDirectory("stage-cdc")
    writeEvents(dir, 90)
    val (path1, n1) =
      graft.streaming.StreamingQueries.stageCdcFeed(spark, dir.toString)
    assert(n1 >= 1 && spark.read.parquet(path1).count() == 90)
    val manifest = Paths.get(path1).resolve("_MANIFEST")

    // a truncated/corrupt manifest whose count suffix is non-numeric
    // used to throw NumberFormatException out of the pattern guard and
    // fail the query — it must fall into the wipe-and-restage branch
    val fp = Files.readString(manifest).split("\n#staged=")(0)
    Files.writeString(manifest, s"$fp\n#staged=garbage")
    val (path2, n2) =
      graft.streaming.StreamingQueries.stageCdcFeed(spark, dir.toString)
    assert(path2 == path1 && n2 == n1)
    assert(spark.read.parquet(path2).count() == 90)
    assert(Files.readString(manifest).endsWith(s"#staged=$n2"),
      "re-stage must rewrite a well-formed manifest")

    // ... and a manifest with no separator at all
    Files.writeString(manifest, "junk-without-separator")
    val (path3, n3) =
      graft.streaming.StreamingQueries.stageCdcFeed(spark, dir.toString)
    assert(path3 == path1 && n3 == n1)
    assert(spark.read.parquet(path3).count() == 90)
  }
}
