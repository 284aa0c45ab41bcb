package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Optimistic-concurrency behavior: parallel appends race on the
  * metadata version slot (CREATE_NEW claim) and must ALL land via
  * rebase-and-retry, with no lost updates and an intact snapshot chain.
  */
class ConcurrencySpec extends SparkSpec {

  test("concurrent appends all commit; no lost updates; linear history") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(400)
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("conc").toString + "/t",
      src.schema)
    val writers = 6
    val perWriter = src.count() // each appends the same 400 rows
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (1 to writers).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = t.append(src).snapshotId
        })
      }
      val snapIds = futures.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      assert(snapIds.distinct.size == writers)
    } finally pool.shutdown()
    // every append landed exactly once
    assert(t.scan().count() == perWriter * writers)
    assert(t.countRows() == perWriter * writers)
    val meta = t.metadata
    val snaps = meta.snapshots.get
    assert(snaps.size == writers)
    // sequence numbers are a gapless 1..N chain (each retry rebased)
    assert(snaps.map(_.sequenceNumber).sorted == (1L to writers.toLong))
    // each snapshot's manifest list reuses every prior manifest: the
    // latest references exactly one shard-set per commit
    assert(t.liveManifests().map(_.addedSequenceNumber.get).distinct.size ==
      writers)
  }
}
