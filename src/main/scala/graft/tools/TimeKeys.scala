package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round helper: time registry keys N times each in one JVM
  * (bench-identical session + noop sink) and print per-run wall seconds
  * plus a Spark-job breakdown — jobs launched, total job seconds, and the
  * driver-side gap (wall − jobs), which is metadata/planning/commit work
  * no executor sees. Guide §1: decide whether a key is job-bound or
  * driver-bound before touching it.
  *
  * Usage: runMain graft.tools.TimeKeys <repeats> key[,keyPrefix...]
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val repeats = args(0).toInt
    val keys = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.connector.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verbose = sys.env.get("TIMEKEYS_VERBOSE").contains("1")
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(j.stageInfos.lastOption.map(_.name.take(120)))
            .getOrElse(""),
          j.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc, nt) =>
          jobs += 1; jobNanos += System.nanoTime() - t0
          if (verbose) println(
            f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2fs " +
              f"tasks=$nt%4d  $desc")
        }
      }
    })

    // bench-identical warmup so run 1 is not JVM/codegen cold start
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }

    val selected = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => keys.exists(k => n == k || n.startsWith(k)))
    selected.foreach { name =>
      val times = (1 to repeats).map { i =>
        jobs = 0; jobNanos = 0L
        val t0 = System.nanoTime()
        var setup = 0.0
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          setup = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          println(s"FAIL $name: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // settle so async listener events attribute to the right run
        Thread.sleep(100)
        println(f"$name run$i: total=$dt%.2f setup=$setup%.2f " +
          f"jobs=$jobs jobSec=${jobNanos / 1e9}%.2f " +
          f"driverGap=${dt - jobNanos / 1e9}%.2f")
        dt
      }
      println(f"$name MIN=${times.min}%.2f MED=${times.sorted.apply(times.size / 2)}%.2f")
    }
    spark.stop()
  }
}
