package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe: run registry keys and print per-stage task counts and
  * stage wall times — answers "did this scan/shuffle actually fan out to
  * the core count?" for the cross-scale legs (optimization-round
  * diagnostics only).
  *
  * Usage: runMain graft.tools.ScalingProbe <repeats> key[,key...]
  */
object ScalingProbe {
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

    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add((si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, secs))
      }
    })

    keys.foreach { name =>
      (1 to repeats).foreach { r =>
        stages.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[scaling] $name run$r wall=$wall%.2f")
        stages.forEach { case (n, tasks, secs) =>
          println(f"[scaling]   stage tasks=$tasks%4d ${secs}%7.2fs  $n")
        }
      }
    }
    spark.stop()
  }
}
