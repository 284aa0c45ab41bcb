package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: for each headline query, dump the formatted plan
  * and flag the properties that matter at 100 TB — filters pushed to the
  * parquet scan, column-pruned read schemas, broadcast joins on dims, no
  * unintended cartesian products, wide WholeStageCodegen coverage.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audit = Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_join_agg",
      "q04_broadcast_join", "q05_multi_join", "q06_semi_join",
      "q09_window_rank", "q16_topk_per_group", "q21_json_extract",
      "q22_cross_join", "d_dedup_exact", "d_dedup_minhash",
      "d_embed_cosine_topk", "d_ann_lsh", "d_lang_id", "t_bucket")
      .filter(q => only.isEmpty || only.contains(q))

    audit.foreach { name =>
      val df = Registry.byName(name).fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]\\n]+".r
        .findAllIn(plan).toSeq.filterNot(_.contains("[]"))
      val scans = "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq
      val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
      val bnl = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct.size
      println(s"== $name")
      println(s"   pushedFilters=${pushed.size} broadcastHJ=$broadcasts " +
        s"sortMergeJoin=$smj cartesian=$cart bcastNL=$bnl codegenSpans=$codegen")
      pushed.take(3).foreach(p => println(s"   $p"))
      scans.take(4).foreach(s => println(s"   ${s.take(150)}"))
      if (sys.env.contains("PLAN_FULL")) println(plan)
    }
    spark.stop()
  }
}
