package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin equals a plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows, 80% on one hot key — the salted shape of real pipelines
    val left = spark.range(10000)
      .select(when(col("id") % 5 =!= 0, col("id") % 7).otherwise(999L).as("k"),
        col("id").as("v"))
    val right = Seq.range(0L, 7L).map(k => (k, s"dim$k"))
      .:+((999L, "hot")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    assert(salted == plain)
  }

  test("connectedComponents: salted path equals unsalted on a hub graph") {
    import spark.implicits._
    // power-law shape: two hubs of degree ~2500, plus a chain hanging
    // off each hub (exercises multi-round propagation under salting)
    val spokes = spark.range(10, 5000)
      .select(col("id").as("a"), (col("id") % 2).as("b"))
    val chain = Seq((0L, 5000L), (5000L, 5001L), (5001L, 5002L),
      (1L, 6000L), (6000L, 6001L)).toDF("a", "b")
    val edges = spokes.unionByName(chain)
    def labelsOf(saltAbove: Long) =
      graft.operators.Dedup.connectedComponents(edges,
          saltAbove = saltAbove)
        .orderBy("id").collect().toSeq
    val unsalted = labelsOf(Long.MaxValue) // probe never trips
    val salted = labelsOf(100L)            // hub degree 2500 trips it
    assert(salted == unsalted)
    // both resolve to exactly two components labeled by their min ids
    assert(salted.map(_.getLong(1)).distinct.sorted == Seq(0L, 1L))
  }

  test("saltedAgg matches direct aggregation for collect-style aggs") {
    import spark.implicits._
    val df = spark.range(1000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 4,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      merge = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }
}
