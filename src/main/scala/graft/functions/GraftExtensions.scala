package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the Iceberg transform
  * functions for SQL use, so
  *
  * {{{
  * spark.sql("SELECT iceberg_bucket(16, l_orderkey) FROM t")
  * }}}
  *
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[functions] val registrations: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "iceberg_bucket(numBuckets, col)")
        IcebergBucket(args(1), intArg(args.head, "numBuckets"))
      }),
    (new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[HyperplaneLshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "lsh_bucket(col, planes, dims)")
        HyperplaneLshBucket(args.head, intArg(args(1), "planes"),
          intArg(args(2), "dims"))
      }))

  /** Install the functions on an already-running session (extensions only
    * apply at build time; this covers shared/driver-provided sessions).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, id, info, builder)
    }
}
