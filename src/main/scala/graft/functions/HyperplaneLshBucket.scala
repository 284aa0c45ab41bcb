package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH helpers shared by the interpreted and codegen
  * paths. The ±1 plane matrix is deterministic per (planes, dims) so
  * buckets are stable across runs and across the Column-API / SQL paths.
  */
object LshOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** Flat planes×dims Rademacher matrix; `table` selects an independent
    * deterministic plane set so multi-table LSH (banding) gets genuinely
    * different hash families per table.
    */
  def matrix(planes: Int, dims: Int, table: Int): Array[Double] =
    cache.computeIfAbsent((planes, dims, table), { case (p, d, t) =>
      val rnd = new scala.util.Random(0x5ca1ab1eL ^ (t * 0x9e3779b97f4a7c15L))
      Array.fill(p * d)(if (rnd.nextBoolean()) 1.0 else -1.0)
    })

  /** Sign-bit bucket of a float-array vector (tight JVM loop; called from
    * generated code — no per-element lambda dispatch).
    */
  def bucketFloats(arr: ArrayData, planes: Int, dims: Int, table: Int): Int = {
    val m = matrix(planes, dims, table)
    val n = math.min(dims, arr.numElements())
    var b = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val off = p * dims
      var i = 0
      while (i < n) { dot += arr.getFloat(i) * m(off + i); i += 1 }
      b = (b << 1) | (if (dot >= 0) 1 else 0)
      p += 1
    }
    b
  }

  /** Same for double-element vectors. */
  def bucketDoubles(arr: ArrayData, planes: Int, dims: Int, table: Int): Int = {
    val m = matrix(planes, dims, table)
    val n = math.min(dims, arr.numElements())
    var b = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val off = p * dims
      var i = 0
      while (i < n) { dot += arr.getDouble(i) * m(off + i); i += 1 }
      b = (b << 1) | (if (dot >= 0) 1 else 0)
      p += 1
    }
    b
  }
}

/** Native LSH bucket expression over an embedding array column.
  * Interpreted HOF pipelines pay per-element lambda dispatch on every
  * multiply-add; this stays a flat JVM loop inside WholeStageCodegen.
  */
case class HyperplaneLshBucket(child: Expression, planes: Int, dims: Int,
    table: Int = 0)
    extends UnaryExpression {
  require(planes > 0 && planes <= 30 && dims > 0 && table >= 0)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case t => throw new IllegalArgumentException(s"lsh_bucket needs array, got $t")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    elementType match {
      case FloatType => LshOps.bucketFloats(arr, planes, dims, table)
      case DoubleType => LshOps.bucketDoubles(arr, planes, dims, table)
      case t => throw new IllegalArgumentException(s"unsupported element $t")
    }
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = LshOps.getClass.getName.stripSuffix("$")
    val fn = elementType match {
      case FloatType => "bucketFloats"
      case DoubleType => "bucketDoubles"
      case t => throw new IllegalArgumentException(s"unsupported element $t")
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $planes, $dims, $table)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}
