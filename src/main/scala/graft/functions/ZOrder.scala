package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving for two integral columns.
  *
  * Sorting/range-partitioning data files by the interleaved value bounds
  * each file's min/max range in BOTH source dimensions, so stats pruning
  * works for filters on either column — the standard multi-dimensional
  * clustering technique for lake tables (lexicographic sort orders prune
  * only their leading column).
  *
  * The result is a 16-byte binary (full 64-bit precision per input;
  * byte arrays sort unsigned-lexicographically in Spark, which is exactly
  * the interleaved-bit order).
  */
object ZOrderOps {

  /** Order-preserving mapping of a signed long onto unsigned space. */
  private def flip(v: Long): Long = v ^ Long.MinValue

  /** Interleave all 64 bits of each (order-preserving-normalized) input
    * into a 128-bit big-endian byte string: a's bit i lands at output bit
    * 2i, b's at 2i+1 (from the MSB). The binary fast path of
    * [[interleaveN]] — identical output for n=2 (spec-pinned).
    */
  def interleave(a: Long, b: Long): Array[Byte] = {
    val ha = flip(a)
    val hb = flip(b)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 64) {
      if (((ha >>> (63 - i)) & 1L) != 0) {
        val pos = i * 2
        out(pos >> 3) = (out(pos >> 3) | (0x80 >>> (pos & 7))).toByte
      }
      if (((hb >>> (63 - i)) & 1L) != 0) {
        val pos = i * 2 + 1
        out(pos >> 3) = (out(pos >> 3) | (0x80 >>> (pos & 7))).toByte
      }
      i += 1
    }
    out
  }

  /** N-way Morton interleave: input k's bit i (from the MSB) lands at
    * output bit i·n + k of an 8n-byte big-endian string — the general
    * multi-dimensional clustering key (3+ dims like (day, customer,
    * region) are routine on lake tables).
    */
  def interleaveN(vs: Array[Long]): Array[Byte] = {
    val n = vs.length
    val out = new Array[Byte](8 * n)
    var k = 0
    while (k < n) {
      val h = flip(vs(k))
      var i = 0
      while (i < 64) {
        if (((h >>> (63 - i)) & 1L) != 0) {
          val pos = i * n + k
          out(pos >> 3) = (out(pos >> 3) | (0x80 >>> (pos & 7))).toByte
        }
        i += 1
      }
      k += 1
    }
    out
  }

  /** Integral coercion shared by both z-order expressions. Doubles and
    * floats TRUNCATE toward zero — exactly the semantics of the
    * generated code's Java `(long)` cast, so interpreted and codegen
    * evaluation can never disagree (the scaled inputs are long/long
    * divisions, which Spark types as double).
    */
  def toLongVal(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: Double => d.toLong
    case f: Float => f.toLong
    case other => throw new IllegalArgumentException(
      s"zorder needs numeric inputs, got $other")
  }

  /** Unsigned lexicographic comparison (test/audit helper). */
  def compareZ(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}

/** Catalyst expression wrapper (interpreted + codegen via static call). */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "zorder"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(ZOrderOps.toLongVal(a), ZOrderOps.toLongVal(b))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ZOrderOps.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) =>
      s"$helper.interleave((long) $a, (long) $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrderLong = copy(left = newLeft, right = newRight)
}

/** N-ary Morton interleave expression (codegen'd): null if ANY input is
  * null, else `ZOrderOps.interleaveN` over the long-cast inputs. Built
  * internally over range-scaled long columns (see `zorderScaledN`).
  */
case class ZOrderN(children: Seq[Expression]) extends Expression {
  require(children.size >= 2, "zorder needs at least 2 columns")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = ZOrderOps.toLongVal(v)
      i += 1
    }
    ZOrderOps.interleaveN(arr)
  }

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val helper = ZOrderOps.getClass.getName.stripSuffix("$")
    val arr = ctx.freshName("zvals")
    val evals = children.map(_.genCode(ctx))
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      code"""
        ${e.code}
        if (${e.isNull}) { ${ev.isNull} = true; }
        else { $arr[$i] = (long) ${e.value}; }
      """
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long[] $arr = new long[${children.size}];
        $assigns
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) { ${ev.value} = $helper.interleaveN($arr); }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN = copy(children = newChildren)
}

object ZOrder {
  import org.apache.spark.sql.functions._

  /** Column API: `transforms`-style entry point. Raw-bit interleave —
    * dimensions should span comparable bit ranges; otherwise use
    * zorderScaled.
    */
  def zorder(a: Column, b: Column): Column =
    Bridge.column(ZOrderLong(Bridge.expression(a), Bridge.expression(b)))

  private def scale(c: Column, lo: Long, hi: Long): Column = {
    val range = math.max(1L, hi - lo)
    // (c - lo) * Int.MaxValue / range in long arithmetic; safe for
    // ranges up to 2^32
    (c.cast("long") - lit(lo)) * lit(Int.MaxValue.toLong) / lit(range)
  }

  /** Range-normalized z-order: each dimension is min-max scaled onto the
    * same 31-bit space before interleaving, so dimensions with very
    * different value ranges (the common case) contribute bits at the
    * same significance — without this, the wider dimension's low bits
    * dominate the sort and the narrow dimension never clusters.
    */
  def zorderScaled(a: Column, aMin: Long, aMax: Long,
      b: Column, bMin: Long, bMax: Long): Column =
    zorder(scale(a, aMin, aMax), scale(b, bMin, bMax))

  /** N-dimensional range-normalized z-order over (column, min, max)
    * dims — 3+ clustering dimensions are routine on lake tables.
    */
  def zorderScaledN(dims: Seq[(Column, Long, Long)]): Column = {
    require(dims.size >= 2, "zorderScaledN needs at least 2 dimensions")
    Bridge.column(ZOrderN(dims.map { case (c, lo, hi) =>
      Bridge.expression(scale(c, lo, hi)) }))
  }
}
