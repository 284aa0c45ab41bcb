package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch NDV aggregate (Apache DataSketches): the sketch family
  * the PUBLIC Iceberg Puffin spec standardizes for table statistics
  * (`apache-datasketches-theta-v1` blobs) — emitting it makes graft's
  * ANALYZE output readable by any spec-compliant engine's cost model,
  * where Spark's built-in `hll_sketch_agg` bytes would not be.
  *
  * A TypedImperativeAggregate keeps the live Union object between rows
  * (serialization only at partial-aggregate shuffle boundaries), so the
  * per-row cost is one hash update — the same partial-merge shape as
  * the built-in sketch aggregates. Result/serialized form is the
  * compact ordered sketch, which `Union.union(Memory)` re-absorbs, so
  * sketches persisted by one ANALYZE can be UNIONed by a later one.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case ShortType => buffer.update(v.asInstanceOf[Short].toLong)
      case ByteType => buffer.update(v.asInstanceOf[Byte].toLong)
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case FloatType => buffer.update(v.asInstanceOf[Float].toDouble)
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new UnsupportedOperationException(
        s"theta_sketch_agg over unsupported type $dt")
    }
    buffer
  }

  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchAgg = copy(child = newChild)
}

object ThetaSketchAgg {
  /** Column form. */
  def agg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(
      ThetaSketchAgg(org.apache.spark.sql.graft.Bridge.expression(c))
        .toAggregateExpression())

  /** NDV estimate of a serialized compact sketch. */
  def estimate(bytes: Array[Byte]): Long =
    Math.round(Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate)
}
