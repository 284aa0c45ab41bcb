package graft.connector

import graft.functions.IcebergHash
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** System functions the catalog exposes so Catalyst can RESOLVE partition
  * transforms (V2ExpressionUtils loads them when a scan reports
  * KeyGroupedPartitioning over a transform): storage-partitioned joins on
  * bucket-partitioned tables hinge on both sides binding the same
  * canonical function. Semantics are exactly the engine's write-side
  * transform (IcebergHash — spec Appendix B murmur3), so the reported
  * clustering NEVER disagrees with how files were actually laid out.
  */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case _ => None
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Iceberg murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket takes (numBuckets, value); got $inputType")
      new BucketBound(inputType(1).dataType)
    }
  }

  class BucketBound(valueType: DataType)
      extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true

    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else {
        val n = input.getInt(0)
        valueType match {
          case IntegerType | DateType =>
            IcebergHash.bucketLong(input.getInt(1).toLong, n)
          case LongType | TimestampType | TimestampNTZType =>
            IcebergHash.bucketLong(input.getLong(1), n)
          case FloatType =>
            IcebergHash.bucketDouble(input.getFloat(1).toDouble, n)
          case DoubleType =>
            IcebergHash.bucketDouble(input.getDouble(1), n)
          case StringType =>
            IcebergHash.bucketUTF8(input.getUTF8String(1), n)
          case BinaryType =>
            IcebergHash.bucketBytes(input.getBinary(1), n)
          case d: DecimalType =>
            IcebergHash.bucketDecimal(
              input.getDecimal(1, d.precision, d.scale), n)
          case t =>
            throw new IllegalStateException(s"unsupported bucket type $t")
        }
      }
  }
}
