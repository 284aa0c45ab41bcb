package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg single-value hash: murmur3_x86_32 (seed 0) over the spec's
  * per-type byte representation (Iceberg spec "Appendix B: 32-bit Hash
  * Requirements"; the reference models the transform surface in
  * /root/reference/src/model/partition.rs:18 without the hash itself).
  *
  *   - int/long/date/time/timestamp → 8-byte little-endian of the long value
  *   - float/double → hashLong(doubleToLongBits(v)) (floats widened)
  *   - string → UTF-8 bytes; binary/fixed → raw bytes
  *   - decimal → minimum two's-complement big-endian of the unscaled value
  *
  * Plain static methods (Scala object → static forwarders) so generated
  * codegen Java can call them without virtual dispatch.
  */
object IcebergHash {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k: Int): Int = {
    var k1 = k * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h1 = 0 // seed 0 per spec
    var i = 0
    val fastLimit = len - 3
    while (i < fastLimit) {
      val k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 4
    }
    var k1 = 0
    var shift = 0
    while (i < len) {
      k1 |= (data(i) & 0xff) << shift
      shift += 8
      i += 1
    }
    if (shift > 0) h1 ^= mixK1(k1)
    fmix(h1, len)
  }

  /** Long (and int/date/time/timestamp widened to long): two LE blocks. */
  def hashLong(v: Long): Int = {
    var h1 = mixH1(0, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  def hashDouble(v: Double): Int =
    hashLong(java.lang.Double.doubleToLongBits(v))

  // ---- bucket = (hash & Int.MaxValue) % N, the spec's positive mod ----
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketDouble(v: Double, n: Int): Int = (hashDouble(v) & Int.MaxValue) % n
  def bucketBytes(v: Array[Byte], n: Int): Int = (hashBytes(v) & Int.MaxValue) % n
  def bucketUTF8(v: UTF8String, n: Int): Int = bucketBytes(v.getBytes, n)
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucketBytes(v.toJavaBigDecimal.unscaledValue.toByteArray, n)
}

/** `bucket[N]` partition transform as a native Catalyst expression with
  * codegen (reference surface: /root/reference/src/model/partition.rs:18
  * `Transform::Bucket`). Stays inside WholeStageCodegen — no UDF boundary.
  */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, s"bucket count must be positive: $numBuckets")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket"

  protected override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergHash.bucketLong(input.asInstanceOf[Int].toLong, numBuckets)
    // TimestampNTZ included: the model maps Iceberg `timestamp` → NTZ and
    // Spark 4 infers parquet timestamps as NTZ; both are epoch-micros longs
    case LongType | TimestampType | TimestampNTZType =>
      IcebergHash.bucketLong(input.asInstanceOf[Long], numBuckets)
    case FloatType =>
      IcebergHash.bucketDouble(input.asInstanceOf[Float].toDouble, numBuckets)
    case DoubleType =>
      IcebergHash.bucketDouble(input.asInstanceOf[Double], numBuckets)
    case StringType =>
      IcebergHash.bucketUTF8(input.asInstanceOf[UTF8String], numBuckets)
    case BinaryType =>
      IcebergHash.bucketBytes(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType =>
      IcebergHash.bucketDecimal(input.asInstanceOf[Decimal], numBuckets)
    case t => throw new IllegalStateException(s"unsupported bucket type $t")
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = IcebergHash.getClass.getName.stripSuffix("$")
    val fn = child.dataType match {
      case IntegerType | DateType | LongType | TimestampType |
          TimestampNTZType => "bucketLong"
      case FloatType | DoubleType => "bucketDouble"
      case StringType => "bucketUTF8"
      case BinaryType => "bucketBytes"
      case _: DecimalType => "bucketDecimal"
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
