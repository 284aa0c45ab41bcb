package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iceberg partition transforms as a Column API (reference surface:
  * /root/reference/src/model/partition.rs:18 `Transform` — void, identity,
  * year, month, day, hour, bucket[N], truncate[W]).
  *
  * bucket is a native Catalyst expression (murmur3 spec hash, codegen);
  * the calendar/truncate transforms compose built-ins, so Catalyst can
  * constant-fold and push them around freely. Ordinals follow the spec:
  * years/months/days/hours SINCE the 1970 epoch (signed).
  */
object transforms {

  /** bucket[N]: spec murmur3 hash mod N. */
  def bucket(n: Int, c: Column): Column =
    Bridge.column(IcebergBucket(Bridge.expression(c), n))

  /** truncate[W] for integral columns: v - (((v % W) + W) % W). */
  def truncateInt(w: Int, c: Column): Column = c - pmod(c, lit(w))

  /** truncate[W] for strings: first W codepoints. */
  def truncateString(w: Int, c: Column): Column = substring(c, 1, w)

  /** truncate[W] for decimals: floor to a multiple of W units. */
  def truncateDecimal(w: Int, c: Column): Column = c - pmod(c, lit(w))

  /** years since 1970 (int). */
  def years(c: Column): Column = (year(c) - lit(1970)).cast("int")

  /** months since 1970-01 (int). */
  def months(c: Column): Column =
    ((year(c) - lit(1970)) * lit(12) + month(c) - lit(1)).cast("int")

  /** days since 1970-01-01 (int). */
  def days(c: Column): Column = datediff(to_date(c), lit("1970-01-01"))

  /** hours since 1970-01-01T00 (int; `div` truncation — inputs here are
    * post-epoch; pre-epoch values would need floorDiv).
    */
  def hours(c: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(unix_timestamp(c)),
        org.apache.spark.sql.catalyst.expressions.Literal(3600L)))
      .cast("int")

  /** identity transform. */
  def identityT(c: Column): Column = c

  /** void transform: always NULL, preserving the column type. */
  def voidT(c: Column): Column = when(lit(false), c)
}
