package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split handles most runtime skew; salting is the static
  * fallback when one (or a few) join keys dominate so heavily that even
  * split sub-partitions overwhelm an executor — the classic power-law
  * key distribution of web-scale training data.
  */
object Skew {

  /** Salted broadcast-free equi-join for a skewed LEFT side: the right
    * side is replicated `salts` times (one copy per salt), the left side
    * picks a deterministic pseudo-random salt per row, and the join key
    * becomes (key, salt) — splitting each hot key's rows across `salts`
    * reducers. Semantics identical to `left.join(right, keys)` (inner).
    *
    * Use when the right side is too big to broadcast but small enough to
    * replicate `salts`×; otherwise prefer AQE skew handling.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic per-row salt: hash of the whole row, not rand() —
    // re-execution of a lost partition must re-derive the same salt
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt stage, for non-algebraic
    * aggregates (e.g. collect_list/exact distinct assembly) where map-side
    * partial aggregation cannot shrink a hot key. `partial` aggregates
    * within (key, salt); `merge` combines the per-salt results per key.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(salts > 1, "salts must be > 1")
    df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
