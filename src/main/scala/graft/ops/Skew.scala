package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * AQE's skew-join handling splits oversized partitions of a sort-merge
  * join at runtime, but it cannot help when a single join KEY is hot (all
  * its rows must still meet in one task). Salting fixes the hot-key case:
  * the big side scatters each row into one of `salt` sub-keys; the small
  * side replicates each row to all `salt` sub-keys; joining on
  * (key, salt) spreads the hot key over `salt` tasks. Classic trade:
  * small-side shuffle volume × salt for hot-key parallelism × salt.
  *
  * Result is identical to `big.join(small, keys, "inner"|"left")`
  * (property-tested in SkewSpec).
  */
object Skew {

  /** Deterministic per-row salt in [0, n) — hashes the big side's whole
    * row content so it needs no id column and stays stable across runs.
    */
  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(n))

  /** Salted inner/left equi-join on `keys`: `big` scatters, `small`
    * replicates `salt` ways.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val b = big.withColumn("_salt", saltCol(big, salt))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
