package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin) handles most cases at runtime; these
  * helpers cover the plans AQE can't fix: a broadcast-ineligible join where
  * one key holds a large fraction of all rows, and aggregations whose single
  * hot group overwhelms one reducer.
  *
  * Salting is deterministic (hash of a row id, not rand()) so results are
  * reproducible and testable.
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side gets a deterministic salt
    * in [0, saltFactor); the small side is replicated saltFactor times; the
    * join key becomes (key, salt) so a hot key spreads over `saltFactor`
    * reducers instead of one.
    *
    * `bigSaltSource` must be a column of the big side that distributes rows
    * within a key (a row id / line number — NOT the join key itself).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltSource: Column, saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(bigSaltSource), lit(saltFactor)))
    val replicated = small.withColumn("__salt", explode(typedLit((0 until saltFactor).map(_.toLong))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot groups: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate already
    * map-side-combines, so this only pays off when a single group's PARTIAL
    * results are still too large for one reducer (e.g. collect_list/
    * count-distinct style states); for plain sums/counts prefer groupBy.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                saltSource: Column, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__n")).as("cnt"))
}
