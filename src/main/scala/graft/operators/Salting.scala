package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (the manual fallback when AQE's
  * skew-join split doesn't apply, e.g. a broadcast-ineligible dimension
  * joined on a power-law key).
  *
  * `saltedJoin(big, small, key, n)`: the big side gets a deterministic salt
  * in [0, n) derived from non-key columns (`xxhash64` of the whole row — no
  * `rand()`, so retries/speculative tasks stay consistent), the small side
  * is exploded n×, and the join key becomes (key, salt) — a hot key's rows
  * spread across n reducers instead of one.
  */
object Salting {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts))
    val bigS = big.withColumn("__salt", saltCol.cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with a salted first phase —
    * the pattern for skewed groupBy when the aggregate is algebraic.
    * `aggs` maps output column name → (rowLevelExpr, mergeExpr); e.g.
    * count: (lit(1L), sum), sum(x): (x, sum). */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"sum_$valueCol"), sum("__n").as("n"))
  }
}
