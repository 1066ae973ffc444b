package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot keys. AQE's skew-join handling covers
 * sort-merge joins at runtime; these cover the patterns AQE can't rewrite —
 * a shuffle-hash/broadcast-ineligible join against a small-but-replicable
 * side, and high-cardinality-value aggregation under a hot group key.
 */
object Skew {

  /**
   * Salted equi-join: the big (skewed) side gets a random salt in
   * [0, saltFactor); the small side is replicated saltFactor times so every
   * salted partition finds its match. One hot key's rows then spread over
   * saltFactor reducers instead of one straggler.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(seed = 11) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /**
   * Two-phase salted aggregation for algebraic aggregates under hot keys:
   * partial aggregate on (key, salt), then final aggregate on key. Spark's
   * hash aggregate already does map-side partials; the explicit salt stage
   * additionally breaks up reduce-side hot keys when the partial state per
   * key is large (e.g. collect-style or high-cardinality sketches).
   */
  def saltedAggregate(df: DataFrame, key: String, saltFactor: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 13) * saltFactor).cast("int"))
    val stage1 = salted.groupBy(col(key), col("__salt")).agg(partial.head, partial.tail: _*)
    stage1.groupBy(col(key)).agg(finalAgg.head, finalAgg.tail: _*)
  }
}
