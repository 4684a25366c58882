package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation utilities for the 100 TB stance.
  *
  * First line of defence is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`, on by default in Spark 4) — prefer
  * it. Manual salting remains necessary when the skew is on the BUILD
  * side of an aggregation or when a single hot key exceeds what
  * AQE's split granularity can fix; this is that tool.
  */
object Skew {

  /** Salted equi-join of a skewed large side against a small-ish right
    * side: the large side gets a deterministic salt in [0, salts) from
    * md5 of `entropy` (any column that varies within a hot key — a line
    * number, an event id), the right side is replicated `salts` ways,
    * and the join key becomes (key, salt) — a hot key's rows now spread
    * over `salts` reducers. Result equals the unsalted inner join
    * (property-tested). */
  def saltedJoin(large: DataFrame, right: DataFrame, key: String,
      entropy: Column, salts: Int): DataFrame = {
    val saltedL = large.withColumn("__salt",
      pmod(Tables.hashU32(entropy, 31), lit(salts.toLong)))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys —
    * partial aggregate on (key, salt), then final aggregate on key.
    * Expressed here for the count/sum family (re-aggregable measures). */
  def saltedCountSum(df: DataFrame, key: String, entropy: Column,
      valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(Tables.hashU32(entropy, 31), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__c")).as("cnt"), sum(col("__s")).as("sum_value"))
}
