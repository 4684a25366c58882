package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative row-level CHECK constraints at ingest (the Delta/DLT
  * "expectations" shape): each rule is a named boolean Column; a row's
  * `reasons` bitmask sets bit i when rule i is VIOLATED (same audit
  * convention as the t19 Gopher gate — you can always answer WHY a row
  * was quarantined, per rule, from the output alone). Validation is a
  * pure map stage — no shuffle, no UDF, whole-stage codegen — so
  * gating 100 TB costs exactly one scan.
  */
object Constraints {

  /** Tag every row with its violation bitmask (0 = clean). Null rule
    * results count as violations: a CHECK that cannot be proven true
    * must not admit the row (SQL CHECK semantics admit UNKNOWN; an
    * ingest gate must not — a null-lang row is bad data, not
    * arguably-fine data). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 62, s"1..62 rules required")
    val mask = rules.zipWithIndex.map { case ((_, rule), i) =>
      when(coalesce(rule, lit(false)), lit(0L)).otherwise(lit(1L << i))
    }.reduce(_ + _)
    df.withColumn("reasons", mask)
  }

  /** Gate + commit: clean rows land as one version of the versioned
    * table at `dir`; violators are returned with their reasons. The
    * commit is the q73 manifest protocol, so a crash mid-ingest leaves
    * the table at its previous version — the quarantine relation and
    * the committed version together account for every input row
    * exactly once. Returns (committedVersion, quarantine). */
  def gateCommit(df: DataFrame, rules: Seq[(String, Column)],
      dir: String): (Int, DataFrame) = {
    val checked = check(df, rules)
    val v = graft.sources.VersionedTable.commit(
      checked.filter(col("reasons") === 0L).drop("reasons"), dir)
    (v, checked.filter(col("reasons") =!= 0L))
  }
}
