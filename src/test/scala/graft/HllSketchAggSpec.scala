package graft

import org.apache.spark.sql.functions._

import graft.functions.HllSketchAgg
import graft.operators.Sketches

/** The native HLL aggregate must be bit-identical to the relational
  * register-file sketch on every output field, across partitionings. */
class HllSketchAggSpec extends SparkSpec {
  import spark.implicits._

  test("hashU32 JVM twin equals the SQL hashU32") {
    val keys = Seq("a", "xyz", "42", "", "éclair")
    val viaSql = keys.toDF("k")
      .select(col("k"), Tables.hashU32(col("k"), 7).as("h"))
      .as[(String, Long)].collect().toMap
    keys.foreach { k =>
      assert(HllSketchAgg.hashU32(k, 7) == viaSql(k), s"key $k")
    }
  }

  test("native aggregate equals the relational sketch, any partitioning") {
    val df = spark.range(5000)
      .select((col("id") % 1371L).cast("string").as("k"))
    for (parts <- Seq(1, 7)) {
      val native = df.repartition(parts)
        .agg(Sketches.hllAggNative(col("k"), 8, 5).as("h"))
        .select(col("h.v_zero"), col("h.sum_int"), col("h.est_hll"))
        .as[(Long, Long, Double)].head()
      val relational = Sketches.estimateFromRegisters(
        Sketches.hllRegisters(df, col("k"), 8, 5)
          .groupBy(col("bucket")).agg(max(col("rho")).as("maxrho")), 8)
        .as[(Long, Long, Double)].head()
      assert(native == relational, s"parts=$parts")
    }
  }

  test("nulls are skipped; empty input estimates zero-ish via LC branch") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val withNulls = df.agg(Sketches.hllAggNative(col("k")).as("h"))
      .select(col("h.v_zero")).as[Long].head()
    val noNulls = Seq("a", "b").toDF("k")
      .agg(Sketches.hllAggNative(col("k")).as("h"))
      .select(col("h.v_zero")).as[Long].head()
    assert(withNulls == noNulls)
    // all-null group: every register empty -> v_zero = m
    val allNull = Seq(None: Option[String]).toDF("k")
      .agg(Sketches.hllAggNative(col("k")).as("h"))
      .select(col("h.v_zero")).as[Long].head()
    assert(allNull == 256L)
  }
}
