package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Sketches

/** Custom Catalyst AGGREGATE function: HyperLogLog distinct-count
  * sketch as a TypedImperativeAggregate — the aggregation-function
  * slot of the extension surface (scalar codegen Expressions, an
  * optimizer Rule and a physical operator cover the other slots).
  *
  * The buffer is the m = 2^p register array itself (one byte per
  * register), updated in place per row, merged between partials by
  * bytewise max — the exact mergeability argument that makes HLL the
  * 100 TB distinct-count: map-side partials are m bytes regardless of
  * input size, and union across any partitioning is lossless.
  *
  * Register and estimator math is BIT-IDENTICAL to the relational
  * sketch ([[graft.operators.Sketches]] withRegCols/closeEstimate,
  * oracle-proven in q37): md5-u32 hash (`Tables.hashU32` semantics),
  * bucket = h mod m, rho = trailing zeros of h/m plus 1 (saturating at
  * 33-p), harmonic sum as exact integers in 2^-32 units, the same
  * α·m² raw estimate, the same micro-nat-quantized linear-counting
  * branch, final round to 4 decimals via HALF_UP BigDecimal — so the
  * native aggregate is hash-checked by the SAME DuckDB oracle as the
  * relational plan (q53 vs q37).
  *
  * Returns struct(v_zero, sum_int, est_hll); null inputs are skipped
  * (an all-null column estimates 0 distinct via the linear-counting
  * branch, matching the relational spine-fill).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"p=$p out of range (alpha needs m >= 128)")
  private val m = 1 << p

  override def prettyName: String = "graft_hll"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("v_zero", LongType, nullable = false),
    StructField("sum_int", LongType, nullable = false),
    StructField("est_hll", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string key (cast first), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      val h = HllSketchAgg.hashU32(k, seed)
      val bucket = (h % m).toInt
      val h2 = h / m
      val rho =
        if (h2 == 0L) (33 - p)
        else java.lang.Long.numberOfTrailingZeros(h2) + 1
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Byte]): Any = {
    var sumInt = 0L
    var vZero = 0L
    var i = 0
    while (i < m) {
      val rho = buffer(i).toInt
      sumInt += (1L << (32 - rho))
      if (rho == 0) vZero += 1
      i += 1
    }
    val mD = m.toDouble
    val raw = Sketches.alphaM2(m) * 4294967296.0 / sumInt
    val est =
      if (raw <= 2.5 * mD && vZero > 0) {
        val micro = BigDecimal(math.log(mD / vZero) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        mD * micro / 1e6
      } else raw
    val rounded = BigDecimal(est)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    new GenericInternalRow(Array[Any](vZero, sumInt, rounded))
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** JVM twin of `Tables.hashU32` (md5 of "key#seed", first 8 hex
    * chars as an unsigned 32-bit value) — must stay in lockstep with
    * the relational/DuckDB definition. */
  def hashU32(key: String, seed: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((key + "#" + seed).getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }
}
