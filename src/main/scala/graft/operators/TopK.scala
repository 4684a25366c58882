package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed `Aggregator` (SURVEY §2.9's
  * custom-aggregation slot).
  *
  * Why this exists next to the window formulation (Events.topKPerGroup):
  * `row_number().over(partitionBy(g).orderBy(s))` sorts EVERY group
  * fully — at 100 TB that is a total sort of the fact table. The
  * Aggregator keeps a k-element buffer, combines map-side
  * (partial aggregation), and only k rows per group ever cross the
  * shuffle. Same results — `q17_topk_agg` shares q12's DuckDB oracle.
  */
object TopK {

  /** One scored row: ordered by score desc, then id asc (ties). */
  final case class Scored(score: Double, id: Long)

  private def ord: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  final class TopKAgg(k: Int)
      extends Aggregator[(String, Double, Long), Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], a: (String, Double, Long)): Seq[Scored] =
      ((b :+ Scored(a._2, a._3)).sorted(ord)).take(k)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      ((x ++ y).sorted(ord)).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[Scored]] =
      Encoders.kryo[Seq[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      Encoders.kryo[Seq[Scored]]
  }

  /** Top-k rows per group, Aggregator formulation. Input: (group,
    * score, id) columns; output: (group, rank, id, score) rows. */
  def topKPerGroupAgg(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(groupCol).as("g"),
      col(scoreCol).as("score"), col(idCol).as("id"))
      .as[(String, Double, Long)]
    typed
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn)
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case (s, i) => (g, i + 1L, s.id, s.score) }
      }
      .toDF(groupCol, "rank", idCol, scoreCol)
  }
}
