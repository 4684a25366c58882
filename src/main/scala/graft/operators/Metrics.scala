package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consumer-side aggregations of the reference training loops
  * (SURVEY.md §2.7): class-id dictionary (the broadcast dict lookup of
  * `generator.py:38` / `make_tf_record.py:151`), one-hot encode (A3,
  * `train.py:85`), accuracy (A2, `train.py:89-91`), per-epoch metric
  * averaging (A4, `train.py:121-151`), class histogram (A5,
  * `data_queue.py:6`). All pure Spark SQL — no UDFs.
  */
object Metrics {

  /** Class dictionary: distinct class names in sorted order → dense ids
    * 0..K-1 (reference sorts class names, `make_tf_record.py:58,151`).
    * Returned as a tiny DataFrame(className, label) intended for a
    * broadcast equi-join against the fact side. */
  def classDictionary(df: DataFrame, classCol: Column,
      nameOut: String = "class_name", idOut: String = "label"): DataFrame =
    // the distinct-class relation is bounded by the class count, so
    // one partition is the honest shape — but expressed as
    // coalesce+sort+position, not an empty-partition window, so the
    // "No Partition Defined" WARN never drowns a real one
    df.select(classCol.as(nameOut)).distinct()
      .coalesce(1).sortWithinPartitions(col(nameOut))
      .withColumn(idOut, monotonically_increasing_id().cast("long"))

  /** Attach the dense label id by broadcast-joining the dictionary —
    * the Spark form of the reference's in-memory dict lookup. */
  def withLabel(df: DataFrame, classCol: String,
      dict: DataFrame, nameCol: String = "class_name"): DataFrame =
    df.join(broadcast(dict), df(classCol) === dict(nameCol)).drop(nameCol)

  /** One-hot encode a label id into a length-k double array (A3) —
    * pure SQL, mirrors `tf.one_hot`. */
  def oneHot(label: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => when(i === label, lit(1.0)).otherwise(lit(0.0)))

  /** argmax over an array column (index of the max element, first win) —
    * the `tf.argmax(logits)` analogue used by accuracy (A2). */
  def argMax(arr: Column): Column =
    (array_position(arr, array_max(arr)) - 1).cast("long")

  /** Accuracy as an aggregate expression: mean of (pred == label). */
  def accuracy(pred: Column, label: Column): Column =
    avg(when(pred === label, 1.0).otherwise(0.0))

  /** Per-epoch metric frame (A4): one row per epoch with mean loss and
    * accuracy, ordered by epoch. */
  def epochMetrics(df: DataFrame, epoch: Column, loss: Column,
      pred: Column, label: Column): DataFrame =
    df.groupBy(epoch.as("epoch"))
      .agg(round(avg(loss), 6).as("avg_loss"),
        round(accuracy(pred, label), 6).as("accuracy"),
        count(lit(1)).as("n_examples"))
      .orderBy(col("epoch"))

  /** Class histogram (A5): record count per label. */
  def classHistogram(df: DataFrame, label: Column): DataFrame =
    df.groupBy(label.as("label")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("label"))
}
