package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sharded gzip-JSONL corpus writer/reader — the de-facto interchange
  * format of public LLM training corpora (RedPajama, Dolma, HF
  * datasets ship `*.jsonl.gz` shards). Same contract as the TFRecord
  * sink (reference naming `%05d-of-%05d`, cf.
  * reference make_tf_record.py:57-63 for the shard-name scheme): the
  * writer controls shard COUNT and NAMING exactly — Spark's native
  * json sink emits opaque part-files, which is the wrong contract for
  * a corpus that downstream loaders address by shard index.
  *
  * Row→line serialization happens in codegen'd Catalyst (`to_json` on
  * a struct of every column) BEFORE the writer sees the data; the
  * executor-side writer only streams UTF-8 bytes through gzip. Shards
  * are the split unit on read (gzip has no sync markers) — produce
  * enough shards at write time, the same answer TFRecord gives.
  */
object JsonlShards {

  /** Write `df` as `numShards` gzip JSONL shards under `dir`, named
    * `{baseName}_{i}%05d-of-{numShards}%05d.jsonl.gz`. Returns the
    * (path, rowCount) receipt per shard — metadata-sized, the only
    * thing collected. */
  def write(df: DataFrame, dir: String, baseName: String,
      numShards: Int): Seq[(String, Long)] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val lines = df
      .select(to_json(struct(df.columns.map(col): _*)).as("line"))
    val confB = df.sparkSession.sparkContext.broadcast(
      new SerializableHadoopConf(
        df.sparkSession.sessionState.newHadoopConf()))
    // overwrite semantics live on the DRIVER, before any task runs: a
    // shard left by a PREVIOUS job is deleted here, so the executor
    // publish below never needs delete-then-rename (whose delete can
    // land after a sibling attempt's rename and then die, losing the
    // shard) — within one job, first-rename-wins decides attempts
    locally {
      val hc = df.sparkSession.sessionState.newHadoopConf()
      (0 until numShards).foreach { pid =>
        val p = new Path(dir,
          f"${baseName}_$pid%05d-of-$numShards%05d.jsonl.gz")
        val fs = p.getFileSystem(hc)
        if (fs.exists(p)) fs.delete(p, false)
      }
    }
    lines.repartition(numShards).rdd.mapPartitionsWithIndex {
      (pid, rows) =>
        val name = f"${baseName}_$pid%05d-of-$numShards%05d.jsonl.gz"
        val path = new Path(dir, name)
        val fs = path.getFileSystem(confB.value.value)
        // attempt-unique tmp + rename commit: a retried or speculative
        // task attempt must never interleave with another writer on the
        // final path (a half-written gzip stream is silently truncated
        // on read) — the same publish discipline as the manifest writer
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dir, s".$name.tmp-$attempt")
        val out = new DataOutputStream(new BufferedOutputStream(
          new java.util.zip.GZIPOutputStream(fs.create(tmp, true)),
          1 << 16))
        var n = 0L
        try rows.foreach { r =>
          out.write(r.getString(0).getBytes("UTF-8"))
          out.write('\n')
          n += 1
        } finally out.close()
        // first-rename-wins publish: rename onto an existing path FAILS
        // on HDFS and the local FS, so the winner is decided atomically
        // by the filesystem — a loser must NOT delete-then-rename (the
        // delete could land after the winner's rename and then die,
        // leaving the shard missing after the job reported success).
        // Losers discard their tmp; shard content is attempt-invariant
        // (same partition, same rows), so either winner is correct.
        if (!fs.rename(tmp, path)) {
          if (fs.exists(path)) fs.delete(tmp, false)
          else throw new java.io.IOException(s"rename $tmp -> $path failed")
        }
        Iterator.single(path.toString -> n)
    }.collect().toSeq.sortBy(_._1)
  }

  /** Read JSONL shards matching `pattern` with an explicit schema
    * (schema inference would scan twice AND let a corrupt shard morph
    * the schema silently). Gzip is decompressed by extension;
    * parallelism = shards. */
  def read(spark: SparkSession, pattern: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).json(pattern)
}
