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
    * thing collected.
    *
    * Publish protocol — write-tmp-then-swap, with the swap on the
    * DRIVER after the whole job succeeds:
    *   1. every task attempt writes an attempt-unique hidden tmp file
    *      and NEVER touches a final shard path (a retried/speculative
    *      attempt can therefore never interleave with a published
    *      shard — a half-written gzip stream is silently truncated on
    *      read);
    *   2. only after collect() proves every partition wrote its tmp
    *      does the driver (a) delete stale shards from any prior run —
    *      including shards named with a DIFFERENT -of-NNNNN count,
    *      which a per-path pre-delete would miss — then (b) rename one
    *      winning tmp per shard index into place and drop tmp litter.
    * A job that fails mid-write leaves the previous run's output fully
    * intact (the old eager pre-delete destroyed it before the first
    * task ran). The swap window itself is numShards metadata renames,
    * not data writes. Attempt winners are arbitrary but shard content
    * is attempt-invariant (same partition, same rows), so any winner
    * is correct; note that local-FS rename overwrites an existing
    * destination (POSIX last-rename-wins) — safe here because finals
    * are only written in step 2b after stale paths are gone, by a
    * single driver thread. Concurrent jobs writing the same
    * dir/baseName are NOT supported (same as any directory-swap sink).
    */
  def write(df: DataFrame, dir: String, baseName: String,
      numShards: Int): Seq[(String, Long)] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val lines = df
      .select(to_json(struct(df.columns.map(col): _*)).as("line"))
    val confB = df.sparkSession.sparkContext.broadcast(
      new SerializableHadoopConf(
        df.sparkSession.sessionState.newHadoopConf()))
    val tmpResults = lines.repartition(numShards).rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val name = f"${baseName}_$pid%05d-of-$numShards%05d.jsonl.gz"
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dir, s".$name.tmp-$attempt")
        val fs = tmp.getFileSystem(confB.value.value)
        val out = new DataOutputStream(new BufferedOutputStream(
          new java.util.zip.GZIPOutputStream(fs.create(tmp, true)),
          1 << 16))
        var n = 0L
        try rows.foreach { r =>
          out.write(r.getString(0).getBytes("UTF-8"))
          out.write('\n')
          n += 1
        } finally out.close()
        Iterator.single((pid, tmp.toString, n))
      }.collect()
    // the job succeeded — swap. One winner per shard index (duplicates
    // only arise from speculative attempts whose results both reached
    // the driver; content is attempt-invariant so the choice is moot).
    val hc = df.sparkSession.sessionState.newHadoopConf()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hc)
    val stale = fs.globStatus(
      new Path(dir, s"${baseName}_*-of-*.jsonl.gz"))
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
    val winners = tmpResults.groupBy(_._1).toSeq.map(_._2.head)
    val published = winners.map { case (pid, tmpPath, n) =>
      val finalPath = new Path(dir,
        f"${baseName}_$pid%05d-of-$numShards%05d.jsonl.gz")
      if (!fs.rename(new Path(tmpPath), finalPath))
        throw new java.io.IOException(
          s"publish rename $tmpPath -> $finalPath failed")
      finalPath.toString -> n
    }
    // tmp litter from losing attempts (and nothing else — the glob is
    // anchored on this baseName's hidden tmp prefix)
    val litter = fs.globStatus(new Path(dir, s".${baseName}_*.tmp-*"))
    if (litter != null) litter.foreach(l => fs.delete(l.getPath, false))
    published.sortBy(_._1)
  }

  /** Read JSONL shards matching `pattern` with an explicit schema
    * (schema inference would scan twice AND let a corrupt shard morph
    * the schema silently). Gzip is decompressed by extension;
    * parallelism = shards. */
  def read(spark: SparkSession, pattern: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).json(pattern)
}
