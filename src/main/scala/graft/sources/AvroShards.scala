package graft.sources

import java.io.BufferedInputStream
import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileStream,
  DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container source/sink — the other interchange format a
  * training-data corpus commonly arrives in next to TFRecord (k2) and
  * WebDataset tar (k7). Built directly on the Avro library that ships
  * with Spark (`avro-1.12.1.jar`) against the PUBLIC container spec
  * (avro.apache.org/docs/current/specification: header with embedded
  * writer schema + deflate-capable blocks + 16-byte sync markers).
  *
  * Scale shape: the container format is block-structured with sync
  * markers, so files ARE splittable in principle; this reader keeps
  * the file as the unit of parallelism (one `DataFileStream` per
  * shard, streamed — never whole-file buffered), the same contract as
  * the TFRecord source, with shard count at write time as the
  * parallelism knob. The writer emits one shard per partition through
  * the Hadoop FileSystem API with the real broadcast job
  * configuration, so `hdfs://`/`s3a://` destinations work unchanged.
  * The embedded writer schema makes shards self-describing: the
  * reader resolves fields BY NAME against the requested Spark schema,
  * so column order may differ and extra writer fields are skipped
  * (Avro schema resolution, not positional trust).
  */
object AvroShards {

  /** Spark→Avro schema mapping for the supported leaf types. Every
    * field is a `union(null, T)` exactly like Spark's nullable
    * columns; unsupported types fail loudly at write time. */
  private[graft] def avroSchema(schema: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case dt => throw new IllegalArgumentException(
          s"column '${f.name}': unsupported Avro leaf type ${dt.simpleString}")
      }
      fs.name(f.name).`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), base)).withDefault(null)
    }
    fields.endRecord()
  }

  /** Write `df` as `numShards` Avro container files named
    * `<baseName>_%05d-of-%05d.avro` (the shard naming shared with the
    * TFRecord sink). `codec` is `"null"` or `"deflate"` (both in-spec
    * and dependency-free). Returns (shardPath, recordCount). */
  def write(df: DataFrame, dir: String, baseName: String,
      numShards: Int, codec: String = "null"): Seq[(String, Long)] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(codec == "null" || codec == "deflate",
      s"codec must be null|deflate, got $codec")
    val schema = df.schema
    val avroJson = avroSchema(schema, baseName).toString
    val sc = df.sparkSession.sparkContext
    val confB = sc.broadcast(new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf()))
    df.repartition(numShards).rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avro = new Schema.Parser().parse(avroJson)
      val name = f"${baseName}_$pid%05d-of-$numShards%05d.avro"
      val path = new Path(dir, name)
      val fs = path.getFileSystem(confB.value.value)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro))
      if (codec == "deflate") w.setCodec(CodecFactory.deflateCodec(6))
      w.create(avro, fs.create(path, true))
      var n = 0L
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(avro)
          var i = 0
          while (i < schema.length) {
            val v = if (row.isNullAt(i)) null else schema(i).dataType match {
              case BinaryType =>
                ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
            rec.put(i, v)
            i += 1
          }
          w.append(rec)
          n += 1
        }
      } finally w.close()
      Iterator.single(path.toString -> n)
    }.collect().toSeq.sortBy(_._1)
  }

  /** Convert one decoded record to a Row under the requested Spark
    * schema: fields resolved BY NAME against the writer schema
    * (absent → null), Avro runtime types unwrapped, the Avro-legal
    * numeric promotions (int→long, int/long/float→double,
    * float→double) applied, and any OTHER writer/reader type
    * difference rejected LOUDLY here — the fall-through used to hand
    * the raw object to Catalyst, which died mid-scan with an opaque
    * ClassCastException instead. */
  private def toRow(rec: GenericRecord, fieldIdx: Array[Schema.Field],
      types: Array[DataType]): Row =
    Row.fromSeq(fieldIdx.indices.map { i =>
      val f = fieldIdx(i)
      val v = if (f == null) null else rec.get(f.pos())
      (v, types(i)) match {
        case (null, _) => null
        case (u: Utf8, StringType) => u.toString
        case (s: CharSequence, StringType) => s.toString
        case (b: java.nio.ByteBuffer, BinaryType) =>
          val a = new Array[Byte](b.remaining()); b.get(a); a
        case (x: java.lang.Integer, LongType) => x.longValue()
        case (x: java.lang.Integer, DoubleType) => x.doubleValue()
        case (x: java.lang.Long, DoubleType) => x.doubleValue()
        case (x: java.lang.Float, DoubleType) => x.doubleValue()
        case (x: java.lang.Integer, IntegerType) => x
        case (x: java.lang.Long, LongType) => x
        case (x: java.lang.Float, FloatType) => x
        case (x: java.lang.Double, DoubleType) => x
        case (x: java.lang.Boolean, BooleanType) => x
        case (x, dt) => throw new IllegalArgumentException(
          s"field '${f.name()}': writer value of ${x.getClass.getName} " +
            s"cannot be read as ${dt.simpleString}")
      }
    })

  /** Read Avro container shards matching `pattern` into rows of
    * `schema`, resolving fields by name against each shard's embedded
    * writer schema (missing fields read as null, extra writer fields
    * are ignored). Streams each shard; parallelism = files — see
    * [[readSplit]] for the sync-marker byte-range path when shards
    * are large. */
  def read(spark: SparkSession, pattern: String, schema: StructType,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultMinPartitions
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.binaryFiles(pattern, mp)
      .flatMap { case (_, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        // close at task end: clean-EOF close never fires for a
        // partially consumed partition (limit/take, downstream error)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try raw.close() catch { case _: java.io.IOException => () }))
        val in = new DataFileStream[GenericRecord](raw,
          new GenericDatumReader[GenericRecord]())
        val writerSchema = in.getSchema
        val fieldIdx: Array[Schema.Field] =
          names.map(n => writerSchema.getField(n))
        new Iterator[Row] {
          private var closed = false
          override def hasNext: Boolean = {
            if (closed) false
            else {
              val h = in.hasNext
              if (!h) { in.close(); closed = true }
              h
            }
          }
          override def next(): Row = toRow(in.next(), fieldIdx, types)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** SPLITTABLE read: one task per byte range, each range synced to
    * the container's next 16-byte sync marker — the Hadoop Avro split
    * contract (`sync(start)` then read while `!pastSync(end)`, so
    * every block is consumed by exactly one range). This is the
    * format property that makes Avro corpora scale past the
    * file-per-task contract TFRecord/tar are stuck with: a single
    * 100 GB shard still fans out across the cluster. The driver-side
    * work is one glob listing (paths + lengths only). */
  def readSplit(spark: SparkSession, pattern: String, schema: StructType,
      targetSplitBytes: Long = 32L << 20): DataFrame = {
    require(targetSplitBytes > 0,
      s"targetSplitBytes must be positive, got $targetSplitBytes")
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val globPath = new Path(pattern)
    val fs = globPath.getFileSystem(conf.value)
    // globStatus returns NULL (not empty) for a glob-free path that
    // does not exist — guard or the .toSeq below NPEs
    val matched = Option(fs.globStatus(globPath))
      .map(_.toSeq).getOrElse(Seq.empty)
    val ranges = matched.flatMap { st =>
      (0L until st.getLen by targetSplitBytes).map { start =>
        (st.getPath.toString, start,
          math.min(start + targetSplitBytes, st.getLen))
      }
    }
    require(ranges.nonEmpty,
      s"no non-empty files match $pattern (${matched.size} matched)")
    val rows = spark.sparkContext
      .parallelize(ranges, ranges.size)
      .flatMap { case (p, start, end) =>
        val in = new FsInput(new Path(p), conf.value)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        val reader = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        reader.sync(start)
        val writerSchema = reader.getSchema
        val fieldIdx: Array[Schema.Field] =
          names.map(n => writerSchema.getField(n))
        new Iterator[Row] {
          private var done = false
          override def hasNext: Boolean = {
            if (done) false
            else {
              val h = reader.hasNext && !reader.pastSync(end)
              if (!h) { reader.close(); done = true }
              h
            }
          }
          override def next(): Row = toRow(reader.next(), fieldIdx, types)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
