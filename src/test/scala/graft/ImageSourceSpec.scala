package graft

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.functions.ImageKernels
import graft.sources.ImageSource

/** End-to-end source parity (SURVEY §2.1/§2.2): directory-tree scan with
  * label-from-path, dims probe, 5-field record schema, and the sharded
  * split-partitioned encode job — the reference's make_tf_record.py
  * flow on a synthetic on-disk image corpus. */
class ImageSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpusDir: String = {
    val root = java.nio.file.Files.createTempDirectory("graft_imgs_").toFile
    val classes = Seq("daisy", "roses", "tulips")
    var i = 0
    for (cls <- classes; k <- 0 until 4) {
      val d = new File(root, cls); d.mkdirs()
      val bi = new BufferedImage(8 + k, 6 + k, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth)
        bi.setRGB(x, y, (i * 31 + y * 7 + x) & 0xffffff)
      ImageIO.write(bi, "png", new File(d, s"img_$k.png"))
      i += 1
    }
    root.getAbsolutePath
  }

  test("scanTree + withLabels: classes from dirnames, sorted dense ids") {
    val scanned = ImageSource.withLabels(ImageSource.scanTree(spark, corpusDir))
    assert(scanned.count() == 12)
    val labels = scanned.select("class_name", "label").distinct()
      .as[(String, Long)].collect().toMap
    assert(labels == Map("daisy" -> 0L, "roses" -> 1L, "tulips" -> 2L))
  }

  test("dims probe + record schema round-trip") {
    val rec = ImageSource.toRecordSchema(
      ImageSource.withDims(
        ImageSource.withLabels(ImageSource.scanTree(spark, corpusDir))))
    assert(rec.columns.toSeq ==
      Seq("encoded", "format", "label", "height", "width"))
    val dims = rec.select("height", "width").as[(Int, Int)].collect()
    assert(dims.contains((6, 8)) && dims.contains((9, 11)))
    assert(rec.select("format").distinct().as[String].collect().toSeq ==
      Seq("png"))
    // decode what was encoded: full pixel round-trip through the kernel
    val first = rec.filter(col("height") === 6).select("encoded")
      .as[Array[Byte]].head()
    val img = ImageKernels.decode(first)
    assert(img.h == 6 && img.w == 8)
  }

  test("encodeJob writes split-partitioned sharded parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_enc_").toString
    val rec = ImageSource.toRecordSchema(
      ImageSource.withDims(
        ImageSource.withLabels(ImageSource.scanTree(spark, corpusDir))))
      .withColumn("key", md5(col("encoded")))
    ImageSource.encodeJob(rec, "key", 42, valCount = 3, shards = 2, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 12)
    assert(back.filter(col("split") === "validation").count() == 3)
    assert(back.select("shard").distinct().count() == 2)
    // partition pruning: the split filter must prune at the scan
    val plan = back.filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("validation"))
  }

  test("train kernel runs distributed over the scanned corpus") {
    val rec = ImageSource.toRecordSchema(
      ImageSource.withDims(
        ImageSource.withLabels(ImageSource.scanTree(spark, corpusDir))))
    val out = rec.withColumn("seed",
        Tables.hashU32(md5(col("encoded")), 42))
      .withColumn("feat",
        ImageKernels.trainKernel(col("encoded"), col("seed"),
          lit(4), lit(4)))
      .select(col("label"), col("feat"))
    val rows = out.as[(Int, Seq[Float])].collect()
    assert(rows.length == 12)
    assert(rows.forall(_._2.length == 4 * 4 * 3))
    assert(rows.forall(_._2.forall(v => v >= -1f && v <= 1f)))
  }
}
