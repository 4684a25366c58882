package graft

import org.apache.spark.sql.functions._

/** k13 quarantine receipts beyond the census: the corrupt-record
  * column carries the raw malformed line (so a quarantine sink can
  * persist it for replay), data columns are null exactly on corrupt
  * rows, and good rows round-trip every field. */
class QuarantineSpec extends SparkSpec {

  test("corrupt rows carry the raw line; good rows round-trip") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val line = to_json(struct(col("doc_id"), col("text"),
      col("lang"), col("n_chars")))
    val mangled = docs.select(col("doc_id").as("orig_id"),
      when(col("doc_id") % 7 === 0,
        substring(line, lit(1), (length(line) / 2).cast("int")))
        .otherwise(line).as("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_quar_spec").toString
    mangled.select(col("value")).write.mode("overwrite").text(dir)
    val back = spark.read
      .schema(docs.schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .persist()
    val bad = back.filter(col("_corrupt").isNotNull)
    val good = back.filter(col("_corrupt").isNull)
    assert(bad.count() == docs.filter(col("doc_id") % 7 === 0).count())
    // the quarantine column IS the raw line — byte-equal to what was
    // written, so a replay sink loses nothing
    val rawBad = mangled.filter(col("orig_id") % 7 === 0)
      .select(col("value"))
    assert(bad.select(col("_corrupt").as("value"))
      .exceptAll(rawBad).count() == 0)
    assert(rawBad.exceptAll(bad.select(col("_corrupt").as("value")))
      .count() == 0)
    // corrupt rows have no parsed fields; good rows have them all
    assert(bad.filter(col("doc_id").isNotNull ||
      col("text").isNotNull).count() == 0)
    assert(good.filter(col("doc_id").isNull || col("text").isNull ||
      col("lang").isNull || col("n_chars").isNull).count() == 0)
    assert(good.count() == docs.filter(col("doc_id") % 7 =!= 0).count())
    back.unpersist()
  }
}
