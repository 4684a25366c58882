package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Block-partitioned inverted index — the token → posting-list
  * structure exact-phrase search, contamination probes (t7/t10's
  * grams) and TF-based scoring all stand on. Postings are grouped
  * into DOC-RANGE BLOCKS (`block = doc_id div blockSize`), which is
  * what makes the build scale: a stopword's posting list is corpus-
  * sized, but its (token, block) cells each hold at most `blockSize`
  * documents' occurrences, so no single reducer ever materializes a
  * full hot posting list — the same bounded-cell discipline as the
  * banded-LSH joins. Readers reassemble a list by scanning the
  * token's blocks in order; block boundaries double as skip pointers
  * (the classic skip-list layout, doc-id-ordered by construction).
  *
  * Everything is engine-pure: postings sort by (doc_id, pos) — a
  * total order — and serialize as `doc:pos` strings, so the whole
  * index is DuckDB-oracle-checkable by fingerprint.
  */
object InvertedIndex {

  /** The (tok, block, payload, n) posting-block relation: payload =
    * comma-joined `doc_id:pos` pairs in (doc_id, pos) order. One
    * explode + one (tok, block)-keyed aggregate — map-side combine
    * applies, shuffle rows are bounded by blockSize docs per cell. */
  def postingBlocks(docs: DataFrame, idCol: Column, textCol: Column,
      blockSize: Int = 64): DataFrame = {
    require(blockSize > 0, s"blockSize=$blockSize")
    val occ = docs.select(idCol.as("doc_id"),
      posexplode(TextAnalysis.tokens(textCol)).as(Seq("pos", "tok")))
    occ
      .withColumn("block", expr(s"doc_id div $blockSize"))
      .groupBy(col("tok"), col("block"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos"))))
        .as("ps"))
      .select(col("tok"), col("block"),
        array_join(transform(col("ps"),
          p => concat_ws(":", p("doc_id"), p("pos"))), ",").as("payload"),
        size(col("ps")).cast("long").as("n"))
  }

  /** Per-token index census — the t24 receipt: document frequency,
    * collection frequency, block count, and the summed md5-u32
    * fingerprint of every block payload (order-independent sum, so
    * the hash match proves every posting in every block). */
  def indexCensus(docs: DataFrame, idCol: Column, textCol: Column,
      blockSize: Int = 64, seed: Int = 13): DataFrame = {
    val blocks = postingBlocks(docs, idCol, textCol, blockSize)
    val stats = docs.select(idCol.as("doc_id"),
        explode(TextAnalysis.tokens(textCol)).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("cf"))
    blocks.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(Tables.hashU32(col("payload"), seed)).as("postings_fp"))
      .join(stats, Seq("tok"))
      .select(col("tok"), col("df"), col("cf"), col("n_blocks"),
        col("postings_fp"))
  }

  /** Exact-phrase occurrence count from the index alone (no rescan of
    * the corpus): adjacent-position self-joins of the query terms'
    * postings — the operation the positional index exists for. The
    * query is a handful of terms, so each join's probe side is one
    * token's postings; block alignment keeps the join keyed. */
  def phraseCount(blocks: DataFrame, phrase: Seq[String],
      blockSize: Int = 64): Long = {
    require(phrase.nonEmpty, "empty phrase")
    val perTerm = phrase.zipWithIndex.map { case (t, i) =>
      blocks.filter(col("tok") === t)
        .select(explode(split(col("payload"), ",")).as("dp"))
        .select(
          split(col("dp"), ":").getItem(0).cast("long").as("doc_id"),
          (split(col("dp"), ":").getItem(1).cast("long") - i).as("base"))
    }
    perTerm.reduce(_.join(_, Seq("doc_id", "base"))).count()
  }
}
