package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and engine-side application —
  * the tokenizer-training primitive of an LLM data pipeline (the
  * t-family's token stats and LM scores consume tokenizations; this
  * produces them).
  *
  * Algorithm (the classic greedy BPE of Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  * pre-tokenize the corpus into words, count word frequencies,
  * initialize every word as its character sequence, then repeatedly
  * (a) count adjacent symbol pairs weighted by word frequency,
  * (b) merge the most frequent pair everywhere, for `nMerges` rounds.
  *
  * Scale shape: the CORPUS-scale work — pre-tokenization and word
  * counting over 100 TB of text — is a distributed explode + hash
  * aggregate with map-side combine. Training then runs over the
  * frequency-capped top-V vocabulary, a BOUNDED sketch of the corpus
  * (identical to how production tokenizer trainers operate, and to
  * this repo's NB-classifier vocab model and k-means centroid
  * updates): V·avgLen symbols regardless of corpus size. Application
  * compiles the learned merge table into a static nested-`replace`
  * expression tree — whole-stage-codegen'd, no UDF, no shuffle
  * beyond the final per-doc aggregate.
  *
  * Determinism contract (oracle parity): every step is a pure
  * function of the corpus. Pair argmax tie-breaks by
  * (count DESC, left ASC, right ASC); the top-V cap by
  * (freq DESC, word ASC); merge application is left-to-right
  * non-overlapping — exactly `String.replace` / SQL `replace`
  * semantics on the control-character word encoding below, which is
  * what lets DuckDB reproduce training via unrolled single-merge
  * rounds and application via a `list_reduce` string fold.
  */
object Bpe {

  /** Word encoding: every symbol is wrapped as SOHsymSTX, so a
    * single merge (A,B)→AB is the plain string replacement
    * SOHASTXSOHBSTX → SOHABSTX — boundary-safe (a
    * symbol can never be a prefix of another's encoding) and
    * left-to-right non-overlapping in both Spark and DuckDB, which
    * matches BPE's simultaneous left-to-right merge of one pair. */
  val Sym = "\u0001"
  val End = "\u0002"

  /** One learned merge: pair (a, b) fuses into symbol a+b. */
  final case class Merge(a: String, b: String) {
    def pattern: String = Sym + a + End + Sym + b + End
    def replacement: String = Sym + a + b + End
  }

  /** Pre-tokenization: lowercase, split to [a-z]+ runs. (Char-level
    * BPE over a closed alphabet keeps the control-char encoding
    * unambiguous; byte-level pre-tokenizers differ only here.) */
  def words(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(lower(textCol), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")

  /** Encode a word column into the wrapped-symbol representation. */
  def encodeWord(c: Column): Column =
    array_join(
      transform(filter(split(c, ""), ch => ch =!= ""),
        ch => concat(lit(Sym), ch, lit(End))), "")

  /** Distributed word count, frequency-capped to the top-V vocab
    * (freq DESC, word ASC — deterministic at any scale). The ONLY
    * collect in the family, and it is bounded by V, not the corpus. */
  def vocab(docs: DataFrame, textCol: Column, topV: Int)
      : Array[(String, Long)] =
    words(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("word").asc)
      .limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  private def symbols(w: String): Array[String] = {
    // strip the leading SOH and trailing STX, split on the
    // inter-symbol boundary STXSOH
    if (w.isEmpty) Array.empty
    else w.substring(1, w.length - 1).split(End + Sym, -1)
  }

  /** Greedy merge training over the bounded vocab. Pair counts weight
    * every adjacent position by word frequency (overlaps count, per
    * the reference algorithm); application within a round is
    * left-to-right non-overlapping. Stops early if no pair remains. */
  def train(vocab: Array[(String, Long)], nMerges: Int): Seq[Merge] = {
    var ws = vocab.map { case (w, f) =>
      (w.map(ch => s"$Sym$ch$End").mkString, f)
    }
    val out = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      ws.foreach { case (w, f) =>
        val sy = symbols(w)
        var i = 0
        while (i < sy.length - 1) {
          val k = (sy(i), sy(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        val ((a, b), _) = cnt.minBy { case ((a, b), c) => (-c, a, b) }
        val m = Merge(a, b)
        out += m
        ws = ws.map { case (w, f) =>
          (w.replace(m.pattern, m.replacement), f)
        }
      }
      r += 1
    }
    out.result()
  }

  /** Engine-side application: fold the merge table into a static
    * nested-replace expression over the encoded word — N scalar
    * string ops per word, inside whole-stage codegen. */
  def applyMerges(wordCol: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(encodeWord(wordCol)) { (acc, m) =>
      replace(acc, lit(m.pattern), lit(m.replacement))
    }

  /** Token count of an encoded (post-merge) word: one SOH per
    * symbol. */
  def tokenCount(encCol: Column): Column =
    length(encCol) - length(replace(encCol, lit(Sym), lit("")))
}
