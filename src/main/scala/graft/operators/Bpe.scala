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
  def train(vocab: Array[(String, Long)], nMerges: Int): Seq[Merge] =
    trainEncoded(vocab.map { case (w, f) =>
      (w.map(ch => s"$Sym$ch$End").mkString, f)
    }, nMerges)

  /** [[train]] over an ALREADY symbol-encoded vocab — the byte-level
    * variant hands in hex-pair symbols instead of characters; the
    * greedy rounds are alphabet-agnostic. */
  def trainEncoded(vocab0: Array[(String, Long)], nMerges: Int)
      : Seq[Merge] = {
    var ws = vocab0
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

  // ——— byte-level BPE (t35): the GPT-2 family ———————————————————————
  // The variant production LLM tokenizers actually ship (GPT-2/RoBERTa
  // /Llama byte-level BPE, Radford et al. 2019): pre-tokens keep their
  // LEADING SPACE, the base alphabet is the 256 possible bytes of the
  // pre-token's UTF-8 encoding (no UNK by construction, no
  // normalization), and merges are learned over byte symbols. Symbols
  // here are two-hex-digit byte codes — hex(encode(word)) agrees
  // byte-for-byte between Spark and DuckDB (the t33 byte-fallback
  // already leans on that parity), and the hex alphabet keeps the
  // control-char word encoding unambiguous for ANY input byte.
  // Pre-tokenization is the alternation-free ` ?[^ ]+` — GPT-2's
  // regex minus the contraction/lookahead clauses, which RE2 (the
  // DuckDB oracle's engine) cannot express; documented deviation, and
  // deterministic in BOTH engines because a single-alternative greedy
  // pattern has no alternation-preference ambiguity.

  /** Byte-level pre-tokenization: space-prefixed runs (` ?[^ ]+`,
    * raw text — byte-level BPE never lowercases). */
  def byteWords(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(
        regexp_extract_all(textCol, lit("( ?[^ ]+)"), lit(1)))
      .as("word"))

  /** Encode a pre-token as wrapped two-hex-digit byte symbols:
    * "Ab" → SOH"41"STX SOH"62"STX (uppercase hex, UTF-8 bytes). */
  def encodeByteWord(c: Column): Column = {
    val hx = hex(encode(c, "UTF-8"))
    array_join(
      transform(sequence(lit(0), (length(hx) / 2 - 1).cast("int")),
        i => concat(lit(Sym), hx.substr(i * lit(2) + lit(1), lit(2)),
          lit(End))), "")
  }

  /** Distributed pre-token count, frequency-capped to the top-V vocab,
    * returned ALREADY byte-encoded for [[trainEncoded]]. Bounded by V
    * like [[vocab]] — the only collect, metadata-sized. */
  def byteVocab(docs: DataFrame, textCol: Column, topV: Int)
      : Array[(String, Long)] =
    byteWords(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("word").asc)
      .limit(topV)
      .select(encodeByteWord(col("word")).as("w"), col("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Engine-side byte-level application: same static nested-replace
    * fold as [[applyMerges]], over the byte-symbol encoding. */
  def applyByteMerges(wordCol: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(encodeByteWord(wordCol)) { (acc, m) =>
      replace(acc, lit(m.pattern), lit(m.replacement))
    }
}
