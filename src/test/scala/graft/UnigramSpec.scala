package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM tokenizer (t31/t32): Viterbi optimality against a plain
  * Scala reference DP, mass conservation of the trained model,
  * loss-free segmentation, and the byte-fallback composition. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the lowest rate the newest low rates"),
    (2L, "lower rates estimate the newest estate"),
    (3L, "low low lowest newest west western est"),
    (4L, "rate estimate the western low rates west"))

  private def docs = corpus.toDF("doc_id", "text")

  /** Reference Viterbi in plain Scala: max Σ lp6, tie-break smaller
    * last-piece length at every position — the spec's independent
    * restatement of the DP contract. */
  private def refViterbi(word: String, lp: Map[String, Long])
      : (String, Long) = {
    val n = word.length
    val dp = Array.fill(n + 1)(Long.MinValue)
    val bp = Array.fill(n + 1)(0)
    dp(0) = 0L
    for (j <- 1 to n) {
      // candidates in l ASC order; replace only on strictly greater
      // score, so the smallest l wins ties — same rule as the engine
      for (l <- 1 to Unigram.MaxPieceLen if l <= j) {
        lp.get(word.substring(j - l, j)).foreach { p =>
          if (dp(j - l) != Long.MinValue && dp(j - l) + p > dp(j)) {
            dp(j) = dp(j - l) + p
            bp(j) = l
          }
        }
      }
    }
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      pieces.prepend(word.substring(pos - bp(pos), pos))
      pos -= bp(pos)
    }
    (pieces.mkString("|"), dp(n))
  }

  test("trained model conserves probability mass exactly") {
    val model = Unigram.train(docs, col("text"), topV = 50).collect()
    val tot = model.map(_.getLong(1)).sum
    // Σ cnt / tot = 1 by construction — exact, not approximate
    assert(tot > 0)
    // and the quantized micro-nat probs recover ≈ 1 (rounding only)
    val pSum = model.map(r => math.exp(r.getLong(2) / 1e6)).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"prob mass $pSum")
    // every single character of the corpus survives pruning
    val singles = model.map(_.getString(0)).filter(_.length == 1).toSet
    val chars = corpus.flatMap(_._2.split("\\s+")).flatMap(_.toSeq)
      .map(_.toString).toSet
    assert(chars.subsetOf(singles))
  }

  test("Viterbi segmentation matches the reference DP on every word") {
    val wf = Unigram.wordFreq(docs, col("text")).persist()
    val model = Unigram.trainFromWords(wf, topV = 50)
    val lp = model.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val segs = Unigram.viterbiSegments(wf.select("word"), model)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(segs.nonEmpty)
    segs.foreach { case (word, seg, np, score6) =>
      val (refSeg, refScore) = refViterbi(word, lp)
      assert(seg == refSeg, s"word=$word")
      assert(score6 == refScore, s"word=$word")
      assert(np == seg.split("\\|").length.toLong)
      // loss-free: concatenating the pieces recovers the word
      assert(seg.replace("|", "") == word)
    }
  }

  test("Viterbi beats greedy longest-match when greedy is suboptimal") {
    // vocab where greedy ("ab" first) strands a bad tail: word "abc",
    // pieces ab(-1), a(-5), b(-5), c(-5), bc(-1): greedy takes ab|c
    // (-6); Viterbi takes a|bc (-6)... make ab worse: ab(-4) → greedy
    // ab|c = -9, optimal a|bc = -6
    val lp = Map("ab" -> -4000000L, "a" -> -5000000L, "b" -> -5000000L,
      "c" -> -5000000L, "bc" -> -1000000L)
    val (seg, score) = refViterbi("abc", lp)
    assert(seg == "a|bc" && score == -6000000L)
    val model = lp.toSeq.map { case (p, l) => (p, 1L, l) }
      .toDF("piece", "cnt", "lp6")
    val got = Unigram.viterbiSegments(Seq("abc").toDF("word"), model)
      .collect().head
    assert(got.getString(1) == "a|bc" && got.getLong(3) == -6000000L)
  }

  test("EM prunes unused multi-char pieces and keeps all singles") {
    val wf = Unigram.wordFreq(docs, col("text")).persist()
    val seed = Unigram.withLogProbs(Unigram.seedVocab(wf, topV = 50))
    val after = Unigram.emRound(wf, seed)
    val seedMulti = seed.filter(length(col("piece")) >= 2).count()
    val afterMulti = after.filter(length(col("piece")) >= 2).count()
    assert(afterMulti <= seedMulti)
    // singles sets identical across the round
    val s0 = seed.filter(length(col("piece")) === 1)
      .select("piece").as[String].collect().toSet
    val s1 = after.filter(length(col("piece")) === 1)
      .select("piece").as[String].collect().toSet
    assert(s0 == s1)
    // every surviving multi-char piece was used by some Viterbi path
    val used = Unigram
      .viterbiSegments(wf.select("word"), seed)
      .select(explode(split(col("seg"), "\\|")).as("p"))
      .as[String].collect().toSet
    val survivors = after.filter(length(col("piece")) >= 2)
      .select("piece").as[String].collect().toSet
    assert(survivors.subsetOf(used))
  }

  test("Viterbi is optimal against exhaustive enumeration (property)") {
    // independent check: the engine's DP must achieve the max score
    // over ALL segmentations, enumerated brute-force — seeded-random
    // vocab and words so the check isn't shaped by the fixed corpus
    val rng = new scala.util.Random(42)
    val alphabet = "abcde"
    val multis = Seq.fill(30)(2 + rng.nextInt(3))
      .map(l => Seq.fill(l)(alphabet(rng.nextInt(5))).mkString)
      .distinct
    val lp: Map[String, Long] =
      (alphabet.map(_.toString) ++ multis).distinct
        .map(p => p -> -(1000000L + rng.nextInt(20000000))).toMap
    def bruteMax(word: String): Long = {
      if (word.isEmpty) 0L
      else (1 to math.min(Unigram.MaxPieceLen, word.length)).flatMap {
        l => lp.get(word.take(l)).map(_ + bruteMax(word.drop(l)))
      }.max
    }
    val words = Seq.fill(40)(
      Seq.fill(1 + rng.nextInt(10))(alphabet(rng.nextInt(5))).mkString)
      .distinct
    val model = lp.toSeq.map { case (p, v) => (p, 1L, v) }
      .toDF("piece", "cnt", "lp6")
    val got = Unigram.viterbiSegments(words.toDF("word"), model)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(3))).toMap
    assert(got.size == words.size)
    words.foreach { w =>
      val (seg, score6) = got(w)
      assert(score6 == bruteMax(w), s"word=$w seg=$seg")
      // the emitted segmentation realizes its reported score exactly
      assert(seg.split("\\|").map(lp).sum == score6, s"word=$w")
      assert(seg.replace("|", "") == w)
    }
  }

  test("byte fallback: uncovered codepoints expand to UTF-8 byte tokens") {
    val text = Seq((1L, "low rates 中 lowñer")).toDF("doc_id", "text")
    val wf = Unigram.wordFreq(docs, col("text")).persist()
    val model = Unigram.trainFromWords(wf, topV = 50)
    val words = Seq("low", "中", "lowñer").toDF("word")
    val segs = Unigram.viterbiSegmentsByteFallback(words, model)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2))).toMap
    // covered word: identical to the plain Viterbi segmentation
    val plain = Unigram.viterbiSegments(Seq("low").toDF("word"), model)
      .collect().head.getString(1)
    assert(segs("low")._1 == plain)
    // 中 = E4 B8 AD
    assert(segs("中") == (("<E4>|<B8>|<AD>", 3L)))
    // ñ = C3 B1 inside a covered word; np counts bytes on fallback
    val (seg, np) = segs("lowñer")
    assert(seg.contains("<C3>|<B1>"))
    assert(seg.replace("|", "").replace("<C3><B1>", "ñ") == "lowñer")
    val fbBytes = 2L
    val realPieces = seg.split("\\|").count(!_.startsWith("<"))
    assert(np == realPieces + fbBytes)
    assert(text.count() == 1) // corpus fixture exercised
  }
}
