package graft

import org.apache.spark.sql.functions._

import graft.operators.{Metrics, TextAnalysis}

/** Text-analysis kernels (M7c) + consumer aggregations (A1–A5). */
class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherQuality sets exactly the violated rule bits") {
    val good = "the cat and dog ran over the hill to find food today"
    val docs = Seq(
      (1L, good),                                   // clean → keep
      (2L, "the and"),                              // too short → 1
      (3L, ("extraordinarily " * 12) + "the and"),  // mean len > 10 → 2
      (4L, good + " ab#cd ef#gh"),                  // symbols → 4
      (5L, (1 to 10).map(_ => "- the and select items")
        .mkString("\n")),                           // bullets → 8
      (6L, (1 to 10).map(_ =>
        "the and every single line over here keeps trailing off...")
        .mkString("\n")),                           // ellipses → 16
      (7L, good + (" 123" * 13)),                   // non-alpha words → 32
      (8L, good.replace("the", "zzz").replace("and", "qqq")) // no stops → 64
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, col("doc_id"),
        col("text"), minWords = 5, stops = Seq("the", "and"))
      .select("doc_id", "reasons", "keep")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 1L))
    assert(out(2L) == (1L, 0L))
    assert((out(3L)._1 & 2L) == 2L && out(3L)._2 == 0L)
    assert(out(4L) == (4L, 0L))
    assert(out(5L) == (8L, 0L))
    assert(out(6L) == (16L, 0L))
    assert(out(7L) == (32L, 0L))
    assert(out(8L) == (64L, 0L))
  }

  test("Kneser-Ney scores match a hand-computed model; mass sums to 1") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c d"), (3L, "d a"))
    val docs = corpus.toDF("doc_id", "text")
    // independent plain-Scala model build (same corpus, same formula)
    val bigs = corpus.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (id, p(0), p(1)))
    }
    val c2 = bigs.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = c2.groupBy(_._1._1).view.mapValues(_.size).toMap
    val n1b = c2.groupBy(_._1._2).view.mapValues(_.size).toMap
    val types = c2.size.toDouble
    val D = 0.75
    def p(w1: String, w2: String): Double =
      c2.getOrElse((w1, w2), 0) match {
        case 0 => D * n1f(w1) / c1(w1) * (n1b(w2) / types)
        case c => (c - D) / c1(w1) + D * n1f(w1) / c1(w1) *
          (n1b(w2) / types)
      }
    // the KN invariant: P(·|w1) over the full vocab sums to exactly 1
    val vocab = (n1b.keySet ++ c1.keySet).toSeq
    c1.keys.foreach { w1 =>
      val mass = vocab.map(p(w1, _)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"mass($w1)=$mass")
    }
    def kn6(w1: String, w2: String): Long =
      math.round(math.log(p(w1, w2)) * 1e6)
    val expected = corpus.map { case (id, t) =>
      val bs = t.split(" ").sliding(2).filter(_.length == 2).toSeq
      val s6 = bs.map(b => kn6(b(0), b(1))).sum
      id -> (bs.size.toLong,
        BigDecimal(s6 / (bs.size * 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = TextAnalysis.knBigramLogProb(docs, col("doc_id"),
        col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
  }

  test("NB classifier separates disjoint vocabularies perfectly") {
    // two languages with disjoint vocab; test docs (id%5=0) use only
    // their language's words → the confusion matrix must be diagonal
    val docs = Seq(
      (1L, "aa", "alpha beta gamma alpha"),
      (2L, "aa", "beta gamma delta beta"),
      (3L, "bb", "uno dos tres uno"),
      (4L, "bb", "dos tres cuatro dos"),
      (5L, "aa", "alpha gamma beta"),   // test
      (10L, "bb", "uno cuatro dos")     // test
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.nbLangIdConfusion(docs, col("doc_id"),
        col("text"), col("lang"), testMod = 5)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("aa", "aa", 1L), ("bb", "bb", 1L)))
    // a test doc with NO in-vocab tokens still classifies (priors
    // only) — deterministically to the alphabetically-first class
    // among the max-prior ties
    val docs2 = docs.union(Seq((15L, "aa", "zzz qqq"))
      .toDF("doc_id", "lang", "text"))
    val out2 = TextAnalysis.nbLangIdConfusion(docs2, col("doc_id"),
        col("text"), col("lang"), testMod = 5)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out2(("aa", "aa")) == 2L || // priors tie → 'aa' wins
      (out2(("aa", "aa")) == 1L && out2.contains(("aa", "bb"))))
    assert(out2.values.sum == 3L)
  }

  test("tokens: lowercase, whitespace split, empties dropped") {
    val df = Seq("  The QUICK  fox ", "", "one").toDF("text")
    val out = df.select(TextAnalysis.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("the", "quick", "fox"))
    assert(out(1) == Seq())
    assert(out(2) == Seq("one"))
  }

  test("shingles produce n-grams; short docs give empty array") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq())
  }

  test("stopword ratio and mean token length") {
    val df = Seq("the cat and the hat").toDF("text")
    val r = df.select(
      TextAnalysis.stopwordRatio(col("text")).as("sw"),
      TextAnalysis.meanTokenLen(col("text")).as("ml"))
      .as[(Double, Double)].head()
    assert(r._1 == 0.6) // the, and, the of 5
    assert(r._2 == 15.0 / 5)
  }

  test("lang id picks the language with most marker hits") {
    val df = Seq(
      (1L, "the cat is on the mat and a dog"),
      (2L, "el perro es de la casa y que bien"),
      (3L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df, col("text"), col("doc_id"))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("fingerprints: content fp ignores case/whitespace; bag fp ignores order") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "ALPHA  beta   GAMMA"),
      (3L, "gamma alpha beta")
    ).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      TextAnalysis.contentFingerprint(col("text")).as("c"),
      TextAnalysis.bagFingerprint(col("text")).as("b"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L)._1 == fp(2L)._1)
    assert(fp(1L)._1 != fp(3L)._1)
    assert(fp(1L)._2 == fp(3L)._2) // bag fingerprint order-insensitive
  }

  test("tfidf: corpus-wide terms get lower scores than rare terms") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare3")
    ).toDF("doc_id", "text")
    val tf = TextAnalysis.tfidf(docs, col("doc_id"), col("text"), 3L)
    val scores = tf.groupBy("token").agg(max("tfidf").as("s"))
      .as[(String, Double)].collect().toMap
    assert(scores("rare1") > scores("common"))
  }

  test("one-hot, argmax, accuracy compose to the reference metric (A2/A3)") {
    val df = Seq((0, 0), (1, 1), (2, 1)).toDF("label", "pred")
    val acc = df.agg(Metrics.accuracy(col("pred"), col("label")))
      .as[Double].head()
    assert(math.abs(acc - 2.0 / 3) < 1e-12)
    val oh = df.select(Metrics.oneHot(col("label"), 3).as("v"))
      .as[Seq[Double]].collect()
    assert(oh(1) == Seq(0.0, 1.0, 0.0))
    val am = df.select(
      Metrics.argMax(Metrics.oneHot(col("label"), 3)).as("i"))
      .as[Long].collect()
    assert(am.toSeq == Seq(0L, 1L, 2L))
  }

  test("class dictionary assigns dense ids in sorted-name order") {
    val df = Seq("roses", "daisy", "tulips", "daisy").toDF("cls")
    val dict = Metrics.classDictionary(df, col("cls"))
      .as[(String, Long)].collect().toMap
    assert(dict == Map("daisy" -> 0L, "roses" -> 1L, "tulips" -> 2L))
  }

  test("DSIR weights favor documents that look like the target") {
    // target docs share one vocabulary; off-target docs a disjoint one;
    // probes match one side each — the likelihood-ratio weights must
    // separate them regardless of the Gumbel draw
    val docs = Seq(
      (1L, "alpha beta alpha gamma beta", true),
      (2L, "beta gamma alpha alpha beta", true),
      (3L, "zed yak zed wol yak wol", false),
      (4L, "yak wol zed zed yak", false),
      (5L, "alpha beta gamma beta alpha", false), // target-like probe
      (6L, "zed yak wol yak zed", false),         // off-target probe
      (7L, "   ", false)                          // no tokens → undrawable
    ).toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("is_t"), nBuckets = 64, k = 10)
      .select("doc_id", "weight6", "rank")
      .as[(Long, Long, Long)].collect()
    val w = out.map(r => r._1 -> r._2).toMap
    assert(!w.contains(7L), "token-less doc must be undrawable")
    val targetLike = Set(1L, 2L, 5L).map(w)
    val offTarget = Set(3L, 4L, 6L).map(w)
    assert(targetLike.min > offTarget.max,
      s"weights must separate: $w")
    // ranks are a permutation of 1..n in score order
    assert(out.map(_._3).sorted.toSeq == (1L to 6L))
    // deterministic end to end
    val again = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("is_t"), nBuckets = 64, k = 10)
      .select("doc_id", "weight6", "rank")
      .as[(Long, Long, Long)].collect()
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("wordPiece greedy segmentation equals a reference greedy (t22)") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat"),
      (2L, "concatenation of cats and catamarans"),
      (3L, "that mat cat the thematic theme")).toDF("doc_id", "text")
    val topV = 6
    // reference vocab: same rule in memory (counts over occurrences,
    // ties piece-ascending; singles always in)
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val counts = scala.collection.mutable.Map[String, Long]()
    for (w <- words; l <- 2 to 4; p <- 0 to w.length - l)
      counts(w.substring(p, p + l)) =
        counts.getOrElse(w.substring(p, p + l), 0L) + 1
    val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(topV).map(_._1)
    val vocab = (top ++ words.flatMap(_.toCharArray).map(_.toString))
      .toSet
    val sparkVocab = TextAnalysis.wordPieceVocab(docs, col("text"), topV)
      .select("piece").as[String].collect().toSet
    assert(sparkVocab == vocab)
    // reference greedy: longest vocab match first
    def greedy(w: String): Seq[String] = {
      var pos = 0
      val out = Seq.newBuilder[String]
      while (pos < w.length) {
        val best = (4 to 1 by -1).iterator
          .map(l => w.substring(pos, math.min(pos + l, w.length)))
          .find(vocab.contains)
          .getOrElse(w.substring(pos, pos + 1))
        out += best; pos += best.length
      }
      out.result()
    }
    val got = TextAnalysis.wordSegments(docs, col("text"), topV)
      .select("word", "seg", "np").as[(String, String, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    for (w <- words.distinct) {
      val exp = greedy(w)
      assert(got(w) == ((exp.mkString("|"), exp.length.toLong)),
        s"word '$w': got ${got(w)}, expected $exp")
    }
    // every segmentation concatenates back to its word
    for ((w, (seg, _)) <- got) assert(seg.replace("|", "") == w)
  }

  test("inverted index: blocks bound doc ranges, phrase search is " +
      "exact (t24)") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat the cat runs"),
      (5L, "a cat the dog the cat"),
      (9L, "mat the cat")).toDF("doc_id", "text")
    val blocks = InvertedIndex
      .postingBlocks(docs, col("doc_id"), col("text"), blockSize = 4)
    // every (tok, block) cell holds only doc ids from its range —
    // the bound that keeps hot posting lists off a single reducer
    val cells = blocks.select(col("tok"), col("block"), col("payload"))
      .as[(String, Long, String)].collect()
    for ((_, b, payload) <- cells; dp <- payload.split(",")) {
      val doc = dp.split(":")(0).toLong
      assert(doc / 4 == b, s"doc $doc in block $b")
    }
    // payloads are (doc_id, pos)-ordered
    for ((_, _, payload) <- cells) {
      val pairs = payload.split(",").map { dp =>
        val Array(d, p) = dp.split(":").map(_.toLong); (d, p)
      }
      assert(pairs.sameElements(pairs.sorted), payload)
    }
    // phrase search from the index alone equals a brute-force count
    def brute(phrase: Seq[String]): Long = docs.as[(Long, String)]
      .collect().map { case (_, t) =>
        t.split("\\s+").sliding(phrase.length)
          .count(_.sameElements(phrase))
      }.sum
    for (ph <- Seq(Seq("the", "cat"), Seq("cat", "the", "cat"),
        Seq("the", "mat"), Seq("dog", "cat")))
      assert(InvertedIndex.phraseCount(blocks, ph, 4) == brute(ph),
        s"phrase $ph")
  }

  test("byte-fallback wordPiece: unknown codepoints become UTF-8 byte " +
      "tokens (t23)") {
    val docs = Seq(
      (1L, "the cat 中at sat"),      // 3-byte CJK inside a word
      (2L, "niño the cat the cat"),  // 2-byte ñ
      (3L, "中 the")                  // whole word = one unknown char
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .wordSegmentsByteFallback(docs, col("text"), topV = 4)
      .select("word", "seg", "np").as[(String, String, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // golden bytes: 中 = E4 B8 AD, ñ = C3 B1
    assert(got("中") == (("<E4>|<B8>|<AD>", 3L)))
    val (segZh, npZh) = got("中at")
    assert(segZh.startsWith("<E4>|<B8>|<AD>|"), segZh)
    assert(npZh >= 4L) // 3 bytes + at least one piece for "at"
    val (segN, _) = got("niño")
    assert(segN.contains("<C3>|<B1>"), segN)
    // loss-free: every segmentation reconstructs its word after
    // decoding byte tokens back to characters
    def unbyte(seg: String): String = {
      val parts = seg.split("\\|")
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      val sb = new StringBuilder
      def flush(): Unit = if (bytes.nonEmpty) {
        sb.append(new String(bytes.toArray, "UTF-8")); bytes.clear()
      }
      for (p <- parts) {
        if (p.matches("<[0-9A-F]{2}>"))
          bytes += Integer.parseInt(p.substring(1, 3), 16).toByte
        else { flush(); sb.append(p) }
      }
      flush(); sb.result()
    }
    for ((w, (seg, _)) <- got)
      assert(unbyte(seg) == w, s"lossy round trip for '$w': $seg")
    // known-alphabet words never touch the fallback
    assert(!got("the")._1.contains("<"))
  }

  test("luhnValid implements the Luhn checksum; redaction gates on it") {
    import graft.operators.TextAnalysis.{luhnValid, luhnRedact}
    val checks = Seq("4111111111111111" -> true,  // classic valid PAN
      "4111111111111112" -> false,
      "79927398713" -> true,                     // Wikipedia example
      "79927398710" -> false,
      "0000000000000" -> true)
    val df = checks.map(_._1).toDF("d")
      .select(col("d"), luhnValid(col("d")).as("ok"))
      .as[(String, Boolean)].collect().toMap
    checks.foreach { case (num, exp) =>
      assert(df(num) == exp, s"luhn($num) should be $exp") }

    // redaction: the valid PAN goes, the invalid and short runs stay
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4111111111111112 ref 12345"),
      (2L, "no digits here"),
      (3L, "two valid 4111111111111111 and 5500005555555559 cards")
    ).toDF("doc_id", "text")
    val out = luhnRedact(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_cand", "n_valid")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (2L, 1L))
    assert(out(2L) == (0L, 0L))
    assert(out(3L) == (2L, 2L))
  }

  test("NfcNormalizeExpr: composes, idempotent, null-safe, codegen ≡ eval") {
    import graft.functions.NfcNormalizeExpr.nfc
    val composed = "café"          // é precomposed
    val decomposed = "café"       // e + combining acute
    val df = Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null)
    ).toDF("id", "s")
    val out = df.select(col("id"), nfc(col("s")).as("n"),
        length(nfc(col("s"))).as("len"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toMap
    assert(out(1L) == (Some(composed), 4),
      "decomposed input must compose to the 4-codepoint form")
    assert(out(2L) == (Some(composed), 4), "NFC input unchanged")
    assert(out(3L) == (Some("plain ascii"), 11), "ASCII fast path")
    assert(out(4L) == (None, -1), "null in, null out")
    // interpreted path (no codegen) must agree bit-for-bit
    val expr = graft.functions.NfcNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
    assert(expr.eval(null).toString == composed)
  }
}
