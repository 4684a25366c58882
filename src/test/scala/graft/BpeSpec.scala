package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces the Sennrich worked example with tiebreaks") {
    // classic corpus: low:5 lower:2 newest:6 widest:3
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.train(vocab, 4)
    // round 1: (e,s) and (s,t) both count 9 — lexicographic tiebreak
    // picks (e,s); round 2: (es,t)=9; round 3: (l,o)=(o,w)=7 → (l,o);
    // round 4: (lo,w)=7
    assert(merges.map(m => (m.a, m.b)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("merge application is left-to-right non-overlapping") {
    // "aaaa" with merge (a,a): positions 1-2 and 3-4 fuse (not 2-3)
    val merges = Bpe.train(Array(("aaaa", 1L)), 2)
    assert(merges.map(m => (m.a, m.b)) == Seq(("a", "a"), ("aa", "aa")))
    // odd run: "aaa" → aa + a after one merge (the overlap case a
    // space-separated encoding gets wrong)
    val enc = "aaa".map(c => s"${Bpe.Sym}$c${Bpe.End}").mkString
    val m = Bpe.Merge("a", "a")
    assert(enc.replace(m.pattern, m.replacement) ==
      s"${Bpe.Sym}aa${Bpe.End}${Bpe.Sym}a${Bpe.End}")
  }

  test("engine-side apply matches the driver-side fold word by word") {
    val docs = Seq((1L, "the lowest slowest widest"),
      (2L, "newest tower lower")).toDF("doc_id", "text")
    val vocab = Bpe.vocab(docs, col("text"), 1000)
    val merges = Bpe.train(vocab, 6)
    val engine = Bpe.words(docs, col("text"))
      .withColumn("w2", Bpe.applyMerges(col("word"), merges))
      .select("word", "w2").distinct()
      .as[(String, String)].collect().toMap
    // driver twin: same encode + sequential String.replace
    engine.foreach { case (word, got) =>
      val want = merges.foldLeft(
        word.map(c => s"${Bpe.Sym}$c${Bpe.End}").mkString) {
        (acc, m) => acc.replace(m.pattern, m.replacement)
      }
      assert(got == want, s"word=$word")
    }
    // token counts decrease monotonically with more merges
    val n0 = Bpe.words(docs, col("text"))
      .select(sum(Bpe.tokenCount(Bpe.applyMerges(col("word"), Nil)))
        .cast("long")).as[Long].head()
    val n6 = Bpe.words(docs, col("text"))
      .select(sum(Bpe.tokenCount(Bpe.applyMerges(col("word"), merges)))
        .cast("long")).as[Long].head()
    assert(n6 < n0, s"merges must shorten: $n0 -> $n6")
  }

  test("training exhausts gracefully when no pairs remain") {
    // single 2-char word: one merge possible, then symbols are whole
    // words — further rounds stop early instead of emitting junk
    val merges = Bpe.train(Array(("ab", 3L)), 10)
    assert(merges == Seq(Bpe.Merge("a", "b")))
  }

  test("top-V vocab cap is deterministic under frequency ties") {
    val docs = Seq((1L, "bb aa bb aa cc")).toDF("doc_id", "text")
    // aa/bb tie at 2 → word ASC keeps aa first; V=2 drops cc
    val v = Bpe.vocab(docs, col("text"), 2)
    assert(v.toSeq == Seq(("aa", 2L), ("bb", 2L)))
  }

  // ——— byte-level (t35) ———

  test("byte pre-tokens keep their leading space, first word bare") {
    val docs = Seq((1L, "The cat,  sat!")).toDF("doc_id", "text")
    val ws = Bpe.byteWords(docs, col("text")).as[String].collect().toSeq
    // double space: the token needs a non-space, so the first of the
    // two spaces is dropped (the RE2-compatible deviation from GPT-2)
    assert(ws == Seq("The", " cat,", " sat!"))
  }

  test("byte encoding is the UTF-8 hex expansion, multi-byte intact") {
    val docs = Seq((1L, "a中")).toDF("doc_id", "text")
    val enc = docs.select(Bpe.encodeByteWord(lit("a中")).as("e"))
      .as[String].head()
    // 'a' = 0x61; 中 = E4 B8 AD (3 bytes) → 4 symbols
    val syms = enc.substring(1, enc.length - 1)
      .split(Bpe.End + Bpe.Sym, -1).toSeq
    assert(syms == Seq("61", "E4", "B8", "AD"))
  }

  test("byte-level train+apply: no UNK, every byte covered, counts shrink") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the mat the cat 中文 the end"),
      (3L, "cat and mat and the")).toDF("doc_id", "text")
    val vocab = Bpe.byteVocab(docs, col("text"), 100)
    val merges = Bpe.trainEncoded(vocab, 8)
    assert(merges.nonEmpty)
    // " the" (with leading space) is the most frequent pre-token →
    // early merges fuse its bytes: 20/74/68/65
    assert(merges.head.a.matches("[0-9A-F]{2}") &&
      merges.head.b.matches("[0-9A-F]{2}"))
    val words = Bpe.byteWords(docs, col("text"))
    val n0 = words.select(sum(Bpe.tokenCount(
      Bpe.applyByteMerges(col("word"), Nil))).cast("long"))
      .as[Long].head()
    val n8 = words.select(sum(Bpe.tokenCount(
      Bpe.applyByteMerges(col("word"), merges))).cast("long"))
      .as[Long].head()
    assert(n8 < n0, s"merges must shorten: $n0 -> $n8")
    // n0 = total UTF-8 bytes of all pre-tokens (the no-UNK property:
    // the base segmentation is exactly the byte sequence)
    val totalBytes = words
      .select(sum(length(encode(col("word"), "UTF-8"))).cast("long"))
      .as[Long].head()
    assert(n0 == totalBytes)
  }
}
