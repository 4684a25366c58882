package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.InternalCaches.TrackedPersist

/** Unigram-LM (SentencePiece-style) tokenizer training and
  * application — the third production tokenizer family next to BPE
  * (t16/t17) and WordPiece (t22/t23). Every Llama/T5-lineage pipeline
  * tokenizes with a unigram model; this is the hard-EM variant of
  * Kudo 2018 ("Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates"):
  *
  *   1. SEED a vocabulary from the most frequent substrings of the
  *      corpus (length 2..[[MaxPieceLen]], top-V by frequency) plus
  *      every single character (the coverage guarantee — Viterbi can
  *      never fail to segment), with initial piece log-probs from the
  *      substring counts.
  *   2. E-STEP: Viterbi-segment every DISTINCT word under the current
  *      model (maximize the sum of piece log-probs).
  *   3. M-STEP + PRUNE: re-estimate piece probabilities from the
  *      Viterbi piece counts (weighted by word frequency); multi-char
  *      pieces the Viterbi paths never used are pruned (the
  *      lowest-loss pieces — removing them changes no segmentation);
  *      coverage singles always survive with a count floor of 1.
  *
  * Determinism contract (oracle parity, the t13/t26 discipline): the
  * only transcendental — ln(cnt/tot) — is quantized to integer
  * micro-nats (lp6) on the bounded vocab relation; Viterbi scores are
  * exact BIGINT sums of lp6, compared as integers. The DP argmax
  * tie-breaks by (score DESC, piece length ASC) at every position, a
  * total order both engines realize identically, so the segmentation
  * itself — not just its score — is engine-exact and the DuckDB
  * oracle reproduces it with a recursive-CTE DP carrying the dp/bp
  * arrays as lists.
  *
  * Scale shape: corpus-scale work is ONE distributed word count
  * (explode + hash agg with map-side combine); everything after runs
  * per DISTINCT word — substring seeding is a bounded explode off the
  * word relation, Viterbi candidates come from [[MaxPieceLen]]
  * broadcast EQUI-joins (substring = piece, never a vocab scan per
  * char), and the DP itself is an in-row fold over a (endpos,
  * len)→lp6 map. No collect anywhere; the vocab stays a DataFrame
  * end to end.
  */
object Unigram {

  /** Maximum piece length considered for the vocabulary. */
  val MaxPieceLen = 4

  /** The byte-fallback sentinel stored in the back-pointer array: a
    * value no real piece length (1..[[MaxPieceLen]]) can take. Its
    * negation (-9) also loses score ties against every real piece
    * (negl -1..-4), so a covered position never falls back. */
  private val FbSentinel = 9

  /** Distinct-word frequencies (word, f) under the whitespace
    * tokenizer shared with the t-family. One corpus-scale aggregate;
    * every later stage is bounded by the distinct vocabulary. */
  def wordFreq(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))

  /** Seed vocabulary with counts: all substrings of length
    * 1..[[MaxPieceLen]] counted over word OCCURRENCES (distinct words
    * weighted by frequency — identical totals, bounded work); the
    * multi-char tier is frequency-capped to `topV` by (cnt DESC,
    * piece ASC); the single-char tier keeps EVERY character with its
    * true count (total coverage). The tiers cannot collide (length
    * ≥ 2 vs = 1), so the union needs no dedup. */
  def seedVocab(wordsF: DataFrame, topV: Int): DataFrame = {
    val sub = wordsF
      .select(col("word"), col("f"), explode(sequence(lit(0),
        length(col("word")) - 1)).as("pos"))
      .select(col("word"), col("f"), col("pos"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("len"))
      .filter(col("pos") + col("len") <= length(col("word")))
      .select(expr("substring(word, pos + 1, len)").as("piece"), col("f"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
    val multi = sub.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(topV)
    val singles = sub.filter(length(col("piece")) === 1)
    multi.unionByName(singles)
  }

  /** Attach integer micro-nat log-probs to a (piece, cnt) vocab:
    * lp6 = round(ln(cnt / tot) · 1e6) with tot = Σ cnt — the exact
    * expression the DuckDB twin evaluates, so the quantized model is
    * engine-identical. Probabilities sum to 1 by construction
    * (Σ cnt / tot = 1). */
  def withLogProbs(vocab: DataFrame): DataFrame = {
    // the vocab relation feeds both the total and the rows, and the
    // result fans out into one broadcast join per piece length in
    // [[viterbiSegments]] — pin it so the (possibly Viterbi-deep)
    // training lineage runs once, not once per consumer
    val v = vocab.persistTracked()
    v.crossJoin(broadcast(v.agg(sum(col("cnt")).as("tot"))))
      .withColumn("lp6",
        round(log(col("cnt") / col("tot")) * 1e6).cast("long"))
      .select(col("piece"), col("cnt"), col("lp6"))
      .persistTracked()
  }

  /** Viterbi segmentation of every distinct word in `words` under the
    * (piece, lp6) model: returns (word, seg, np, score6) with seg the
    * '|'-joined best segmentation, np its piece count, score6 its
    * exact integer score. Coverage singles make every position
    * reachable, so the candidate set is never empty. */
  def viterbiSegments(words: DataFrame, vocab: DataFrame): DataFrame =
    viterbiCore(words, vocab.select(col("piece"), col("lp6")), None)

  /** Byte-fallback Viterbi (the t23 trick applied to the unigram
    * segmenter, APPLY-time only — training keeps full coverage, see
    * [[applyCensusByteFallback]]): coverage singles are RESTRICTED to
    * `[a-z]`, and every position additionally offers the UTF-8 bytes
    * of its one codepoint as `<XX>` pseudo-pieces scored with the
    * fixed floor penalty `fbLp6` — the DP stays total on arbitrary
    * input (the loss-free guarantee) and the fallback competes
    * honestly with real pieces instead of patching after the fact.
    * Returns (word, seg, np, score6); np counts BYTES on fallback
    * positions, mirroring t23. */
  def viterbiSegmentsByteFallback(words: DataFrame, vocab: DataFrame,
      fbLp6: Long = -30000000L): DataFrame =
    viterbiCore(words,
      vocab.filter(length(col("piece")) >= 2 ||
          col("piece").rlike("^[a-z]$"))
        .select(col("piece"), col("lp6")),
      Some(fbLp6))

  /** The ONE segmenter both public variants share — candidate
    * generation, DP fold, and backtrack have a single definition so
    * the t32 and t33 paths cannot drift.
    *
    * Candidates per (word, end-position, length) come from
    * [[MaxPieceLen]] broadcast equi-joins keyed by the substring
    * itself, reduced to one (end·8+len)→lp6 map per word. The DP is a
    * single in-row fold j = 1..len(word): dp[j] = max over l of
    * dp[j−l] + lp(piece ending at j with length l), tie-break on
    * smaller l (realized as array_max over struct(score, −l) — max
    * score, then max −l = min l). With `fallback` set, an extra
    * length-1 byte-expansion candidate (negl −[[FbSentinel]], so it
    * loses all ties) is always available. A second fold walks the
    * back-pointers right-to-left to emit the segmentation. */
  private def viterbiCore(words: DataFrame, v: DataFrame,
      fallback: Option[Long]): DataFrame = {
    val positions = words.select(col("word"),
      explode(sequence(lit(0), length(col("word")) - 1)).as("pos"))
    val cands = (1 to MaxPieceLen).map { l =>
      positions.filter(col("pos") + l <= length(col("word")))
        .withColumn("piece", expr(s"substring(word, pos + 1, $l)"))
        .join(broadcast(v.filter(length(col("piece")) === l)),
          Seq("piece"))
        .select(col("word"),
          ((col("pos") + l) * 8 + l).as("k"), col("lp6"))
    }.reduce(_ unionByName _)
    // left join: with full coverage every word has candidates, with
    // the gated fallback vocab an all-uncovered word legitimately has
    // none — the fallback option keeps the DP total either way
    val pm = words.join(
      cands.groupBy(col("word"))
        .agg(map_from_entries(
          collect_list(struct(col("k"), col("lp6")))).as("pm")),
      Seq("word"), "left")
    val dp = pm.withColumn("st", aggregate(
      sequence(lit(1), length(col("word"))),
      struct(array(lit(0L)).as("dp"), array(lit(0)).as("bp")),
      (acc, j) => {
        val real = (1 to MaxPieceLen).map { l =>
          val lp = element_at(col("pm"), (j * 8 + lit(l)).cast("int"))
          when(j >= l && lp.isNotNull,
            struct(
              (element_at(acc("dp"), (j - l + 1).cast("int")) + lp)
                .as("sc"),
              lit(-l).as("negl")))
            .otherwise(lit(null))
        }
        val options = fallback match {
          case Some(fb) => array((real :+
            struct((element_at(acc("dp"), j.cast("int")) + fb).as("sc"),
              lit(-FbSentinel).as("negl"))): _*)
          case None => array(real: _*)
        }
        val best = array_max(filter(options, c => c.isNotNull))
        struct(
          concat(acc("dp"), array(best("sc"))).as("dp"),
          concat(acc("bp"), array(-best("negl"))).as("bp"))
      }))
    dp.withColumn("score6",
        element_at(col("st.dp"), length(col("word")) + 1))
      .withColumn("bt", aggregate(
        sequence(lit(1), length(col("word"))),
        struct(length(col("word")).as("pos"), lit("").as("seg"),
          lit(0L).as("np")),
        (st, _) => {
          val rawL = element_at(col("st.bp"), (st("pos") + 1).cast("int"))
          val isFb = rawL === FbSentinel
          val l = when(isFb, lit(1)).otherwise(rawL)
          val hexb = hex(encode(
            col("word").substr(st("pos"), lit(1)), "UTF-8"))
          val piece = when(isFb,
              rtrim(regexp_replace(hexb, "(..)", "<$1>|"), "|"))
            .otherwise(col("word").substr(st("pos") - l + 1, l))
          val npInc = when(isFb, (length(hexb) / 2).cast("long"))
            .otherwise(lit(1L))
          when(st("pos") <= 0, st).otherwise(struct(
            (st("pos") - l).as("pos"),
            when(st("seg") === "", piece)
              .otherwise(concat(piece, lit("|"), st("seg"))).as("seg"),
            (st("np") + npInc).as("np")))
        }))
      .select(col("word"), col("bt.seg").as("seg"),
        col("bt.np").as("np"), col("score6"))
  }

  /** One hard-EM round: Viterbi-segment the distinct words, count
    * pieces weighted by word frequency, PRUNE multi-char pieces the
    * best paths never used (their removal changes no segmentation —
    * the zero-loss prune), floor coverage singles at count 1, and
    * re-quantize log-probs. Returns the new (piece, cnt, lp6). */
  def emRound(wordsF: DataFrame, vocab: DataFrame): DataFrame = {
    val segs = viterbiSegments(wordsF.select(col("word")), vocab)
    // counts feed the multi-char tier AND the singles left-join — pin
    // so the E-step (a full Viterbi pass) executes once
    val counts = segs.join(wordsF, Seq("word"))
      .select(explode(split(col("seg"), "\\|")).as("piece"), col("f"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      .persistTracked()
    val multi = counts.filter(length(col("piece")) >= 2)
    val singles = vocab.filter(length(col("piece")) === 1)
      .select(col("piece"))
      .join(counts, Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
    withLogProbs(multi.unionByName(singles))
  }

  /** Train from pre-computed word frequencies: seed model + one EM
    * round (the oracle unrolls exactly this). Returns the final
    * (piece, cnt, lp6) vocabulary relation. */
  def trainFromWords(wordsF: DataFrame, topV: Int): DataFrame =
    emRound(wordsF, withLogProbs(seedVocab(wordsF, topV)))

  /** End-to-end training over a document corpus — the t31 entry:
    * final vocabulary (piece, cnt, lp6). */
  def train(docs: DataFrame, textCol: Column, topV: Int): DataFrame =
    trainFromWords(wordFreq(docs, textCol).persistTracked(), topV)

  /** Application census — the t32 entry: segment the corpus under the
    * trained model (a SECOND Viterbi pass under the post-EM probs)
    * and emit per-document (n_words, n_pieces, seg_fp) where seg_fp
    * sums the md5-u32 of each word's '|'-joined segmentation —
    * fingerprinting the full subword segmentation, not just counts. */
  def applyCensus(docs: DataFrame, idCol: Column, textCol: Column,
      topV: Int, seed: Int = 11): DataFrame =
    censusWith(docs, idCol, textCol, topV, seed, viterbiSegments)

  /** [[applyCensus]] with the BYTE-FALLBACK segmenter — the t33
    * entry: the model trains on the corpus with full coverage (EM
    * semantics unchanged), application gates coverage singles to
    * `[a-z]` and routes uncovered codepoints through the UTF-8 byte
    * expansion. Same census shape as t32. */
  def applyCensusByteFallback(docs: DataFrame, idCol: Column,
      textCol: Column, topV: Int, seed: Int = 11): DataFrame =
    censusWith(docs, idCol, textCol, topV, seed,
      viterbiSegmentsByteFallback(_, _))

  /** Train + segment + per-doc census, parameterized over the
    * segmenter — the one census definition t32 and t33 share. */
  private def censusWith(docs: DataFrame, idCol: Column,
      textCol: Column, topV: Int, seed: Int,
      segmenter: (DataFrame, DataFrame) => DataFrame): DataFrame =
    censusWithModel(docs, idCol, textCol,
      trainFromWords(wordFreq(docs, textCol).persistTracked(), topV),
      seed, segmenter)

  /** The census against a PRE-TRAINED model relation (piece, cnt,
    * lp6) — the s28 build-once/apply-many discipline on the
    * tokenizer lane: a deployment trains its subword model once and
    * segments corpora against the stored vocabulary. t32/t33 load
    * their model from the cross-run cache through this entry point;
    * the census itself (a full Viterbi pass over the corpus's
    * distinct words + the per-doc fingerprint rollup) is the
    * operation under test and always runs live. */
  def censusWithModel(docs: DataFrame, idCol: Column,
      textCol: Column, model: DataFrame, seed: Int,
      segmenter: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val words = docs.select(
        explode(TextAnalysis.tokens(textCol)).as("word"))
      .distinct()
    val segs = segmenter(words, model)
    docs.select(idCol.as("doc_id"),
        explode(TextAnalysis.tokens(textCol)).as("word"))
      .join(segs, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("np")).as("n_pieces"),
        sum(Tables.hashU32(col("seg"), seed)).as("seg_fp"))
  }
}
