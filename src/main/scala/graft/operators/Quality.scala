package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.Embedder.hash60Col
import graft.operators.TextAnalysis.toks

/** Corpus-quality operators for a large-scale training-data pipeline —
  * the filters a 100 TB ingest runs between raw text and tokenization.
  * Beyond-reference scope (the reference chunks and embeds whatever it
  * is given: `src/core/chunk/chunk.ts`, `src/core/indexer.ts`); these
  * are the standard published curation steps re-expressed Spark-first:
  *
  *  - [[qGopherRules]] — the document-level rule battery of Gopher
  *    (Rae et al. 2021, appendix A1.1), minus the repetition rules that
  *    live in [[Curation.qQualityRepetition]];
  *  - [[qSubstrDedup]] — cross-document duplicated-span accounting in
  *    the spirit of "Deduplicating Training Data Makes Language Models
  *    Better" (Lee et al. 2022), at word-8-gram granularity with
  *    first-occurrence-wins semantics;
  *  - [[qPplBucket]] — CCNet-style (Wenzek et al. 2020) head/middle/
  *    tail quality terciles per language over the deterministic
  *    bigram-LM score ([[TextAnalysis.bigramScores]]);
  *  - [[qWinnow]] — winnowing fingerprints (Schleimer, Wilkerson &
  *    Aiken 2003, the MOSS algorithm) and the top shared-fingerprint
  *    document pairs.
  *
  * Everything is exact integer counting or fixed-point arithmetic over
  * codegen'd expressions — no UDFs, no floats until a final `round`,
  * so results are bit-identical across engines and partitionings.
  */
object Quality {

  /** Gopher's document-level stop words (Rae et al. 2021: a doc must
    * contain ≥2 of these to pass). */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule battery per document: word count ∈ [50, 100k], mean
    * word length ∈ [3, 10], symbol-to-word ratio (# and …) ≤ 0.1,
    * ≥ 80% of words contain a letter, ≥ 2 stop words. One narrow
    * projection over the corpus scan — no shuffle at all; the `keep`
    * column is the filter a 100 TB pipeline applies before anything
    * heavier runs. */
  def qGopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherFlags(Tables.documents(spark, dir))
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_frac", "n_stop", "keep")
      .orderBy("doc_id")

  /** The Gopher rule battery as a pure row-local transform over any
    * frame with (doc_id, text) — zero shuffle, so it applies verbatim
    * to a document STREAM (the streaming quality gate,
    * [[graft.streaming.StreamingQuality]]) with bit-identical flags:
    * batch/stream equivalence is by construction, not by porting.
    * Input columns are preserved; the verdict columns are appended. */
  def gopherFlags(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", toks(col("text")))
      .withColumn("n_words", size(col("t")).cast("long"))
      .withColumn("sum_len",
        aggregate(col("t"), lit(0L), (a, w) => a + length(w)))
      .withColumn("n_alpha",
        size(filter(col("t"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("t"), w => w.isin(GopherStops: _*))).cast("long"))
      .withColumn("n_hash",
        (length(col("text")) -
          length(replace(col("text"), lit("#"), lit("")))).cast("long"))
      .withColumn("n_ellipsis",
        ((length(col("text")) -
          length(replace(col("text"), lit("..."), lit("")))) / 3)
          .cast("long"))
      .withColumn("mean_word_len",
        round(col("sum_len").cast("double") / col("n_words"), 6))
      .withColumn("symbol_ratio",
        round((col("n_hash") + col("n_ellipsis")).cast("double") /
          col("n_words"), 6))
      .withColumn("alpha_frac",
        round(col("n_alpha").cast("double") / col("n_words"), 6))
      .withColumn("keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
          col("symbol_ratio") <= 0.1 && col("alpha_frac") >= 0.8 &&
          col("n_stop") >= 2)
      .drop("t", "sum_len", "n_alpha", "n_hash", "n_ellipsis")

  /** C4-style heuristic cleanup battery (Raffel et al. 2020 §2.2) —
    * the classic web-text rules the Gopher battery does NOT cover:
    * per-line retention (a line survives iff it has ≥5 words and ends
    * in terminal punctuation), a ≥3-sentence document floor, and the
    * lorem-ipsum / curly-brace / javascript content tripwires. */
  def qC4Rules(spark: SparkSession, dir: String): DataFrame =
    c4Flags(Tables.documents(spark, dir))
      .select("doc_id", "n_lines", "kept_lines", "n_sentences",
        "has_lorem", "has_brace", "has_js", "keep")
      .orderBy("doc_id")

  /** The C4 battery as a pure row-local transform over any
    * (doc_id, text) frame — zero shuffle, so like [[gopherFlags]] it
    * applies verbatim to a document stream with bit-identical flags.
    * Sentence count is terminal-mark count (.!?) — the deterministic
    * miniature of a sentence splitter, identical in both engines. */
  def c4Flags(docs: DataFrame): DataFrame = {
    def occurrences(c: String) =
      length(col("text")) - length(replace(col("text"), lit(c), lit("")))
    docs
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("kept_lines",
        size(filter(col("lines"), l =>
          size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
            l.rlike("[.!?\"]\\s*$"))).cast("long"))
      .withColumn("n_sentences",
        (occurrences(".") + occurrences("!") + occurrences("?")).cast("long"))
      .withColumn("has_lorem", lower(col("text")).contains("lorem ipsum"))
      .withColumn("has_brace", col("text").contains("{"))
      .withColumn("has_js", lower(col("text")).contains("javascript"))
      .withColumn("keep",
        col("kept_lines") >= 1 && col("n_sentences") >= 3 &&
          !col("has_lorem") && !col("has_brace") && !col("has_js"))
      .drop("lines")
  }

  private val SubstrGram = 8

  /** Duplicated-span accounting at word-8-gram granularity: a doc's
    * gram is `shared` if any other doc contains it, and `dup` if a doc
    * with a SMALLER doc_id does (first occurrence owns the span — the
    * keep-one semantics of suffix-style dedup). `keep` drops docs
    * majority-covered by spans owned elsewhere.
    *
    * Shape: distinct (doc, gram-hash) explode → ONE window over the
    * hash key (owner = min doc_id, df = count — no groupBy+join-back
    * round trip) → doc-keyed aggregate. Two shuffles, both linear in
    * corpus grams. Grams shuffle as 8-byte portable hashes (hash60),
    * not ~50-char strings — 6× narrower shuffle rows, uniformly
    * distributed keys (no skew), same answer: a 60-bit hash collides
    * within a corpus's distinct grams only past ~10⁹ of them per
    * birthday math, and the oracle hashes identically. */
  def qSubstrDedup(spark: SparkSession, dir: String): DataFrame =
    substrStats(spark, dir).orderBy("doc_id")

  /** Cached per-doc span-duplication table — read by [[qSubstrDedup]]
    * and [[qFilterChain]] (a 100 TB pipeline persists this artifact
    * once and both reports read it). */
  private[operators] def substrStats(
      spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "substrStats", dir) {
      val n = SubstrGram
      val grams = Tables.documents(spark, dir)
        .withColumn("t", toks(col("text")))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), size(col("t")) - (n - 1)),
            i => hash60Col(concat_ws(" ",
              (0 until n).map(j => element_at(col("t"), i + j)): _*)))))
            .as("g"))
      // auto-salting hook: a sampled heavy-hitter probe picks the
      // per-gram stats plan — single-shuffle window normally, salted
      // two-stage aggregate + join-back when a gram exceeds the hot
      // share (a ubiquitous boilerplate 8-gram at 100 TB would
      // otherwise pin its whole partition on one task)
      Salted.autoOwnerStats(grams, col("g"), col("doc_id"))
        .withColumnRenamed("n_keyrows", "n_docs")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"),
          sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac",
          round(col("n_dup").cast("double") / col("n_grams"), 6))
        .withColumn("keep", col("dup_frac") <= 0.5)
        .select("doc_id", "n_grams", "n_shared", "n_dup", "dup_frac", "keep")
    }

  /** CCNet-style quality terciles: rank every document inside its
    * language by the bigram-LM score (higher = more "likely" text) and
    * cut into head/middle/tail thirds (bucket 1 = head). Emits per
    * (lang, bucket) doc counts and score ranges — the table a pipeline
    * joins back to sample head-heavy training mixes.
    *
    * Scale shape — NO document-level per-language sort: a naive
    * `ntile(3)` window partitioned by language makes the dominant
    * language (half a 100 TB web corpus is English) ONE task totally
    * sorting its whole slice. Instead the tercile cuts come from the
    * (lang, score) HISTOGRAM: `avg_prob_micro` is an integer in
    * [0, 10⁶], so the histogram holds ≤ 10⁶ rows per language however
    * big the corpus is — the per-language window below sorts that
    * bounded table, not documents. A cumulative count gives each score
    * value its rank interval; ntile's exact bucket sizes
    * (⌈n/3⌉-first) convert to two cut ranks; score values whose
    * interval sits inside one bucket contribute their whole count
    * directly, and only the ≤ 2 boundary-straddling score values per
    * language go back to the corpus (broadcast semi-join) for a
    * doc_id-ordered refinement within that single score group. Bucket
    * edges stay deterministic on any engine — identical to the ntile
    * formulation (the oracle still uses ntile; the hashes agree). */
  def qPplBucket(spark: SparkSession, dir: String): DataFrame = {
    val scores = TextAnalysis.bigramScores(spark, dir)
      .select("doc_id", "avg_prob_micro")
    val langs = Tables.documents(spark, dir).select("doc_id", "lang")
    val j = scores.join(langs, "doc_id")

    // bounded (lang, score) histogram with rank intervals (lo, cum]
    val wCum = Window.partitionBy("lang").orderBy(desc("avg_prob_micro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = j.groupBy("lang", "avg_prob_micro")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
      .withColumn("lo", col("cum") - col("c"))
      // ntile(3): first (n mod 3) buckets get one extra row
      .withColumn("b1", expr("n div 3 + least(n % 3, 1L)"))
      .withColumn("b2", expr("2 * (n div 3) + least(n % 3, 2L)"))

    val whole = ranked
      .filter(col("cum") <= col("b1") ||
        (col("lo") >= col("b1") && col("cum") <= col("b2")) ||
        col("lo") >= col("b2"))
      .withColumn("bucket", when(col("cum") <= col("b1"), 1L)
        .when(col("cum") <= col("b2"), 2L).otherwise(3L))
      .select(col("lang"), col("bucket"),
        col("avg_prob_micro").as("s"), col("c").as("n_d"))

    // score values crossing a cut rank: ≤ 2 rows per language
    val straddle = ranked
      .filter((col("lo") < col("b1") && col("cum") > col("b1")) ||
        (col("lo") < col("b2") && col("cum") > col("b2")))
      .select("lang", "avg_prob_micro", "lo", "b1", "b2")
    val wIn = Window.partitionBy("lang", "avg_prob_micro").orderBy("doc_id")
    val refined = j.join(broadcast(straddle), Seq("lang", "avg_prob_micro"))
      .withColumn("rk", col("lo") + row_number().over(wIn))
      .withColumn("bucket", when(col("rk") <= col("b1"), 1L)
        .when(col("rk") <= col("b2"), 2L).otherwise(3L))
      .select(col("lang"), col("bucket"),
        col("avg_prob_micro").as("s"), lit(1L).as("n_d"))

    whole.unionByName(refined)
      .groupBy("lang", "bucket")
      .agg(sum("n_d").as("n_docs"),
        min("s").as("min_score"), max("s").as("max_score"))
      .orderBy("lang", "bucket")
  }

  private val WinnowK = 5 // gram size (words)
  private val WinnowW = 4 // winnowing window (grams)
  private val WinnowMaxDf = 50 // ignore fingerprints common to >50 docs

  /** Winnowed fingerprint set per document — cached. Rolling word-5-gram
    * hashes; each length-4 window contributes its minimum hash; distinct
    * survivors are the fingerprints (density guarantee 2/(w+1), so the
    * pair index is ~2/5 the gram count). */
  private[operators] def winnowFingerprints(
      spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "winnowFp", dir) {
      val hashes = Tables.documents(spark, dir)
        .withColumn("t", toks(col("text")))
        .filter(size(col("t")) >= WinnowK + WinnowW - 1)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), size(col("t")) - (WinnowK - 1)),
            i => hash60Col(concat_ws(" ",
              (0 until WinnowK).map(j => element_at(col("t"), i + j)): _*))))
            .as(Seq("pos", "h")))
      val perDoc = Window.partitionBy("doc_id")
      val wnd = perDoc.orderBy("pos").rowsBetween(0, WinnowW - 1)
      hashes
        .withColumn("n", count(lit(1)).over(perDoc))
        .withColumn("fp", min(col("h")).over(wnd))
        .filter(col("pos") <= col("n") - WinnowW) // full windows only
        .select("doc_id", "fp")
        .distinct()
    }

  /** MOSS-style near-dup pairs: join documents on shared winnowing
    * fingerprints, count overlap, Jaccard over full fingerprint sets,
    * top-20 pairs. Fingerprints in >  [[WinnowMaxDf]] docs are dropped
    * before pairing (boilerplate — the MOSS "too common to mean
    * anything" rule), which caps the per-key pair fan-out at df² and
    * keeps the self-join linear-ish at corpus scale. */
  def qWinnow(spark: SparkSession, dir: String): DataFrame = {
    val fp = winnowFingerprints(spark, dir)
    val dfc = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= WinnowMaxDf)
      .select("fp")
    val shared = fp.join(dfc, "fp")
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    shared.as("a")
      .join(shared.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"),
        col("n_fp").as("n_a"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"),
        col("n_fp").as("n_b"))), "doc_b")
      .withColumn("sim", round(col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")), 6))
      .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "sim")
      .orderBy(desc("n_shared"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  private val VocabK = 20

  /** Tokenizer-pipeline diagnostic: build the top-[[VocabK]] corpus
    * vocabulary (count desc, term tie-break — fully ordered, so the
    * cut is deterministic) and report each document's out-of-vocabulary
    * token fraction. The vocabulary is a broadcast-sized table by
    * construction; the per-doc pass is one explode + broadcast lookup +
    * doc-keyed groupBy — linear, one shuffle. */
  def qVocabOov(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
    val vocab = tk.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(VocabK)
      .select(col("w"), lit(1L).as("in_v"))
    tk.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .orderBy("doc_id")
  }

  /** DSIR-flavored importance weighting (Xie et al. 2023), log-free:
    * the target domain is the `en` slice; each term carries an integer
    * micro-lift `(c_target · N_raw · 10⁶) div (c_raw · N_target)` —
    * the unigram probability ratio in fixed point — and a document's
    * relevance is the tf-weighted mean lift of its tokens. Exact
    * integer arithmetic end-to-end (sums are order-independent), so
    * weights are bit-stable on any engine; rank by `rel_micro` to
    * importance-sample a target-like training mix.
    *
    * Shape: two vocabulary-sized aggregates (broadcast), then one
    * doc-keyed groupBy over the token stream — linear, one corpus
    * shuffle. */
  def qDsirProxy(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("w"))
    val raw = tk.groupBy("w").agg(count(lit(1)).as("c_r"))
    val tgt = tk.filter(col("lang") === "en")
      .groupBy("w").agg(count(lit(1)).as("c_t"))
    val lift = raw.join(tgt, Seq("w"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(raw.agg(sum("c_r").cast("long").as("n_r"))))
      .crossJoin(broadcast(tgt.agg(sum("c_t").cast("long").as("n_t"))))
      // DECIMAL(38,0) intermediates: c_t·n_r·10⁶ overflows BIGINT once
      // the corpus passes ~10⁸ tokens (c_t·n_r ~ 10¹⁶ for a frequent
      // term already); 38 digits hold it to ~10¹⁶ tokens/side — past
      // the 100 TB design point. `div` lowers back to BIGINT exactly.
      .withColumn("lift_micro",
        expr("CAST(c_t AS DECIMAL(38,0)) * n_r * 1000000" +
          " div (CAST(c_r AS DECIMAL(38,0)) * n_t)"))
      .select("w", "lift_micro")
    tk.join(broadcast(lift), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("lift_micro").as("sum_lift"))
      .withColumn("rel_micro", expr("sum_lift div n_tokens"))
      .select("doc_id", "n_tokens", "rel_micro")
      .orderBy("doc_id")
  }

  /** The composed quality gate — one decision table with every
    * rule-family verdict side by side (Gopher document rules,
    * Gopher repetition rules, substring-span dedup) and the AND of all
    * three: the single boolean a 100 TB ingest partition-prunes on.
    * Per-family flags stay visible so filter attrition is auditable
    * (which rule kills how much is itself a standard pipeline report).
    *
    * Coverage: the Gopher table covers EVERY document, but the
    * repetition stats skip docs with < 3 tokens and the substring
    * stats docs with < 8 — so those families LEFT-join in and a
    * missing row reads as `false` (too short to even produce the
    * family's statistic = fails the family). Every document therefore
    * appears exactly once in the audit trail. At scale each family's
    * table would be a persisted artifact; here each is one scan
    * lineage joined on the doc key. */
  def qFilterChain(spark: SparkSession, dir: String): DataFrame = {
    val g = qGopherRules(spark, dir)
      .select(col("doc_id"), col("keep").as("keep_gopher"))
    val r = Curation.qualityRepStats(spark, dir)
      .select(col("doc_id"), col("keep").as("keep_rep"))
    val s = substrStats(spark, dir)
      .select(col("doc_id"), col("keep").as("keep_substr"))
    g.join(r, Seq("doc_id"), "left").join(s, Seq("doc_id"), "left")
      .withColumn("keep_rep", coalesce(col("keep_rep"), lit(false)))
      .withColumn("keep_substr", coalesce(col("keep_substr"), lit(false)))
      .withColumn("keep",
        col("keep_gopher") && col("keep_rep") && col("keep_substr"))
      .orderBy("doc_id")
  }

  /** Deflate length of a payload at compression level 6 — pure
    * java.util.zip, one Deflater per call (cheap; executor-local). */
  private[graft] def deflateLen(raw: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  /** Compression-ratio quality signal (the CCNet/RedPajama/DataTrove
    * heuristic): highly repetitive or templated text deflates far
    * below normal prose; random or binary junk barely deflates at
    * all. Emits the exact byte counts and a fixed-point ratio; keep =
    * ratio within [0.25, 0.95]. Deflate has no SQL analogue, so the
    * oracle is the committed golden table (the boundary-chunker
    * mechanism — [[graft.GoldenChunks]]); determinism and the
    * orderings that make the signal meaningful are pinned by
    * QualitySpec.
    *
    * Scale shape: row-local mapPartitions over the scan — zero
    * shuffles, embarrassingly parallel, CPU-bound; exactly the
    * 100 TB posture for a per-document codec pass. */
  def qCompressRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val comp = deflateLen(raw)
        (id, raw.length.toLong, comp, comp * 1000 / math.max(raw.length, 1))
      })
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio_milli")
      .withColumn("keep",
        col("ratio_milli") >= 250 && col("ratio_milli") <= 950)
      .orderBy("doc_id")
  }

  /** Multinomial Naive Bayes text classifier — the SQL-expressible
    * stand-in for the linear quality classifier of GPT-3 / CCNet-style
    * curation (Brown et al. 2020 appendix A; Wenzek et al. 2020 train
    * a fastText model against a high-quality reference corpus): train
    * on a deterministic 80% document split with `source` as the weak
    * class label, score the held-out 20%, and emit the confusion
    * matrix — the number that says whether a cheap lexical model can
    * reproduce the curation signal before anyone pays for a neural
    * scorer.
    *
    * Determinism: every per-(word, class) smoothed log-likelihood and
    * every prior is rounded to INTEGER MICROS at the one place it is
    * computed (a single `ln` of a ratio of exact integers); all
    * downstream math is integer sums, so results are bit-identical
    * across engines and partial-aggregation orders — the same
    * fixed-point discipline as the rest of this file.
    *
    * Scale shape: the (word, class) table IS the trained model (V×C
    * rows, Heaps-law sublinear) and is broadcast like [[Curation]]'s
    * BPE merge table; the corpus-sized passes are explode → groupBy
    * with map-side partials and the held-out score join is
    * broadcast-hash on word. Argmax is an aggregate (`min(struct)`),
    * never a rank window. Past ~10M model rows drop the broadcast
    * hints and let AQE's skew join absorb the Zipf head. */
  /** A trained NB model: three bounded tables, all in integer micros —
    * the V×C word log-likelihoods, the C class priors, the C
    * unseen-word fallbacks. Persisted/loaded as one atomic artifact by
    * [[graft.model.Artifacts]]; served online by
    * [[graft.streaming.StreamingClassify]]. */
  case class NbModel(wordLik: DataFrame, priors: DataFrame,
      unseen: DataFrame)

  /** Train the NB model on every document of `docs` (callers apply
    * their own train/held-out split). */
  def nbTrain(docs: DataFrame): NbModel = {
    // ONE corpus-sized pass: the (cls, word, cnt) base table is
    // persisted and every model table (totals, vocab, likelihoods,
    // priors) derives from it — without this the exploded token
    // lineage was re-derived four times (one full tokenize+scan per
    // model table). `base` is vocab×classes-sized, far below corpus.
    val base = docs.select(col("source"),
      explode(toks(col("text"))).as("word"))
      .groupBy(col("source").as("cls"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    base.count()
    // class priors count docs with ≥1 token (the docs the token table
    // sees) — a narrow no-explode scan, not a fourth token pass
    val cls = docs
      .filter(size(toks(col("text"))) > 0)
      .groupBy(col("source").as("cls"))
      .agg(count(lit(1)).as("class_docs"))
    val tot = base.groupBy("cls").agg(sum(col("cnt")).as("tot"))
    val v = base.select("word").distinct()
      .agg(count(lit(1)).as("vocab"))
    val wordLik = base
      .join(broadcast(tot), "cls")
      .crossJoin(broadcast(v))
      .select(col("cls"), col("word"),
        round(log((col("cnt") + 1).cast("double") /
          (col("tot") + col("vocab"))) * 1e6).cast("long")
          .as("wc_micro"))
    val unseen = tot.crossJoin(broadcast(v))
      .select(col("cls"),
        round(log(lit(1.0) / (col("tot") + col("vocab"))) * 1e6)
          .cast("long").as("unseen_micro"))
    val priors = cls
      .crossJoin(broadcast(cls.agg(sum("class_docs").as("all_docs"))))
      .select(col("cls"),
        round(log(col("class_docs").cast("double") / col("all_docs")) *
          1e6).cast("long").as("prior_micro"))
    // materialize the (bounded) model tables, then release the base —
    // the model lives persisted for its serving lifetime, the
    // intermediate does not
    val m = NbModel(wordLik.persist(), priors.persist(), unseen.persist())
    m.wordLik.count(); m.priors.count(); m.unseen.count()
    base.unpersist(false)
    m
  }

  /** Score (doc_id, text, …) rows against a trained model: per-doc
    * argmax class + its score. `carry` columns pass through the
    * per-doc aggregation unchanged (they must be doc-functional).
    * Pure broadcast joins + map-side-partial aggregates — stateless,
    * so the same code path serves batch and per-micro-batch streaming
    * ([[graft.streaming.StreamingClassify]]). */
  def nbScore(docs: DataFrame, m: NbModel,
      carry: Seq[String] = Nil): DataFrame = {
    val keys = (Seq("doc_id") ++ carry).map(col)
    docs
      .select(keys :+ explode(toks(col("text"))).as("word"): _*)
      .groupBy(keys :+ col("word"): _*)
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(m.priors.select("cls")))
      .join(broadcast(m.wordLik), Seq("cls", "word"), "left")
      .join(broadcast(m.unseen), Seq("cls"))
      .withColumn("w_micro", coalesce(col("wc_micro"), col("unseen_micro")))
      .groupBy(keys :+ col("cls"): _*)
      .agg(sum(col("n") * col("w_micro")).as("like_micro"))
      .join(broadcast(m.priors), Seq("cls"))
      .withColumn("score", col("like_micro") + col("prior_micro"))
      .groupBy(keys: _*)
      .agg(min(struct((-col("score")).as("neg"), col("cls").as("c")))
        .as("best"))
      .select(keys :+ col("best.c").as("predicted") :+
        (-col("best.neg")).as("score_micro"): _*)
  }

  def nbConfusion(docs: DataFrame): DataFrame = {
    val m = nbTrain(docs.filter(col("doc_id") % 5 =!= 0))
    nbScore(docs.filter(col("doc_id") % 5 === 0), m, carry = Seq("source"))
      .groupBy(col("source").as("actual"), col("predicted"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .orderBy("actual", "predicted")
  }

  def qNbClassifier(spark: SparkSession, dir: String): DataFrame =
    nbConfusion(Tables.documents(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nb_classifier" -> (qNbClassifier _),
    "q_compress_ratio" -> (qCompressRatio _),
    "q_gopher_rules" -> (qGopherRules _),
    "q_c4_rules"     -> (qC4Rules _),
    "q_substr_dedup" -> (qSubstrDedup _),
    "q_ppl_bucket"   -> (qPplBucket _),
    "q_winnow"       -> (qWinnow _),
    "q_vocab_oov"    -> (qVocabOov _),
    "q_dsir_proxy"   -> (qDsirProxy _),
    "q_filter_chain" -> (qFilterChain _),
    // the end-to-end curation job's attrition manifest (api layer, but
    // oracle-checked like any operator: the pipeline IS a query)
    "q_curation_manifest" ->
      ((s: SparkSession, d: String) => api.CurationPipeline.curate(s, d)),
    // the full sequential snapshot job: quality → exact dedup →
    // decontaminate → near-dup → sample → pack → shard, one manifest
    "q_pipeline_full" ->
      ((s: SparkSession, d: String) => api.CurationPipeline.full(s, d)),
  )

  import TextAnalysis.{toksSql, bigramScoreSql}

  private lazy val baseOracles: Map[String, String] = Map(
    "q_nb_classifier" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source, x.w AS word
         |  FROM documents, LATERAL (SELECT unnest($toksSql) AS w) x),
         |tr AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
         |ho AS (
         |  SELECT doc_id, source, word, count(*)::BIGINT AS n
         |  FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
         |cls AS (
         |  SELECT source AS cls, count(DISTINCT doc_id)::BIGINT AS class_docs
         |  FROM tr GROUP BY 1),
         |tot AS (SELECT source AS cls, count(*)::BIGINT AS tot
         |  FROM tr GROUP BY 1),
         |v AS (SELECT count(DISTINCT word)::BIGINT AS vocab FROM tr),
         |stats AS (
         |  SELECT w.cls, w.word,
         |    CAST(round(ln((w.cnt + 1)::DOUBLE / (t.tot + v.vocab))
         |      * 1000000) AS BIGINT) AS wc_micro
         |  FROM (SELECT source AS cls, word, count(*)::BIGINT AS cnt
         |        FROM tr GROUP BY 1, 2) w
         |  JOIN tot t ON t.cls = w.cls CROSS JOIN v),
         |unseen AS (
         |  SELECT t.cls,
         |    CAST(round(ln(1.0 / (t.tot + v.vocab)) * 1000000) AS BIGINT)
         |      AS unseen_micro
         |  FROM tot t CROSS JOIN v),
         |priors AS (
         |  SELECT cls, CAST(round(ln(class_docs::DOUBLE /
         |    (SELECT sum(class_docs) FROM cls)) * 1000000) AS BIGINT)
         |    AS prior_micro
         |  FROM cls),
         |sc AS (
         |  SELECT h.doc_id, h.source, c.cls,
         |    sum(h.n * coalesce(s.wc_micro, u.unseen_micro))::BIGINT
         |      AS like_micro
         |  FROM ho h
         |  CROSS JOIN (SELECT cls FROM cls) c
         |  LEFT JOIN stats s ON s.cls = c.cls AND s.word = h.word
         |  JOIN unseen u ON u.cls = c.cls
         |  GROUP BY 1, 2, 3),
         |fin AS (
         |  SELECT sc.doc_id, sc.source, sc.cls,
         |    sc.like_micro + p.prior_micro AS score
         |  FROM sc JOIN priors p ON p.cls = sc.cls),
         |pred AS (
         |  SELECT doc_id, source AS actual, cls AS predicted,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rk
         |  FROM fin)
         |SELECT actual, predicted, count(*)::BIGINT AS n_docs
         |FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_c4_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, regexp_split_to_array(text, '\\n') AS lines
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(lines)::BIGINT AS n_lines,
         |    len(list_filter(lines, l ->
         |      len(list_filter(regexp_split_to_array(l, '\\s+'), w -> w <> '')) >= 5
         |      AND regexp_matches(l, '[.!?"]\\s*$$')))::BIGINT AS kept_lines,
         |    ((length(text) - length(replace(text, '.', ''))) +
         |     (length(text) - length(replace(text, '!', ''))) +
         |     (length(text) - length(replace(text, '?', ''))))::BIGINT
         |      AS n_sentences,
         |    contains(lower(text), 'lorem ipsum') AS has_lorem,
         |    contains(text, '{') AS has_brace,
         |    contains(lower(text), 'javascript') AS has_js
         |  FROM t)
         |SELECT doc_id, n_lines, kept_lines, n_sentences, has_lorem,
         |  has_brace, has_js,
         |  kept_lines >= 1 AND n_sentences >= 3 AND NOT has_lorem
         |    AND NOT has_brace AND NOT has_js AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "q_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    list_sum(list_transform(toks, w -> length(w)))::BIGINT AS sum_len,
         |    len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::BIGINT
         |      AS n_alpha,
         |    len(list_filter(toks, w -> w IN ('the','be','to','of','and',
         |      'that','have','with')))::BIGINT AS n_stop,
         |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
         |    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT
         |      AS n_ellipsis
         |  FROM t),
         |r AS (
         |  SELECT doc_id, n_words,
         |    round(sum_len::DOUBLE / n_words, 6) AS mean_word_len,
         |    round((n_hash + n_ellipsis)::DOUBLE / n_words, 6) AS symbol_ratio,
         |    round(n_alpha::DOUBLE / n_words, 6) AS alpha_frac,
         |    n_stop
         |  FROM m)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
         |  n_stop,
         |  n_words >= 50 AND n_words <= 100000 AND mean_word_len >= 3
         |    AND mean_word_len <= 10 AND symbol_ratio <= 0.1
         |    AND alpha_frac >= 0.8 AND n_stop >= 2 AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_substr_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |gr AS (
         |  SELECT DISTINCT doc_id,
         |    ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))
         |      ::BIGINT AS g
         |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i) u
         |  WHERE len(toks) >= 8),
         |s AS (
         |  SELECT g, min(doc_id) AS owner, count(*) AS n_docs
         |  FROM gr GROUP BY g),
         |a AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
         |    sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END)::BIGINT AS n_dup
         |  FROM gr JOIN s USING (g) GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_shared, n_dup,
         |  round(n_dup::DOUBLE / n_grams, 6) AS dup_frac,
         |  round(n_dup::DOUBLE / n_grams, 6) <= 0.5 AS keep
         |FROM a ORDER BY doc_id""".stripMargin,
    "q_ppl_bucket" ->
      s"""WITH $bigramScoreSql,
         |j AS (
         |  SELECT b.doc_id, d.lang, b.avg_prob_micro
         |  FROM bscore b JOIN documents d USING (doc_id)),
         |k AS (
         |  SELECT lang, avg_prob_micro,
         |    ntile(3) OVER (PARTITION BY lang
         |      ORDER BY avg_prob_micro DESC, doc_id) AS bucket
         |  FROM j)
         |SELECT lang, bucket::BIGINT AS bucket, count(*) AS n_docs,
         |  min(avg_prob_micro) AS min_score, max(avg_prob_micro) AS max_score
         |FROM k GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    "q_vocab_oov" ->
      s"""WITH tk AS (
         |  SELECT doc_id, tok AS w
         |  FROM documents, LATERAL (SELECT unnest($toksSql) AS tok) u),
         |v AS (
         |  SELECT w FROM (
         |    SELECT w, count(*) AS n FROM tk GROUP BY w
         |    ORDER BY n DESC, w LIMIT 20)),
         |a AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
         |  FROM tk LEFT JOIN v ON tk.w = v.w GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_oov,
         |  round(n_oov::DOUBLE / n_tokens, 6) AS oov_frac
         |FROM a ORDER BY doc_id""".stripMargin,
    "q_dsir_proxy" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang, tok AS w
         |  FROM documents, LATERAL (SELECT unnest($toksSql) AS tok) u),
         |raw AS (SELECT w, count(*) AS c_r FROM tk GROUP BY w),
         |tgt AS (
         |  SELECT w, count(*) AS c_t FROM tk WHERE lang = 'en' GROUP BY w),
         |nr AS (SELECT sum(c_r)::BIGINT AS n_r FROM raw),
         |nt AS (SELECT sum(c_t)::BIGINT AS n_t FROM tgt),
         |lift AS (
         |  SELECT raw.w,
         |    ((coalesce(tgt.c_t, 0)::HUGEINT * n_r * 1000000)
         |      // (raw.c_r::HUGEINT * n_t))::BIGINT AS lift_micro
         |  FROM raw LEFT JOIN tgt USING (w), nr, nt)
         |SELECT doc_id, count(*) AS n_tokens,
         |  (sum(lift_micro)::BIGINT) // count(*) AS rel_micro
         |FROM tk JOIN lift USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_winnow" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (
         |  SELECT doc_id, i - 1 AS pos, len(toks) - 4 AS n,
         |    ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))
         |      ::BIGINT AS hh
         |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 3)) AS i) u
         |  WHERE len(toks) >= 8),
         |f AS (
         |  SELECT doc_id, pos, n,
         |    min(hh) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM h),
         |fps AS (SELECT DISTINCT doc_id, fp FROM f WHERE pos <= n - 4),
         |dfc AS (
         |  SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp)
         |  WHERE df >= 2 AND df <= 50),
         |sh AS (SELECT doc_id, fp FROM fps JOIN dfc USING (fp)),
         |sz AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
         |pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |  FROM sh a JOIN sh b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
         |  round(n_shared::DOUBLE / (sa.n_fp + sb.n_fp - n_shared), 6) AS sim
         |FROM pr
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |ORDER BY n_shared DESC, doc_a, doc_b LIMIT 20""".stripMargin,
  )

  private lazy val chainSql =
    s"""SELECT g.doc_id, g.keep AS keep_gopher,
       |  coalesce(r.keep, false) AS keep_rep,
       |  coalesce(s.keep, false) AS keep_substr,
       |  g.keep AND coalesce(r.keep, false) AND coalesce(s.keep, false)
       |    AS keep
       |FROM (${baseOracles("q_gopher_rules")}) g
       |LEFT JOIN (${Curation.oracles("q_quality_rep")}) r USING (doc_id)
       |LEFT JOIN (${baseOracles("q_substr_dedup")}) s USING (doc_id)
       |ORDER BY g.doc_id""".stripMargin

  /** The chain and manifest oracles compose the component oracles
    * verbatim as subqueries, so the flags and counts can never drift
    * from the per-family queries they audit. */
  lazy val oracles: Map[String, String] = baseOracles +
    // Deflate has no SQL analogue, so like the boundary chunkers the
    // oracle is the committed golden table ([[graft.GoldenChunks]]) —
    // the ratio semantics themselves are pinned by QualitySpec.
    ("q_compress_ratio" ->
      s"""SELECT * FROM
         |read_parquet('$fixturesDir/compress_ratio_sf0.01.parquet/*.parquet')
         |ORDER BY doc_id""".stripMargin) +
    ("q_filter_chain" -> chainSql) +
    // The FULL sequential pipeline: every stage's CTE filters the
    // previous stage's survivors, reusing the component oracles'
    // formulas verbatim (shingles/minhash from Dedup, the sample key
    // from Curation, the packer's cumsum) so the manifest can never
    // drift from the per-family queries it reconciles with.
    ("q_pipeline_full" ->
      s"""WITH RECURSIVE
         |keepq AS MATERIALIZED (SELECT doc_id FROM ($chainSql) ch WHERE ch.keep),
         |s2base AS MATERIALIZED (
         |  SELECT d.* FROM documents d JOIN keepq USING (doc_id)),
         |ew AS (
         |  SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id, md5(lower(text)) AS fp FROM s2base)
         |  GROUP BY fp),
         |s3base AS MATERIALIZED (SELECT s.* FROM s2base s JOIN ew USING (doc_id)),
         |${Dedup.shinglesCte(
             "WHERE doc_id IN (SELECT doc_id FROM s3base) OR doc_id < 20")
             .replace("sh AS (", "sh AS MATERIALIZED (")},
         |cont AS (
         |  SELECT s.doc_id FROM (
         |    SELECT c.doc_id, count(*) AS n_shared
         |    FROM sh c
         |    JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20) t
         |      USING (shingle)
         |    WHERE c.doc_id >= 20 GROUP BY c.doc_id) s
         |  JOIN (SELECT doc_id, count(*) AS sz FROM sh
         |        WHERE doc_id >= 20 GROUP BY 1) z USING (doc_id)
         |  WHERE 2 * s.n_shared >= z.sz),
         |s4base AS MATERIALIZED (
         |  SELECT * FROM s3base WHERE doc_id >= 20
         |    AND doc_id NOT IN (SELECT doc_id FROM cont)),
         |hv AS (
         |  SELECT sh.doc_id,
         |    ('0x'||substr(md5(shingle),1,15))::BIGINT % ${Dedup.MinhashP} AS hv
         |  FROM sh JOIN s4base USING (doc_id)),
         |sig AS MATERIALIZED (
         |  SELECT doc_id, h, min((a * hv + b) % ${Dedup.MinhashP}) AS minhash
         |  FROM hv, (VALUES ${Dedup.coeffValues}) c(h, a, b)
         |  GROUP BY doc_id, h),
         |bands AS (
         |  SELECT doc_id, h // 4 AS band,
         |    md5(string_agg(minhash::VARCHAR, ',' ORDER BY h)) AS band_sig
         |  FROM sig GROUP BY doc_id, band),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b USING (band, band_sig)
         |  WHERE a.doc_id < b.doc_id),
         |sizes AS (
         |  SELECT sh.doc_id, count(*) AS sz
         |  FROM sh JOIN s4base USING (doc_id) GROUP BY 1),
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  JOIN sizes sa ON sa.doc_id = c.doc_a
         |  JOIN sizes sb ON sb.doc_id = c.doc_b
         |  GROUP BY c.doc_a, c.doc_b, sa.sz, sb.sz
         |  HAVING round(count(*)::DOUBLE / (sa.sz + sb.sz - count(*)), 6) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u),
         |labels AS (SELECT u AS doc_id, min(root) AS grp FROM reach GROUP BY u),
         |rq AS (
         |  SELECT l.doc_id, row_number() OVER (PARTITION BY grp
         |    ORDER BY d.n_chars DESC, l.doc_id) AS rk
         |  FROM labels l JOIN s4base d USING (doc_id)),
         |losers AS (SELECT doc_id FROM rq WHERE rk > 1),
         |s5base AS MATERIALIZED (
         |  SELECT * FROM s4base
         |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |h6 AS (
         |  SELECT lang, doc_id, n_chars,
         |    ('0x'||substr(md5('wsamp:'||doc_id::VARCHAR),1,15))::BIGINT AS h
         |  FROM s5base),
         |k6 AS (
         |  SELECT lang, doc_id,
         |    CAST(round(-ln((h + 1)::DOUBLE / 1152921504606846976.0)
         |      * 1000000 / n_chars) AS BIGINT) AS key_micro
         |  FROM h6),
         |r6 AS (
         |  SELECT doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY key_micro, doc_id) AS rk
         |  FROM k6),
         |s6base AS MATERIALIZED (
         |  SELECT s.* FROM s5base s
         |  JOIN (SELECT doc_id FROM r6 WHERE rk <= ${Curation.SampleK}) w
         |  USING (doc_id)),
         |d7 AS (
         |  SELECT doc_id, source, len($toksSql)::BIGINT AS tok FROM s6base),
         |c7 AS (
         |  SELECT doc_id, source, tok,
         |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d7),
         |np AS (
         |  SELECT count(*)::BIGINT AS n FROM (
         |    SELECT DISTINCT source,
         |      CAST(floor((cum - tok) / ${Curation.PackCapacity}) AS BIGINT)
         |    FROM c7)),
         |n6 AS (
         |  SELECT count(*)::BIGINT AS n,
         |    coalesce(sum(n_chars), 0)::BIGINT AS c FROM s6base)
         |SELECT 1::BIGINT AS stage, 'input' AS name, count(*)::BIGINT AS n_docs,
         |  coalesce(sum(n_chars), 0)::BIGINT AS n_chars, 0::BIGINT AS n_units
         |FROM documents
         |UNION ALL SELECT 2::BIGINT, 'after_quality', count(*)::BIGINT,
         |  coalesce(sum(n_chars), 0)::BIGINT, 0::BIGINT FROM s2base
         |UNION ALL SELECT 3::BIGINT, 'after_exact', count(*)::BIGINT,
         |  coalesce(sum(n_chars), 0)::BIGINT, 0::BIGINT FROM s3base
         |UNION ALL SELECT 4::BIGINT, 'after_decon', count(*)::BIGINT,
         |  coalesce(sum(n_chars), 0)::BIGINT, 0::BIGINT FROM s4base
         |UNION ALL SELECT 5::BIGINT, 'after_neardup', count(*)::BIGINT,
         |  coalesce(sum(n_chars), 0)::BIGINT, 0::BIGINT FROM s5base
         |UNION ALL SELECT 6::BIGINT, 'after_sample', count(*)::BIGINT,
         |  coalesce(sum(n_chars), 0)::BIGINT, 0::BIGINT FROM s6base
         |UNION ALL SELECT 7::BIGINT, 'packed', (SELECT n FROM n6),
         |  (SELECT c FROM n6), (SELECT n FROM np)
         |UNION ALL SELECT 8::BIGINT, 'sharded', (SELECT n FROM n6),
         |  (SELECT c FROM n6),
         |  ((SELECT n FROM n6) + ${Curation.ShardDocs - 1})
         |    // ${Curation.ShardDocs}
         |ORDER BY stage""".stripMargin) +
    ("q_curation_manifest" ->
      s"""WITH RECURSIVE ${Dedup.ccSql},
         |keepq AS (SELECT doc_id FROM ($chainSql) ch WHERE ch.keep),
         |jq AS (
         |  SELECT l.doc_id, l.grp, d.n_chars
         |  FROM labels l JOIN documents d USING (doc_id)),
         |rq AS (
         |  SELECT doc_id, row_number() OVER (PARTITION BY grp
         |    ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM jq),
         |losers AS (SELECT doc_id FROM rq WHERE rk > 1),
         |s2base AS (SELECT d.* FROM documents d JOIN keepq USING (doc_id)),
         |s3base AS (
         |  SELECT * FROM s2base
         |  WHERE doc_id NOT IN (SELECT doc_id FROM losers))
         |SELECT 1::BIGINT AS stage, 'input' AS name, count(*) AS n_docs,
         |  coalesce(sum(n_chars), 0)::BIGINT AS n_chars FROM documents
         |UNION ALL
         |SELECT 2::BIGINT, 'after_quality', count(*),
         |  coalesce(sum(n_chars), 0)::BIGINT FROM s2base
         |UNION ALL
         |SELECT 3::BIGINT, 'after_neardup', count(*),
         |  coalesce(sum(n_chars), 0)::BIGINT FROM s3base
         |ORDER BY stage""".stripMargin)
}
