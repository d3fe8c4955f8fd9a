package graft
package api

import java.nio.file.Files
import java.sql.Timestamp

class AgentQuerySpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-02 03:04:05")
  private lazy val store: String = {
    val s = Files.createTempDirectory("graft_agent").resolve("store").toString
    IndexPipeline.indexText(spark, "ocelot marmoset capybara " * 60,
      "animals", s, t0)
    IndexPipeline.indexText(spark, "quasar pulsar nebula " * 60,
      "space", s, t0)
    s
  }

  test("Q6: search + analysis + pagination + cache in one call") {
    val cache = new QueryCache()
    val r1 = AgentQuery.query(spark, store, "ocelot capybara", pageSize = 2,
      cache = Some(cache))
    assert(r1.hits.nonEmpty)
    assert(r1.analysis.keywordCoverage === 1.0)
    assert(r1.analysis.missingKeywords.isEmpty)
    assert(r1.analysis.meanScore > 0)
    // pagination: next page has different hits
    r1.nextCursor.foreach { c =>
      val r2 = AgentQuery.query(spark, store, "ocelot capybara", pageSize = 2,
        cursor = Some(c), cache = Some(cache))
      assert(r2.hits.map(_.id).toSet.intersect(r1.hits.map(_.id).toSet).isEmpty)
    }
    // cache: similar follow-up surfaces the earlier query. Keywords are
    // the NEW query's length>3 tokens ("see"/"the" drop out), and both
    // remaining ones appear in the cached text (reference 70% rule) —
    // while an extra unseen keyword ("photos", 2/3 < 0.7) is a miss.
    val r3 = AgentQuery.query(spark, store, "see the ocelot capybara",
      cache = Some(cache))
    assert(r3.fromCache === Some("ocelot capybara"))
    val r4 = AgentQuery.query(spark, store, "ocelot capybara photos",
      cache = Some(cache))
    assert(r4.fromCache === None)
  }

  test("Q6: rule engine reacts to missing keywords and empty results") {
    val r = AgentQuery.query(spark, store, "ocelot xylophone")
    assert(r.analysis.missingKeywords === Seq("xylophone"))
    assert(r.analysis.suggestions.exists(_.contains("xylophone")))
    assert(AgentQuery.suggest(0, 0, 0, Nil, hybrid = false)
      .exists(_.startsWith("no results")))
  }

  test("Q5: auto-planned chain dedupes across stages, keeps best score") {
    val stages = QueryChain.planStages("ocelot capybara sightings")
    assert(stages.size === 3)
    assert(stages.head.query === "ocelot capybara sightings")
    assert(stages(1).query === "sightings capybara") // longest-first
    assert(stages(2).hybrid)
    val out = QueryChain.runGoal(spark, store, "ocelot capybara sightings", k = 5)
    val ids = out.select("id").collect().map(_.getString(0)).toSeq
    assert(ids.nonEmpty && ids.distinct.size === ids.size) // J6 dedup
    // ranked descending
    val scores = out.select("score").collect().map(_.getDouble(0)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("Q6: content-type classifier — the reference detectContentType chain") {
    assert(AgentQuery.contentTypeOf("function f() {}") === "code")
    assert(AgentQuery.contentTypeOf("import x from 'y'") === "code")
    assert(AgentQuery.contentTypeOf("Example: run the thing") === "example")
    assert(AgentQuery.contentTypeOf("""{"key": "value"}""") === "configuration")
    assert(AgentQuery.contentTypeOf("timeout: 30") === "configuration")
    assert(AgentQuery.contentTypeOf("# Title\nbody") === "documentation")
    assert(AgentQuery.contentTypeOf("* bullet list") === "documentation")
    assert(AgentQuery.contentTypeOf("plain words") === "text")
    // precedence: code beats example beats configuration
    assert(AgentQuery.contentTypeOf("Example: class Foo {}") === "code")
  }

  test("Q6: typed rule engine — reference thresholds") {
    import AgentQuery.AgentRules._
    // query analysis (agent-query-tool.ts:290-330)
    val qa = analyzeQuery("how do I build it")
    assert(qa.complexity === "moderate") // 5 words
    assert(qa.queryType === "factual")   // "how" wins over "build"
    assert(qa.ambiguity === Seq("do", "I", "it"))
    assert(analyzeQuery("a b c").complexity === "simple")
    assert(analyzeQuery("one two three four five six seven eight").complexity
      === "complex")
    assert(analyzeQuery("インデックス 作成").language === "ja")
    assert(analyzeQuery("implement the parser").queryType === "transactional")

    // next actions: thresholds + confidence ordering
    val broadened = nextActions("q", 0, 0.0, Nil, 0.0)
    assert(broadened.head.action === "broaden")
    assert(broadened.head.suggestedQuery === Some("q OR related OR similar"))
    val good = nextActions("q", 5, 0.75, Nil, 0.0)
    assert(good.head.action === "write_structured_result" &&
      good.head.confidence === 1.0)
    val gaps = nextActions("q", 5, 0.75, Seq("missing"), 0.8)
    assert(gaps.map(_.action) ===
      Seq("write_structured_result", "refine", "pivot"))
    assert(gaps(1).suggestedQuery === Some("q missing"))

    // tool suggestions
    assert(toolSuggestions(5, 0.8, 0.9).map(_.tool) ===
      Seq("write_structured_result"))
    assert(toolSuggestions(2, 0.2, 0.1).map(_.tool) ===
      Seq("query_simple", "index"))

    // considerations + problems
    assert(considerations("complex", "text", hasExamples = true).size === 1)
    assert(considerations("simple", "code", hasExamples = false).size === 1)
    assert(considerations("simple", "code", hasExamples = true).isEmpty)
    assert(problems(0.4, Nil).head.impact === "medium")
    assert(problems(0.1, Seq("it")).head.likelihood === 0.6)
    assert(problems(0.1, Nil).isEmpty)

    // progress
    assert(progress(0, hasHighQuality = false).goalAlignment === 0.2)
    assert(progress(4, hasHighQuality = false).goalAlignment === 0.5)
    val p = progress(12, hasHighQuality = true)
    assert(p.goalAlignment === 0.8 && p.estimatedCompletion === 1.0)
    assert(p.milestones ===
      Seq("Found relevant content", "Identified high-quality matches"))

    // redundancy / diversity primitives
    assert(redundancyOf(Seq("a b c", "a b c")) === 1.0)
    assert(redundancyOf(Seq("a b", "c d")) === 0.0)
    assert(redundancyOf(Seq("solo")) === 0.0)
    // diversity pools extractKeywords output: distinct per result,
    // stop-words and 1-char tokens dropped (metadata-generator.ts:168)
    assert(diversityOf(Seq("kafka kafka kafka")) === 0.0) // one keyword
    assert(diversityOf(Seq("kafka", "spark", "flink", "beam")) === 0.75)
    assert(diversityOf(Seq("the kafka the")) === 0.0)      // stopwords gone
    assert(diversityOf(Seq("kafka kafka spark")) === 0.5)  // per-result dedup
    assert(diversityOf(Seq("a b", "c d")) === 0.0)         // minLength 2

    // coherence: |keywords in >1 result| / |vocab|
    assert(coherenceOf(Seq("kafka spark", "kafka flink")) === 1.0 / 3)
    assert(coherenceOf(Nil) === 0.0)

    // predominant type: presence chain, NOT modal — one code hit among
    // many text hits still reports "code" (metadata-generator.ts:487-501)
    assert(predominantOf(Seq("code") ++ Seq.fill(9)("text")) === "code")
    assert(predominantOf(Seq("code", "documentation")) === "mixed")
    assert(predominantOf(Seq("documentation", "text")) === "documentation")
    assert(predominantOf(Seq("example", "text")) === "example")
    assert(predominantOf(Seq("text", "configuration")) === "mixed")
    assert(predominantOf(Nil) === "mixed")
  }

  test("Keywords.extract mirrors the reference stop-word pipeline") {
    // frequency-desc ordering, ties by first occurrence
    assert(Keywords.extract("spark kafka spark flink kafka spark") ===
      Seq("spark", "kafka", "flink"))
    // stop words (EN + JA) and short tokens removed
    assert(Keywords.extract("the quick fox is in a hurry") ===
      Seq("quick", "fox", "hurry"))
    assert(Keywords.extract("これ は kafka です") === Seq("kafka"))
    // CJK punctuation splits tokens
    assert(Keywords.extract("kafka、spark。flink") ===
      Seq("kafka", "spark", "flink"))
    // minFrequency / topN knobs
    assert(Keywords.extract("x1 x1 y2", minFrequency = 2) === Seq("x1"))
    assert(Keywords.extract("x1 x1 y2 y2 z3", topN = Some(2)) ===
      Seq("x1", "y2"))
  }

  test("Q6: full response carries the rule-engine output") {
    val r = AgentQuery.query(spark, store, "ocelot capybara sightings")
    assert(r.queryAnalysis.exists(_.complexity === "simple"))
    assert(r.progress.nonEmpty)
    // with any hits at all, progress reports at least found-content
    if (r.hits.nonEmpty)
      assert(r.progress.get.milestones.contains("Found relevant content"))
  }
}
