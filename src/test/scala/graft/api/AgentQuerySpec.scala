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

  test("Q6: content-type classifier first-match chain") {
    assert(AgentQuery.contentTypeOf("function f() {}") === "code")
    assert(AgentQuery.contentTypeOf("install the package") === "configuration")
    assert(AgentQuery.contentTypeOf("# Title\nbody") === "documentation")
    assert(AgentQuery.contentTypeOf("plain words") === "text")
  }
}
