package graft

/** Contract guard for the driver registry: every oracle key has a
  * query, every query builds a plan at sf0.001, and every output
  * schema is compare-safe (unique, lowercase [a-z0-9_] column names —
  * the driver sorts columns BY NAME before hashing). Catches drift
  * before the correctness gate does. Plans are only analyzed, not
  * executed — Verify runs them for real. */
class RegistrySpec extends SparkSpec {

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query builds and emits a compare-safe schema") {
    val nameRe = "^[a-z][a-z0-9_]*$".r
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      val cols = df.schema.fieldNames.toSeq
      assert(cols.nonEmpty, s"$name: empty schema")
      assert(cols.distinct.size === cols.size, s"$name: duplicate columns $cols")
      cols.foreach { c =>
        assert(nameRe.matches(c), s"$name: column '$c' not compare-safe")
      }
    }
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
