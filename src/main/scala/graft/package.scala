import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Shared syntax for the engine: `$"col"` as a [[Column]] without a
  * session-bound `spark.implicits._` import (the engine's operators are
  * session-agnostic functions `(SparkSession, dir) => DataFrame`).
  */
package object graft {
  implicit class ColDollar(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Committed-golden-fixture directory, resolved at runtime:
    * `-Dgraft.fixtures.dir` / `GRAFT_FIXTURES_DIR` override, else
    * `fixtures/` under the working directory (Verify and sbt both run
    * from the repo root). */
  lazy val fixturesDir: String =
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse(new java.io.File("fixtures").getAbsolutePath)
}
