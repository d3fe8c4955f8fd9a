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
}
