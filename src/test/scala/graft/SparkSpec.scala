package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Base for engine specs: one shared local session per JVM (Spark
  * sessions are expensive; getOrCreate reuses across suites in the
  * forked test JVM).
  */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4)

  /** sf0.001 keeps unit tests fast; correctness vs DuckDB runs at sf0.01
    * through the driver's Verify gate. */
  val sfDir = "/root/testdata/sf0.001"

  /** Run `f` with the named optimizer rule(s) excluded — used by specs
    * that must exercise the raw pre-rewrite evaluation path (e.g. the
    * genuine HOF dot product, which [[graft.plans.RewriteDotProduct]]
    * otherwise rewrites to graft_dot, making an equivalence test
    * tautological). */
  def withoutOptimizerRules[T](rules: String)(f: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rules)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
