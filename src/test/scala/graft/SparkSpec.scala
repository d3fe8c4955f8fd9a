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
}
