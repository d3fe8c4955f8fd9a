package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q5 executeQueryChain against a chunk store (reference
  * `src/mcp/utils/query-chain.ts:79-272` + the auto-3-stage planner in
  * `src/mcp/tools/query-tool.ts:49-91`): broad → focused → specific
  * stages, all results unioned, deduped keep-best per chunk (J6),
  * ranked. Stages run as DataFrame unions — one plan, not a driver
  * loop over collected results.
  */
object QueryChain {

  case class Stage(query: String, hybrid: Boolean = false)

  /** The reference's auto-plan: stage 1 = the goal verbatim (broad),
    * stage 2 = the most specific keywords (longest words), stage 3 =
    * hybrid on the full goal for exact-term rescue. Deterministic. */
  def planStages(goal: String): Seq[Stage] = {
    val words = goal.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val specific = words.sortBy(w => (-w.length, w)).take(2)
    Seq(
      Stage(goal),
      Stage(specific.mkString(" ")),
      Stage(goal, hybrid = true))
  }

  /** Run the stages, union, J6-dedup keep-best per chunk id, top-k. */
  def run(spark: SparkSession, storePath: String, stages: Seq[Stage],
      k: Int = 10): DataFrame = {
    val perStage = stages.zipWithIndex.map { case (s, i) =>
      val df =
        if (s.hybrid) IndexPipeline.hybridSearch(spark, storePath, s.query, k)
        else IndexPipeline.search(spark, storePath, s.query, k)
      df.withColumn("stage", lit(i.toLong + 1))
    }
    val w = Window.partitionBy("id").orderBy(desc("score"), col("stage"))
    perStage.reduce(_ unionByName _)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  def runGoal(spark: SparkSession, storePath: String, goal: String,
      k: Int = 10): DataFrame =
    run(spark, storePath, planStages(goal), k)
}
