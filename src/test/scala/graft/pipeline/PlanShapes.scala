package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Shared physical-plan probes for the pipeline shape audits. */
object PlanShapes {

  /** (inMemoryScans, fileScans) at the CONSUMING level of the executed
    * plan — cached subplans are NOT descended into, because the
    * per-query-union defect class (VERDICT r16 #1) manifests as |Q|
    * sibling scans of the same cached/stored relation under a Union;
    * one consuming scan per source is the batched shape. Run after an
    * action so AQE has finalized. */
  def topLevelScans(df: DataFrame): (Int, Int) = {
    def count(p: SparkPlan): (Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case q: QueryStageExec => count(q.plan)
      case _: InMemoryTableScanExec => (1, 0)
      case _: FileSourceScanExec => (0, 1)
      case _ =>
        p.children.map(count).foldLeft((0, 0)) {
          case ((a, b), (c, d)) => (a + c, b + d)
        }
    }
    count(df.queryExecution.executedPlan)
  }

  /** Node names at the CONSUMING level (cached subplans excluded — the
    * per-subspace encode union INSIDE the codes cache is legitimate and
    * m-bounded; a Union ABOVE the cache is the per-query defect, and
    * join-type assertions must not trip on how the cache was BUILT). */
  def topLevelNodeNames(df: DataFrame): Seq[String] = {
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: InMemoryTableScanExec => Seq("InMemoryTableScan")
      case _ => p.nodeName +: p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
