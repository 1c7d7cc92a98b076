package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollapseCodegenStages, FileSourceScanExec, SparkPlan, WholeStageCodegenExec, SortExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan governance audit: the scale checklist this project
  * applies to every operator (filters pushed? columns pruned? shuffles
  * minimal? dims broadcast? nothing degenerated to a nested loop?),
  * extracted from a `DataFrame`'s executed plan as one typed record —
  * so a CI spec, a notebook, or a pre-deploy gate can assert plan
  * shape the same way JoinPlanSpec does, without string-matching plan
  * dumps. At 100 TB the difference between a plan that passes this
  * audit and one that doesn't is the job completing or not; running
  * the audit costs only plan compilation, never an execution.
  *
  * AQE note: audits walk the INITIAL adaptive plan (runtime re-plans
  * shrink, never grow, the shuffle/broadcast counts asserted here).
  */
object PlanAudit {

  /** One audited plan. `scannedColumns` sums each parquet scan's
    * ReadSchema width — the column-pruning check (a 2-column projection
    * reading a 16-column schema is the bug). `pushedFilters` counts
    * data filters that reached a scan. `cartesianOrBnlj` is the
    * degenerate-join alarm.
    */
  final case class Audit(
      scans: Int,
      scannedColumns: Int,
      pushedFilters: Int,
      partitionFilters: Int,
      shuffles: Int,
      broadcasts: Int,
      codegenSpans: Int,
      sorts: Int,
      cartesianOrBnlj: Boolean) {
    def shuffleFree: Boolean = shuffles == 0
  }

  private def walk(plan: SparkPlan): Seq[SparkPlan] =
    plan +: (plan.children ++ plan.subqueries).flatMap {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case p => walk(p)
    }

  def audit(df: DataFrame): Audit = {
    // Under AQE the initial plan has not had CollapseCodegenStages applied
    // (codegen nodes are inserted per query stage at materialization), so
    // count codegen spans on a collapsed copy; all other counts come from
    // the uncollapsed nodes, where scans/exchanges are directly visible.
    val (nodes, codegenNodes) = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        (walk(a.initialPlan), walk(CollapseCodegenStages()(a.initialPlan)))
      case p => (walk(p), walk(p))
    }
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    Audit(
      scans = scans.length,
      scannedColumns = scans.map(_.requiredSchema.length).sum,
      pushedFilters = scans.map(_.dataFilters.length).sum,
      partitionFilters = scans.map(_.partitionFilters.length).sum,
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      codegenSpans = codegenNodes.count(_.isInstanceOf[WholeStageCodegenExec]),
      sorts = nodes.count(_.isInstanceOf[SortExec]),
      cartesianOrBnlj = nodes.exists {
        case _: CartesianProductExec => true
        // A BNLJ whose build side is a grouping-free aggregate joins
        // against exactly ONE row (a broadcast scalar — totals, corpus
        // size): that is the standard way to splice a global statistic
        // into every row and is NOT a degenerate join. Only flag BNLJs
        // whose build side can exceed one row.
        case b: BroadcastNestedLoopJoinExec =>
          import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case _ => b.right
          }
          !walk(build).exists {
            case a: BaseAggregateExec => a.groupingExpressions.isEmpty
            case _ => false
          }
        case _ => false
      })
  }

  /** Audit as a one-row DataFrame — composable into a monitoring table
    * (one row per deployed query per release, diffed across releases to
    * catch plan regressions the way BENCH catches time regressions).
    */
  def auditRow(name: String, df: DataFrame): DataFrame = {
    val a = audit(df)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((name, a.scans, a.scannedColumns, a.pushedFilters, a.partitionFilters,
      a.shuffles, a.broadcasts, a.codegenSpans, a.sorts, a.cartesianOrBnlj))
      .toDF("query", "scans", "scanned_columns", "pushed_filters",
        "partition_filters", "shuffles", "broadcasts", "codegen_spans",
        "sorts", "cartesian_or_bnlj")
  }

  /** The governance table for a set of named queries — one audited row
    * each. Costs plan compilation only (nothing executes), so a fleet
    * of representative queries audits in seconds regardless of data
    * size: the pre-deploy gate a 100 TB operator runs before letting a
    * changed query near the cluster.
    */
  def reportFor(frames: Seq[(String, DataFrame)]): DataFrame = {
    // Compile the audited plans CONCURRENTLY (guide §2.6 — overlap
    // independent work): each audit is pure driver-side Catalyst
    // compilation of an independent Dataset, serialized only by our own
    // loop before this change. Catalyst planning is designed for
    // concurrent sessions-threads (stateless rule batches, per-query
    // trackers), so a small pool cuts the fleet audit's wall clock by
    // the pool width without touching what any audit computes. The
    // audits stay plan-only: no job starts on any of these threads.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, frames.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      Await.result(
          Future.sequence(frames.map { case (n, f) => Future(auditRow(n, f)) }),
          Duration.Inf)
        .reduce(_.unionAll(_))
        .orderBy(org.apache.spark.sql.functions.col("query"))
    } finally pool.shutdown()
  }
}
