package graft

import graft.ops.Analytics
import graft.plans.PlanAudit

/** The audit utility must report the same plan facts JoinPlanSpec
  * asserts by hand — including through AQE's adaptive wrapper, which is
  * exactly the case where naive plan.collect silently sees nothing.
  */
class PlanAuditSpec extends SparkSpec {

  test("q6 audits as a pruned, pushed-down, join-free scan") {
    val a = PlanAudit.audit(Analytics.q6ForecastRevenue(Tables.lineitem(spark, sfDir)))
    assert(a.scans === 1, a.toString)
    // shipdate, discount, quantity, extendedprice — and nothing else of
    // lineitem's 11 columns
    assert(a.scannedColumns === 4, a.toString)
    assert(a.pushedFilters >= 3, a.toString)
    assert(a.shuffles <= 1, a.toString)
    assert(!a.cartesianOrBnlj, a.toString)
    assert(a.codegenSpans >= 1, a.toString)
  }

  test("q5 audits its dimension broadcasts through the adaptive plan") {
    val a = PlanAudit.audit(Analytics.q5LocalSupplier(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.supplier(spark, sfDir)))
    assert(a.broadcasts >= 4, a.toString)
    assert(!a.cartesianOrBnlj, a.toString)
  }

  test("badword filter audits shuffle-free") {
    val a = PlanAudit.audit(
      graft.ops.TrainingPrep.badwordFilter(Tables.documents(spark, sfDir)))
    assert(a.shuffleFree, a.toString)
    assert(!a.cartesianOrBnlj, a.toString)
  }

  test("fleet invariant: no lazily-built gated query degenerates to cartesian/BNLJ") {
    // every driver-gated query whose frame CONSTRUCTION is lazy (the
    // ANN/bloom/cluster families run driver actions at build time and
    // are audited by their own specs). Audit cost = plan compilation.
    val eager = Set(
      "split_leakage_bloom", "dedup_clusters", "corpus_curation_cc",
      "corpus_curation_best", "curation_report", "dedup_incremental",
      "knn_ivf", "knn_ivf_sq8", "knn_ivf_pq", "knn_lsh", "knn_bruteforce",
      "ann_recall_report", "ivf_cell_stats", "stream_hourly_by_type",
      "plan_audit_report", "generate_events", "generate_events_status",
      // cache-hit demonstration: construction populates + serves the
      // result cache (eager by contract); the underlying raw_station
      // plan is already in the fleet
      "raw_station_cached",
      // declared by-design all-pairs oracle baseline (SURVEY §2D): its
      // exact self-join is the one intentional non-scale plan; the
      // banded twin (dedup_embedding_lsh) is what must stay clean
      "dedup_embedding")
    val names = SparkEntry.queries.keys.filterNot(eager).toSeq.sorted
    val alarms = names.flatMap { n =>
      val a = PlanAudit.audit(SparkEntry.queries(n)(spark, sfDir))
      if (a.cartesianOrBnlj) Some(n) else None
    }
    assert(alarms.isEmpty, s"degenerate joins in: ${alarms.mkString(", ")}")
    assert(names.size > 80, s"fleet shrank to ${names.size} — update the audit list")
  }

  test("reportFor unions one audited row per named query") {
    val rows = PlanAudit.reportFor(Seq(
      "q6" -> Analytics.q6ForecastRevenue(Tables.lineitem(spark, sfDir)),
      "badword" -> graft.ops.TrainingPrep.badwordFilter(Tables.documents(spark, sfDir))))
      .collect()
    assert(rows.map(_.getAs[String]("query")).toSeq === Seq("badword", "q6"))
    assert(rows.forall(!_.getAs[Boolean]("cartesian_or_bnlj")))
  }

  test("auditRow emits the monitoring-table shape") {
    val row = PlanAudit.auditRow("q6",
      Analytics.q6ForecastRevenue(Tables.lineitem(spark, sfDir))).collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("query") === "q6")
    assert(row.head.getAs[Int]("scans") === 1)
  }
}
