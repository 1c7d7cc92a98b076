package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** Plan-shape locks for the join headliners: these assert the physical
  * strategy we designed for, so a regression (lost broadcast hint, a
  * non-equi join degenerating to a nested loop) fails the suite even
  * though results stay correct.
  */
class JoinPlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5 joins all dimensions by broadcast — one fact-side shuffle, no SMJ on dims") {
    val plan = planOf(Analytics.q5LocalSupplier(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.supplier(spark, sfDir)))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q3 pushes its filters into the scans") {
    val plan = planOf(Analytics.q3Shipping(spark,
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir))).replaceAll("\\s", "")
    assert(plan.contains("PushedFilters:[IsNotNull(c_mktsegment),EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan.take(1200))
  }

  test("bucketized range join never degenerates to a nested-loop join") {
    val plan = planOf(Analytics.rangeJoinActivity(Tables.events(spark, sfDir)))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("contamination broadcasts the benchmark shingle set — corpus never self-joins") {
    val plan = planOf(graft.ops.Corpus.contamination(Tables.documents(spark, sfDir)))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("LSH candidate joins carry no vector/shingle payload through the pair dedup") {
    // the exchange feeding the candidate-pair dedup must move only ids +
    // bucket keys; the vectors re-join after
    // AQE off for this plan only: AdaptiveSparkPlanExec exposes no
    // children to collect(), and sparkPlan predates exchange insertion
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges =
      try {
        val df = graft.ops.Similarity.embeddingNearDupsLsh(Tables.embeddings(spark, sfDir))
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // The locked invariant is the CANDIDATE-DEDUP shuffle: its output is
    // exactly (a_id, b_id) and must carry no payload — candidate volume
    // is the collision count, potentially ≫ output, so a payload there
    // multiplies the worst-case shuffle. The VERIFY joins after the
    // dedup are hinted shuffle-hash (r10: the unhinted planner picked a
    // payload-sorting SMJ at sf1 — ~100 GB of spill) and legitimately
    // move one vector copy per SURVIVING candidate — the standard LSH
    // cost model; AQE converts them to broadcast when the corpus is
    // small. With AQE off here, those exchanges are visible and exempt.
    val pairDedupExchanges = exchanges.filter { e =>
      e.output.map(_.name).toSet == Set("a_id", "b_id")
    }
    assert(pairDedupExchanges.nonEmpty,
      exchanges.map(e => e.output.map(a => s"${a.name}:${a.dataType.typeName}").mkString("[", ",", "]")).mkString(" | "))
    pairDedupExchanges.foreach { e =>
      val types = e.output.map(_.dataType.typeName)
      assert(!types.exists(_.startsWith("array")),
        s"array payload rides the candidate shuffle: ${e.output}")
    }
  }

  test("q7 broadcasts both nation-filtered dims; facts meet in one co-shuffle") {
    // AQE off: count ShuffleExchangeExec nodes directly (see LSH test)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q7Volume(Tables.nation(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
        Tables.lineitem(spark, sfDir), Tables.supplier(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800))
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s.take(800))
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // lineitem + orders for their co-shuffle, plus the tiny grouped
      // frame's agg exchange — nothing else may shuffle
      assert(shuffles.length <= 3, s"${shuffles.length} shuffles\n" + s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q18's only raw-fact shuffle is the big-order join; the final agg reuses it") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q18BigOrders(Tables.customer(spark, sfDir),
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800)) // customer dim
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s.take(800))
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // raw lineitem (join side), the partial-agg (orderkey, qty) pairs,
      // and orders — the 5-key final aggregate must introduce NO fourth
      // exchange (its grouping set contains o_orderkey, which the join
      // output is already partitioned by)
      assert(shuffles.length <= 3, s"${shuffles.length} shuffles\n" + s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q6 pushes all three predicates into the parquet scan — no joins, no grouping shuffle") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q6ForecastRevenue(Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      // the scan must carry the date window, the discount band, and the
      // quantity cap — a scan reading unfiltered lineitem is the bug
      // this query exists to catch. Read the scan node's metadata (the
      // plan's toString truncates long PushedFilters lists).
      val pushed = plan.collectFirst {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.metadata("PushedFilters")
      }.getOrElse(fail("no FileSourceScanExec in plan\n" + plan.toString.take(1200)))
      assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
        pushed.contains("LessThan(l_quantity,24.0)") &&
        pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // only the single-cell final-agg exchange, and it carries partials
      assert(shuffles.length <= 1, s"${shuffles.length} shuffles\n" + plan.toString.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q19 broadcasts part and evaluates the disjunction post-join — one agg exchange only") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q19DisjunctiveRevenue(
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800))
      assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"), s.take(800))
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.length <= 1, s"${shuffles.length} shuffles\n" + s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q8 broadcasts all five dims; lineitem⋈orders is the only fact co-shuffle") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q8MarketShare(Tables.region(spark, sfDir),
        Tables.nation(spark, sfDir), Tables.customer(spark, sfDir),
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
        Tables.supplier(spark, sfDir), Tables.part(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800))
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s.take(800))
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // lineitem + orders co-shuffle, the o_year group-by, and the tiny
      // sorted output — the part/supplier/customer-region sides must not
      // add fact-sized exchanges
      assert(shuffles.length <= 4, s"${shuffles.length} shuffles\n" + s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q2 prunes lineitem through broadcast semi-joins before its offer aggregate") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q2MinCostSupplier(Tables.region(spark, sfDir),
        Tables.nation(spark, sfDir), Tables.supplier(spark, sfDir),
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800))
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s.take(800))
      // every shuffle after the (partkey, suppkey) offer aggregate moves
      // already-aggregated offer rows, never raw lineitem: offer agg,
      // min-per-part agg + its equality re-join, and the output sort
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.length <= 5, s"${shuffles.length} shuffles\n" + s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q16 joins only by broadcast — the count-distinct owns the sole fact shuffle chain") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q16SupplierCnt(Tables.supplier(spark, sfDir),
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800))
      assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"), s.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q21's per-order aggregate reuses the join clustering; top-N never sorts globally") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Analytics.q21WaitingOrders(Tables.supplier(spark, sfDir),
        Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"), s.take(800)) // supplier names
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s.take(800))
      // lineitem + orders co-shuffle (2) and the small per-supplier count
      // (1) — the orderkey aggregate must NOT add a fourth exchange
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.length <= 3, s"${shuffles.length} shuffles\n" + s.take(1500))
      // limit(topN) over the sorted count must ship as TakeOrderedAndProject
      assert(s.contains("TakeOrderedAndProject"), s.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("tfidf keeps the rank-limit pushdown and broadcasts the doc count") {
    val plan = planOf(graft.ops.Corpus.tfidfTopTerms(Tables.documents(spark, sfDir)))
    // WindowGroupLimit = per-partition top-k BEFORE the window exchange;
    // losing it means every (doc,term) row rides the final shuffle
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    // the corpus-count scalar must arrive by broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }
}
