package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General analytics over the TPC-H-ish star schema — the engine-
  * completeness half of the inventory (SURVEY.md §2C) and the bench
  * headliners.
  *
  * Numeric-determinism policy: money sums are computed over
  * DECIMAL-cast summands (exact, order-independent) and then cast to
  * DOUBLE at the output boundary — Spark widens sum(DECIMAL(18,x)) to
  * DECIMAL(28,x) while DuckDB widens to DECIMAL(38,x), so emitting the
  * decimal itself hash-mismatches the oracle on representation even
  * when values are identical. Casting the same exact decimal to an
  * IEEE double is deterministic in both engines. Averages are rounded
  * at the output boundary.
  *
  * Scale notes per query are inline; the recurring rules:
  *  - dimension tables (region/nation/supplier/part/customer) are
  *    explicitly broadcast — no shuffle of the fact table for them;
  *  - lineitem⋈orders is the only genuine big shuffle; AQE re-plans it
  *    at runtime;
  *  - every filter is a plain column predicate so Catalyst pushes it
  *    into the parquet scan.
  */
object Analytics {

  private def dec(c: String, scale: Int = 2) = col(c).cast(DecimalType(18, scale))

  /** TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.
    * Whole-stage-codegen'd scan→partial-agg→final-agg; one shuffle over
    * 4 grouping cells.
    */
  def q1PricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= tsLit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: customer(filtered, broadcast) ⋈ orders ⋈ lineitem,
    * revenue top-10. customer is a dim → broadcast; orders⋈lineitem
    * co-shuffles on orderkey. The final top-k is a TakeOrderedAndProject
    * (no global sort materialization).
    */
  def q3Shipping(spark: SparkSession, customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame): DataFrame = {
    val cut = tsLit("1998-03-15 00:00:00")
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders.filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join; every dimension side broadcast, so the
    * fact table is shuffled exactly once (for the orders join).
    */
  def q5LocalSupplier(region: DataFrame, nation: DataFrame, customer: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      supplier: DataFrame): DataFrame = {
    val dims = broadcast(
      region.filter(col("r_name") === "ASIA")
        .join(nation, col("r_regionkey") === col("n_regionkey")))
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(orders.filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsLit("1998-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7 shape (volume shipping): revenue flowing between a nation
    * PAIR by ship year. Both nation sides and supplier/customer are
    * dims → broadcast, and the nation-name filter is pushed INTO the
    * broadcast frames so the fact tables only fan out to the two
    * relevant nations; lineitem⋈orders co-shuffles on orderkey — the
    * single big-table shuffle in the plan.
    */
  def q7Volume(nation: DataFrame, customer: DataFrame, orders: DataFrame,
               lineitem: DataFrame, supplier: DataFrame,
               nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val suppN = broadcast(supplier
      .join(nation.filter(col("n_name").isin(pair: _*)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custN = broadcast(customer
      .join(nation.filter(col("n_name").isin(pair: _*)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1998-01-01 00:00:00"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10 shape (returned-item revenue): top-20 customers by
    * revenue lost to returns in a quarter. Orders carries the date
    * filter (partition-prunable at scale), lineitem the R-flag filter;
    * customer/nation broadcast; the final top-k is a
    * TakeOrderedAndProject, never a global sort.
    */
  def q10Returns(nation: DataFrame, customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsLit("1996-04-01 00:00:00"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q4 shape (order-priority checking): orders in a quarter with
    * at least one late lineitem (shipped > 90 days after the order
    * date), counted by priority. The EXISTS becomes a LEFT SEMI join
    * whose condition spans both sides (equi on orderkey + the lateness
    * inequality) — Spark plans the equi part as the join key and the
    * inequality as a join filter, so the facts still meet in one hash
    * co-shuffle, never a nested loop. Output is ≤ |priorities| rows.
    */
  def q4Priority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsLit("1996-04-01 00:00:00"))
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q14 shape (promotion effect): promo revenue share of one
    * ship month. One broadcast dim join (part) over the date-pruned
    * lineitem slice; both revenue sums are exact decimals cast to
    * double at the boundary, and the percentage divides the DOUBLES so
    * both engines run the same IEEE division.
    */
  def q14Promo(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))
    val zero = lit(0).cast(DecimalType(18, 4))
    lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1996-02-01 00:00:00"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(zero))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_revenue_pct",
        round(col("promo_revenue") * 100.0 / col("total_revenue"), 4))
      .select(col("promo_revenue_pct"), col("promo_revenue"), col("total_revenue"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total
    * quantity clears a threshold, with their customers. The `big`
    * filter is an aggregate-then-join on l_orderkey: its shuffle moves
    * only map-side partial (orderkey, qty) pairs, so raw lineitem rows
    * cross the wire exactly once (for the join), and everything
    * downstream — the orders join and even the 5-key final aggregate,
    * whose grouping set contains o_orderkey — reuses that l_orderkey
    * partitioning with no further fact shuffle (plan-locked in
    * JoinPlanSpec). Customer broadcasts; final top-k is a
    * TakeOrderedAndProject.
    */
  def q18BigOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                   minQty: Double = 300.0): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_quantity")).as("__q"))
      .filter(col("__q") > minQty)
      .select(col("l_orderkey"))
    lineitem
      .join(big, Seq("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sum(dec("l_quantity")).cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure scan-
    * aggregate — three pushable predicates, zero joins, zero grouping
    * keys. All three filters reach the parquet scan as PushedFilters
    * (shipdate min/max prune row groups; discount/quantity prune
    * pages), so the whole query is one WholeStageCodegen span ending
    * in a single-cell partial+final agg. The canonical "is pushdown
    * working" probe at any scale.
    */
  def q6ForecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(sum((col("l_extendedprice") * col("l_discount"))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * part-type's revenue inside one region, by order year. All five
    * dims broadcast (part filtered to one type first — the most
    * selective, so the fact stream shrinks at the earliest join);
    * lineitem⋈orders is again the only big shuffle. The share division
    * happens on exact decimal sums at the output boundary.
    */
  def q8MarketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                    part: DataFrame, targetNation: String = "NATION_3",
                    targetRegion: String = "EUROPE",
                    partType: String = "ECONOMY"): DataFrame = {
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))
    val zero = lit(0).cast(DecimalType(18, 4))
    val custRegion = broadcast(customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === targetRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey")))
    val suppNation = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    lineitem
      .join(broadcast(part.filter(col("p_type") === partType)),
        col("l_partkey") === col("p_partkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(orders.filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
          col("o_orderdate") < tsLit("1998-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("nation") === targetNation, vol).otherwise(zero)).as("__n"),
        sum(vol).as("__d"))
      .select(col("o_year"),
        round(col("__n").cast("double") / col("__d").cast("double"), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (product-type profit), adapted: the testdata schema
    * has no partsupp table, so supply cost is proxied as
    * 0.6 × p_retailprice × quantity (documented adaptation; the plan
    * shape — 4 broadcast dims, name-substring part filter, profit by
    * supplier nation × order year — is Q9's). Profit summands are
    * exact decimals; the year comes from orders, so lineitem⋈orders
    * stays the one co-partitioned big shuffle.
    */
  def q9ProfitProxy(nation: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    supplier: DataFrame, part: DataFrame,
                    nameSubstr: String = "gear"): DataFrame = {
    val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4)) -
      (lit(0.6) * col("p_retailprice") * col("l_quantity")).cast(DecimalType(18, 4))
    val suppNation = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameSubstr))
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join
    * with the filter in the JOIN CONDITION (not a WHERE — customers
    * with zero qualifying orders must survive as c_count=0), then a
    * distribution over the per-customer counts. Two aggregations: the
    * first shuffles (custkey, partial count) pairs, the second runs
    * over ≤ max-orders-per-customer cells. The reference's priority
    * filter replaces Q13's comment NOT LIKE (no comment column).
    */
  def q13OrderDistribution(customer: DataFrame, orders: DataFrame,
                           excludePriority: String = "4-NOT SPECIFIED"): DataFrame =
    customer
      .join(orders.filter(col("o_orderpriority") =!= excludePriority),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    * keep the max. The revenue frame is supplier-cardinality-sized, so
    * its scalar max broadcasts back as a one-row crossJoin and the
    * equality filter is exact decimal = decimal (no float ties). At
    * scale the lineitem aggregation is the only real work; everything
    * after is dim-sized.
    */
  def q15TopSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).as("__rev"))
    val top = broadcast(revenue.agg(max(col("__rev")).as("__max")))
    revenue
      .crossJoin(top)
      .filter(col("__rev") === col("__max"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue), container filter
    * adapted to p_type (no p_container column): lineitems of one
    * brand+type whose quantity is below 20% of that part's corpus-wide
    * average. The correlated subquery becomes a per-part aggregate
    * joined back — the per-part avg is exact (integer-valued
    * quantities sum exactly in double), so the threshold compare is
    * engine-portable. Both sides of the self-join aggregate before
    * shuffling; the filtered part dim broadcasts into each.
    */
  def q17SmallQtyRevenue(part: DataFrame, lineitem: DataFrame,
                         brand: String = "Brand#23",
                         ptype: String = "SMALL"): DataFrame = {
    val target = broadcast(part
      .filter(col("p_brand") === brand && col("p_type") === ptype)
      .select(col("p_partkey")))
    val perPartAvg = lineitem
      .join(target, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(avg(col("l_quantity")).as("__avg"))
    lineitem
      .join(target, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(perPartAvg, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("__avg"))
      .agg(round(sum(dec("l_extendedprice")).cast("double") / 7.0, 4).as("avg_yearly"))
  }

  /** TPC-H Q19 shape (disjunctive discounted revenue): three OR'd
    * brand/size/quantity branches evaluated in one pass over
    * lineitem⋈part (shipmode/container predicates adapted to the
    * available columns). Catalyst pushes the common `p_partkey` join
    * and evaluates the disjunction post-join in codegen; the part dim
    * broadcasts, so the whole query is one fact scan with zero
    * shuffles beyond the single-cell agg.
    */
  def q19DisjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    def branch(brand: String, maxSize: Int, qLo: Double, qHi: Double) =
      col("p_brand") === brand && col("p_size").between(1, maxSize) &&
        col("l_quantity").between(qLo, qHi)
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 15, 1.0, 11.0) ||
        branch("Brand#23", 25, 10.0, 20.0) ||
        branch("Brand#34", 35, 20.0, 30.0))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
  }

  /** TPC-H Q20 shape (part promotion), adapted for the missing
    * partsupp table: suppliers in one nation who DOMINATED the 1996
    * shipments of some small-named part (their shipped quantity more
    * than half the part's total — `2·sq > tq` compares exact decimals,
    * no float division). Same nested-aggregate + semi-join skeleton as
    * Q20: both aggregates pre-shrink before the (partkey) equi-join,
    * the qualifying-supplier set is dim-sized, and the nation filter
    * broadcasts.
    */
  def q20PartPromotion(nation: DataFrame, supplier: DataFrame, part: DataFrame,
                       lineitem: DataFrame, targetNation: String = "NATION_5",
                       namePrefix: String = "small"): DataFrame = {
    val smallParts = broadcast(part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey")))
    val shipped = lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1997-01-01 00:00:00"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val bySupp = shipped.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec("l_quantity")).as("__sq"))
    val byPart = shipped.groupBy(col("l_partkey"))
      .agg(sum(dec("l_quantity")).as("__tq"))
    val dominant = bySupp
      .join(byPart, Seq("l_partkey"))
      .filter(col("__sq") * 2 > col("__tq"))
      .select(col("l_suppkey")).distinct()
    supplier
      .join(broadcast(nation.filter(col("n_name") === targetNation)),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22 shape (global sales opportunity), phone prefix adapted
    * to a nation-key set and "never ordered" to "no order since 1999"
    * (every customer has some order at this density): above-average-
    * balance customers in target nations with no recent orders. The
    * positive-balance average arrives as an exact (sum, count) pair
    * via a one-row broadcast crossJoin, and the threshold is the
    * cross-multiplied `bal·n > s` — decimal-exact, no division, no
    * float ties. The recent-orders anti-join ships only o_custkey.
    */
  def q22GlobalSales(customer: DataFrame, orders: DataFrame,
                     nationKeys: Seq[Int] = Seq(1, 3, 5, 7, 9, 11, 13),
                     sinceTs: String = "1999-01-01 00:00:00"): DataFrame = {
    val inScope = customer.filter(col("c_nationkey").isin(nationKeys: _*))
    val posAvg = broadcast(inScope
      .filter(col("c_acctbal") > 0.0)
      .agg(sum(dec("c_acctbal")).as("__s"), count(lit(1)).as("__n")))
    val recent = orders
      .filter(col("o_orderdate") >= tsLit(sinceTs))
      .select(col("o_custkey"))
    inScope
      .crossJoin(posAvg)
      .filter(dec("c_acctbal") * col("__n") > col("__s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec("c_acctbal")).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q2 shape (minimum-cost supplier): for each part of one type
    * below a size cap, the region's suppliers offering it at the lowest
    * observed price. The schema has no partsupp table, so the
    * part-supplier offer relation is derived from lineitem — each
    * (partkey, suppkey) pair's cost is its MIN extended price, an exact
    * decimal, and the correlated `= (SELECT min …)` of the original
    * becomes a min-per-part aggregate joined back on decimal equality.
    *
    * Scale: the filtered part list and the region's supplier list are
    * both dims → broadcast semi-joins prune lineitem before its one
    * (partkey, suppkey) shuffle; the min-per-part frame and the
    * re-join both operate on the already-aggregated offers (≤ |part| ×
    * suppliers-per-part rows), partitioned on l_partkey both sides.
    */
  def q2MinCostSupplier(region: DataFrame, nation: DataFrame,
                        supplier: DataFrame, part: DataFrame,
                        lineitem: DataFrame, regionName: String = "EUROPE",
                        pType: String = "SMALL", sizeMax: Int = 15): DataFrame = {
    val regionNations = nation
      .join(region.filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val regionSupp = broadcast(supplier
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val partsF = broadcast(part
      .filter(col("p_type") === pType && col("p_size") <= sizeMax)
      .select(col("p_partkey"), col("p_name"), col("p_brand")))
    val offers = lineitem
      .join(partsF.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(regionSupp.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec("l_extendedprice")).as("__cost"))
    val minPerPart = offers.groupBy(col("l_partkey"))
      .agg(min(col("__cost")).as("__min_cost"))
    offers
      .join(minPerPart, Seq("l_partkey"))
      .filter(col("__cost") === col("__min_cost"))
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .join(partsF, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("s_suppkey"), col("s_name"), col("n_name"), col("s_acctbal"),
        col("__cost").cast("double").as("supply_cost"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q11 shape (important stock): parts whose shipped value from
    * one nation's suppliers exceeds `meanMult`× the nation's mean
    * per-part value. partsupp's supplycost×availqty becomes the exact
    * decimal sum of extended prices. The original's fixed
    * `FRACTION/SF` threshold is re-expressed scale-free: the (total,
    * part-count) pair arrives as a one-row broadcast crossJoin and the
    * HAVING threshold is cross-multiplied (`value·n > total·meanMult`)
    * — decimal-exact, no division, and row yield tracks the value
    * skew rather than collapsing to zero as |part| grows.
    *
    * Scale: the nation's supplier list is broadcast; lineitem is
    * semi-pruned before its single l_partkey shuffle; everything after
    * the aggregate is |part|-sized.
    */
  def q11ImportantStock(nation: DataFrame, supplier: DataFrame,
                        lineitem: DataFrame, targetNation: String = "NATION_3",
                        meanMult: Int = 2): DataFrame = {
    val nationSupp = broadcast(supplier
      .join(broadcast(nation.filter(col("n_name") === targetNation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val vals = lineitem
      .join(nationSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(dec("l_extendedprice")).as("__value"))
    val total = broadcast(vals.agg(sum(col("__value")).as("__total"),
      count(lit(1)).as("__n")))
    vals.crossJoin(total)
      .filter(col("__value") * col("__n") > col("__total") * meanMult)
      .select(col("l_partkey"), col("__value").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape (shipping modes & priority): the schema has no
    * l_shipmode, so the mode classes become ship-lag classes — DELAYED
    * (shipped > `lateDays` after the order date) vs PROMPT — and the
    * CASE-sum splits each class's order lines into critical
    * (1-URGENT/2-HIGH) vs other priorities, over one ship-year slice.
    *
    * Scale: date filter pushed to the lineitem scan; one orderkey
    * shuffle for the orders join (orders projected to three columns);
    * final aggregate has 2 groups.
    */
  def q12ShipLag(orders: DataFrame, lineitem: DataFrame,
                 fromTs: String = "1996-01-01 00:00:00",
                 toTs: String = "1997-01-01 00:00:00",
                 lateDays: Int = 30): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= tsLit(fromTs) && col("l_shipdate") < tsLit(toTs))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
          lit("DELAYED")).otherwise(lit("PROMPT")))
      .groupBy(col("ship_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))

  /** TPC-H Q16 shape (part/supplier relationship): distinct-supplier
    * counts per (brand, type, size) for parts outside one brand and one
    * type, sizes in a fixed set, excluding flagged suppliers — the
    * original's "complaints" LIKE-subquery becomes the negative-balance
    * suppliers. The part-supplier relation derives from lineitem.
    *
    * Scale: both exclusion lists are broadcast (anti/semi); lineitem
    * projects to (partkey, suppkey) before its only shuffle, and the
    * distinct + count-distinct share the (brand,type,size) clustering.
    */
  def q16SupplierCnt(supplier: DataFrame, part: DataFrame,
                     lineitem: DataFrame, excludeBrand: String = "Brand#1",
                     excludeType: String = "PROMO",
                     sizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)): DataFrame = {
    val partsF = broadcast(part
      .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
    val flagged = broadcast(supplier.filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey")))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(partsF, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): suppliers who
    * were the ONLY late supplier on a finalized multi-supplier order.
    * The schema has no commit/receipt dates, so "late" is shipping more
    * than `lateDays` past the order date. The original's
    * EXISTS/NOT-EXISTS pair is re-expressed as one per-order aggregate:
    * when the distinct-late-supplier count is exactly 1, that sole
    * supplier IS `max(late-supplier)`, so the blame assignment falls out
    * of the same aggregate — one scan of the joined frame instead of
    * three correlated passes.
    *
    * Scale: one orderkey co-shuffle (lineitem ⋈ filtered orders); the
    * distinct-supplier counts come from a TWO-LEVEL aggregate —
    * (orderkey, suppkey) supplier rows first, then per-order counts —
    * instead of countDistinct, so no Expand multiplies the join output
    * and BOTH levels reuse the join's orderkey clustering (no
    * re-shuffle); the per-supplier count aggregates a ≤|orders| frame
    * and the name join broadcasts supplier. The top-N ships as
    * TakeOrderedAndProject.
    */
  def q21WaitingOrders(supplier: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, lateDays: Int = 90,
                       topN: Int = 20): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("__late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("__late")).as("__late"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__n_supp"),
        sum(when(col("__late"), 1L).otherwise(0L)).as("__n_late"),
        max(when(col("__late"), col("l_suppkey"))).as("__late_supp"))
      .filter(col("__n_supp") >= 2 && col("__n_late") === 1)
      .groupBy(col("__late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("__late_supp") === col("s_suppkey"))
      // s_suppkey in the output keys the result on the supplier's
      // identity, not its (only incidentally unique) name
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(topN)

  /** Top-k per group: 3 priciest parts per brand. Keyed window → one
    * shuffle; at scale, a pre-aggregation per partition (AQE) bounds the
    * sort. Deterministic tie-break on p_partkey.
    */
  def topKPerGroup(part: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("p_brand", "rnk", "p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** topKPerGroup via the custom whole-operator plan
    * (graft.plans.TopKPerKey): identical semantics and oracle, but a
    * bounded per-key heap instead of the window's full partition sort —
    * O(n log k) and fixed memory per key at 100 TB.
    */
  def topKPerGroupFast(part: DataFrame, k: Int = 3): DataFrame =
    graft.plans.TopK.perKey(part,
      Seq(col("p_brand")), Seq(col("p_retailprice").desc, col("p_partkey").asc), k)
      .select("p_brand", "rnk", "p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_brand"), col("rnk"))

  /** Gap-based sessionization of the event stream: a new session starts
    * after >30 min of inactivity per user. Two stacked windows over the
    * SAME (user_id × ts) partitioning — Catalyst reuses one shuffle+sort
    * for both. The standard lag→flag→cumsum formulation.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col("ts").cast("timestamp").cast("double") -
            col("__prev_ts").cast("timestamp").cast("double") > gapSec.toDouble, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Native-operator form of [[sessionize]]: Spark's `session_window`
    * keyed aggregation instead of the lag+cumsum window composition —
    * one shuffle, merge-on-overlap state logic inside the operator, and
    * the SAME streaming-capable shape Structured Streaming uses for
    * session windows.
    *
    * Boundary semantics: session_window splits when diff >= gap while
    * the lag formulation (and the SQL oracle) splits when diff > gap;
    * widening the gap by 1 microsecond makes the two identical at the
    * µs timestamp resolution, so both forms share one oracle.
    */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gap = s"$gapMinutes minutes 1 microsecond"
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
      .withColumn("session_id", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start"))).cast("long"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Distribution profile per event type: exact interpolated percentiles
    * (Spark `percentile` ≡ DuckDB `quantile_cont`) + exact distincts.
    * The approximate twin below is the 100 TB form.
    */
  def eventsProfile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      round(percentile(col("value"), lit(0.5)), 4).as("p50"),
      round(percentile(col("value"), lit(0.95)), 4).as("p95"),
      round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"))

  /** Sketch-based profile — HLL distinct + t-digest-style percentile
    * approximations: constant memory per group at any scale (rows-only
    * check; sketches are engine-specific).
    */
  def eventsProfileApprox(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      approx_percentile(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
      approx_percentile(col("value"), lit(0.95), lit(1000)).as("approx_p95"))
      .orderBy(col("event_type"))

  /** Pre-aggregated MERGEABLE distinct-count rollup — the pattern that
    * makes "distinct users over any horizon" an O(sketches) question
    * instead of an O(events) rescan: per (event_type, day), users fold
    * into a DataSketches HLL sketch ONCE (the stored daily rollup row a
    * 100 TB deployment materializes continuously); any coarser horizon
    * (here ISO weeks) then merges the stored sketches register-wise —
    * never touching events again — and estimates. Same-lgK HLL union is
    * register-lossless, so the merged estimate EQUALS the estimate of a
    * direct sketch over the union (spec-asserted as exact equality),
    * and sketch building has no RNG — the rollup is deterministic under
    * repartition. Rows-only in the gate (sketch internals are
    * engine-specific); accuracy floor (±5% of exact) is spec-gated.
    */
  def hllRollup(events: DataFrame, lgK: Int = 12): DataFrame = {
    val daily = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sketch"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(col("event_type"),
        date_trunc("week", col("day")).cast("date").as("week_start"))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
          .as("approx_users"),
        sum(col("n_events")).as("n_events"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"), col("week_start"))
  }

  /** Range (interval) join, bucketized: aggregate events falling inside
    * the top-20 "hot" activity windows ([hour−30 min, hour+90 min),
    * overlapping and unaligned). A naive interval join is a
    * BroadcastNestedLoopJoin — O(|events|·|windows|) pair evaluations.
    * The scale shape used here: explode each window to the hour buckets
    * it covers (≤3), bucket each event to its hour, EQUI-join on the
    * bucket, then post-filter the exact range — pair work proportional
    * to actual overlap. An event's single bucket meets each window at
    * most once, so no dedup is needed.
    */
  def rangeJoinActivity(events: DataFrame, topWindows: Int = 20): DataFrame = {
    val hours = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val hot = hours
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n").desc, col("h"))))
      .filter(col("rn") <= topWindows)
      .select(
        (col("h") - expr("INTERVAL 30 MINUTE")).as("w_start"),
        (col("h") + expr("INTERVAL 90 MINUTE")).as("w_end"))
    val winBuckets = hot.withColumn("bucket",
      explode(sequence(date_trunc("hour", col("w_start")), col("w_end"),
        expr("INTERVAL 1 HOUR"))))
    val evBuckets = events.withColumn("bucket", date_trunc("hour", col("ts")))
    winBuckets.join(evBuckets, Seq("bucket"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(col("w_start"), col("w_end"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("w_start"))
  }

  /** CUBE over (event_type, user bucket): all 2ⁿ grouping combinations
    * in one Expand+Aggregate pass (one shuffle), like rollup but with
    * the cross-marginals.
    */
  def cubeEvents(events: DataFrame): DataFrame =
    events
      .withColumn("user_bucket", pmod(col("user_id"), lit(10L)))
      .cube(col("event_type"), col("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("user_bucket").asc_nulls_first)

  /** Pivot: event-type counts as columns per user bucket. Spark's
    * `pivot` with explicit values compiles to a single conditional
    * aggregation (one shuffle, no per-value passes); absent cells are
    * 0-filled to match the SQL FILTER formulation.
    */
  def pivotEvents(events: DataFrame): DataFrame =
    events
      .withColumn("user_bucket", pmod(col("user_id"), lit(10L)))
      .groupBy(col("user_bucket"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_bucket"))

  /** Multi-level ROLLUP over (event_type, user bucket): partial-agg
    * friendly; Spark expands rollup into a single Expand+Aggregate (one
    * shuffle), not one pass per level.
    */
  def rollupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("user_bucket", pmod(col("user_id"), lit(10L)))
      .rollup(col("event_type"), col("user_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("user_bucket").asc_nulls_first)

  /** Statistical anomaly flagging: per-type mean/stddev, then each event's
    * z-score; events with |z| ≥ threshold surface (the monitoring query a
    * weather system runs over sensor readings — the reference's range
    * validation (consumer/main.py:142-161) is the degenerate fixed-bounds
    * form of this).
    *
    * Scale: the stats side is a tiny per-type aggregate (map-side partial
    * agg, broadcast back) — the fact table streams through once with no
    * wide shuffle. The z-score is rounded at the boundary and the
    * threshold compares the ROUNDED value so the cut is engine-stable.
    */
  def anomalyZScore(events: DataFrame, threshold: Double = 2.5): DataFrame = {
    val typed = events.filter(col("event_type").isNotNull && col("value").isNotNull)
    val stats = typed
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("__mean"), stddev_samp(col("value")).as("__std"))
    typed
      // sd=0 groups (all-identical values) have no meaningful z-score;
      // filtering them explicitly also keeps engines agreeing — Spark's
      // Divide yields NULL on /0 while IEEE-float engines yield NaN/inf,
      // and NaN ordering differs across engines.
      .join(broadcast(stats.filter(col("__std") > 0)), Seq("event_type"))
      .withColumn("z", round((col("value") - col("__mean")) / col("__std"), 4))
      .filter(abs(col("z")) >= threshold)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("z"))
      .orderBy(col("event_id"))
  }

  /** Equi-width value histogram: one extremes aggregation (tiny,
    * broadcast back as a scalar pair), then one pass assigning each row
    * its bin and one id-free keyed count — the distribution view behind
    * any monitoring dashboard. All bin math is pure IEEE-double
    * arithmetic on (value, lo, hi) so the oracle computes bit-identical
    * bins; the top edge clamps into the last bin. Two narrow shuffles
    * (`nBins` keys) at any scale.
    */
  def valueHistogram(events: DataFrame, nBins: Int = 20): DataFrame = {
    val vals = events.filter(col("value").isNotNull).select(col("value"))
    val ext = vals.agg(min(col("value")).as("__lo"), max(col("value")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    vals
      .join(broadcast(ext))
      .withColumn("bin",
        when(width === 0, lit(0L))
          .otherwise(least(floor((col("value") - col("__lo")) / width),
            lit(nBins - 1).cast("long"))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(ext))
      .withColumn("bin_lo",
        round(col("__lo") + col("bin") * (col("__hi") - col("__lo")) / nBins, 4))
      .withColumn("bin_hi",
        round(col("__lo") + (col("bin") + 1) * (col("__hi") - col("__lo")) / nBins, 4))
      .select(col("bin"), col("bin_lo"), col("bin_hi"), col("n"))
  }

  /** Day-of-week × hour-of-day activity profile — the seasonality
    * heatmap behind capacity planning and anomaly baselines (what does
    * a NORMAL Tuesday 14:00 look like). ISO day numbering (1 = Monday)
    * so the engines can't disagree on week start. One tiny keyed
    * aggregation (≤168 groups): map-side partials absorb everything,
    * the shuffle moves one row per (dow, hour) per task.
    */
  def dowHourProfile(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(
        (expr("weekday(ts)") + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"))

  /** Ordered funnel conversion — how many users progress through the
    * step sequence IN ORDER (each step strictly after the previous
    * step's first completion). The product-analytics staple the
    * reference's event store exists to feed.
    *
    * Scale: one keyed aggregation per step, all on `user_id` — the
    * frontier frame shrinks monotonically (survivors only) and carries
    * just (user_id, ts): at 100 TB each step joins the full corpus
    * against an ever-smaller id frame, never corpus×corpus, and every
    * shuffle reuses the same key.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val typed = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
    var frontier = typed.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("__t"))
    val counts = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(1).cast("int").as("step"),
          lit(steps.head).as("event_type"), col("n_users")))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      frontier = typed.filter(col("event_type") === s)
        .join(frontier, Seq("user_id"))
        .filter(col("ts") > col("__t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("__t"))
      counts += frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).cast("int").as("step"),
          lit(s).as("event_type"), col("n_users"))
    }
    counts.reduce(_ unionByName _).orderBy(col("step"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; n_users = distinct users from that cohort active in
    * each later week (offset in whole weeks from the cohort's Monday).
    * Both engines truncate weeks to Monday and the offset is integer
    * date arithmetic, so the table is engine-exact.
    *
    * Scale: one aggregation to find first events, one equi-join back
    * on `user_id` (same partitioning reused), one distinct + count —
    * all narrow columns; the events payload never re-shuffles.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val typed = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val firsts = typed.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    typed
      .join(firsts, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        floor(datediff(to_date(col("ts")), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
