package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's a5 relational surface (Q1–Q7, `/root/reference/src/main/
  * scala/ca/uwaterloo/cs451/a5/Q*.scala`) re-expressed as declarative
  * DataFrame plans. The reference hand-builds each physical plan on RDDs:
  * broadcast-`collectAsMap` joins (`Q3.scala:43-60`), `cogroup` reduce-side
  * joins (`Q2.scala:61-65`), manual pre-filters. Here each query is a
  * logical plan and Catalyst chooses the physical strategy:
  *
  *  - dimension joins fall under `autoBroadcastJoinThreshold` →
  *    broadcast-hash-join, no shuffle of the fact side; AQE re-plans at
  *    runtime when post-filter sizes surprise the estimator. Explicit
  *    `broadcast()` hints are reserved for sides whose cardinality is
  *    bounded regardless of scale factor (nation: 25, region: 5) — a hint
  *    on anything that grows with the fact tables (customer, part, a date
  *    slice of lineitem) would force an over-limit broadcast at 100 TB
  *    exactly where the plan must not do that.
  *  - fact⋈fact (lineitem⋈orders) stays a shuffle join on the join key;
  *    at scale AQE handles skew/coalescing.
  *  - date filters are literal comparisons on the timestamp column, so they
  *    push down to parquet row-group pruning (`PushedFilters` in explain).
  *
  * Column aliases match `SparkEntry.oracleSql` exactly (driver hash-compare
  * sorts columns by name). Every query ends with a deterministic ORDER BY so
  * row order agrees with the DuckDB oracle even if the driver compares in
  * order. Double aggregates are rounded (2dp for big sums, 6dp for avgs) on
  * BOTH sides to absorb summation-order ulp differences between engines.
  *
  * Schema deltas vs the reference (FIXTURES.md): dates are real timestamps
  * (reference compares `YYYY-MM-DD` strings, `Q7.scala:54`), `o_clerk` →
  * `o_orderpriority`, `o_shippriority` → `o_orderstatus`.
  */
object Relational {

  /** Dates chosen to hit a dense slice of the generated data
    * (see TESTDATA.md; lineitem shipdates span 1995-01..2001-11). */
  val shipDate = "1996-11-01"
  val q6CutoffDate = "1998-09-01"
  val q7Date = "1997-06-01"
  val q5Nations: Seq[String] = Seq("NATION_3", "NATION_24")

  private def tsLit(d: String) = to_timestamp(lit(d), "yyyy-MM-dd")

  /** Reference Q1 (`Q1.scala:50-68`): count lineitems shipped on a date.
    * Plan: parquet scan with the equality pushed to row-group stats →
    * partial+final count. One job, no shuffle beyond the 1-row agg. */
  def q1ShipdateCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") === tsLit(shipDate))
      .agg(count(lit(1)).as("cnt"))

  /** Reference Q2 (`Q2.scala:44-76`): for lineitems shipped on a date, the
    * clerk (here: o_orderpriority) of the owning order, by orderkey, first 20.
    * The reference cogroups the full tables (`Q2.scala:61`); here the filter
    * lands first and AQE decides the join strategy at runtime — the date
    * slice is often broadcastable, but a one-day slice of a 100 TB lineitem
    * still scales with the fact table, so the decision belongs to runtime
    * stats, not a hard-coded hint. */
  def q2OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") === tsLit(shipDate))
      .select("l_orderkey")
    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"), col("l_orderkey"))
      .orderBy("l_orderkey")
      .limit(20)
  }

  /** Reference Q3 (`Q3.scala:43-76`): part/supplier names for lineitems
    * shipped on a date, by orderkey, first 20. The reference collects both
    * dims to the driver and broadcasts maps by hand; here Catalyst/AQE
    * picks broadcast-hash when the dim fits (part/supplier scale with SF,
    * so the choice stays with runtime stats rather than a hint). */
  def q3PartSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") === tsLit(shipDate))
      .select("l_orderkey", "l_partkey", "l_suppkey")
    li.join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("p_name"), col("s_name"))
      .orderBy("l_orderkey", "p_name", "s_name")
      .limit(20)
  }

  /** Reference Q4 (`Q4.scala:51-102`): lineitems shipped on a date counted
    * per customer nation. lineitem⋈orders shuffles on orderkey (both big);
    * nation (bounded) is hinted broadcast, customer is AQE's call.
    * Aggregation is partial map-side first. */
  def q4NationCount(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") === tsLit(shipDate))
      .select("l_orderkey")
    li.join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_nationkey")
  }

  /** O8/J1 under JOIN-key skew: the identical Q4 result computed through
    * a SALTED shuffle join. In a sort-merge/shuffle-hash join a single
    * hot key lands every matching row in one task; AQE's skew-join split
    * fixes skewed PARTITIONS at runtime but cannot split one giant KEY
    * whose matches must still meet in a single stream. Salting re-keys
    * the join on (key, salt): the big probe side derives salt from a
    * value that varies WITHIN the hot key (l_linenumber — uniform within
    * an order), and the smaller build side replicates each row
    * [[joinSalts]] times so every composite key still finds its match.
    * The hot key's rows now spread over `joinSalts` independent tasks;
    * the price is ×salts build-side shuffle volume, which is why the
    * REPLICATED side must be the smaller one and why this stays a
    * technique for residual skew, not a default. Output — and oracle —
    * are exactly q4's. */
  val joinSalts = 8
  def q4NationCountSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") === tsLit(shipDate))
      .select(col("l_orderkey"),
        pmod(col("l_linenumber"), lit(joinSalts)).as("salt"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .withColumn("salt", explode(sequence(lit(0), lit(joinSalts - 1))))
    li.join(ord,
        col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_nationkey")
  }

  /** Reference Q5 (`Q5.scala:40-95`): monthly lineitem counts for two
    * nations, the whole time range (no date filter). Semi-join reduction:
    * customers of the two nations → their orders → lineitem; only the
    * 25-row nation filter carries a broadcast hint — the reduced customer
    * and order sets still scale with the fact tables, so their join
    * strategy is AQE's runtime call. Month via `date_format` (reference
    * substrings the date string, `Q5.scala:81`). */
  def q5MonthlyNation(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(q5Nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "n_name")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("n_name", "ship_month")
  }

  /** Reference Q6 (`Q6.scala:52-132`) = TPC-H Q1: the multi-aggregate
    * pricing summary. Pure scan → partial agg → final agg over 6 groups;
    * the canonical whole-stage-codegen pipeline. Sums rounded to 2dp,
    * averages to 6dp (matching the oracle SQL exactly). */
  def q6PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= tsLit(q6CutoffDate))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Reference Q7 (`Q7.scala:42-96`) = TPC-H Q3 shape: top-10 unshipped
    * orders by revenue. Orders placed before D, lineitems shipped after D;
    * revenue = Σ extprice·(1−discount) per order. The o_orderdate filter
    * prunes orders before the shuffle join; customer is broadcast.
    * (`o_shippriority` absent in testdata → `o_orderstatus`.) */
  def q7TopUnshipped(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < tsLit(q7Date))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > tsLit(q7Date))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("l_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** J3/P5: explicit semi-join — orders with at least one lineitem shipped
    * after the date (the reference fakes this with cogroup-nonEmpty
    * filters, `Q2.scala:62`, and broadcast `contains`, `Q7.scala:72`).
    * `left_semi` shuffles only the keys and short-circuits per match. */
  def q8SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > tsLit(q7Date))
      .select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  /** Two-level dimension rollup: revenue per region (nation→region chain,
    * both broadcast). Completes coverage of the star schema's region arm. */
  def q9RegionRollup(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "r_name")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** [[q9RegionRollup]] with the q17 integer-cents discipline applied to
    * the revenue sum — the EXACT-AT-ANY-SCALE twin. The float q9 is
    * hash-exact at the sf0.01 gate but its 2dp rounding stops absorbing
    * summation-order ulp noise once group sums reach ~6e10 (measured in
    * the r7 sf1 audit, PLANS.md). Here each row's revenue becomes the
    * exact integer price_cents × (100 − discount_hundredths) — both
    * factors are 2dp-quantized in the data, so the product is an exact
    * long in 10⁻⁴ currency units, the group sum is exact integer
    * arithmetic in ANY aggregation order (≤ 1e9/row → no overflow below
    * ~9e9 rows/group), and the hash matches at every scale. The output
    * keeps the integer (revenue_e4): dividing back to a double would
    * reintroduce the representability problem the encoding removes. */
  def q9RegionRollupCents(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "r_name")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name")
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** Grouping sets beyond the reference's surface (it has none, SURVEY
    * §2.4): revenue ROLLUP over region → nation with subtotal rows. NULL
    * group keys are coalesced to 'ALL' on both engines so the hash
    * compare is null-free. */
  def q10RegionNationRollup(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
    joined
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"))
      .orderBy("region", "nation")
  }

  /** [[q10RegionNationRollup]]'s any-scale-exact twin — the
    * [[q9RegionRollupCents]] integer-cents discipline through the
    * rollup lattice: subtotal rows sum the identical exact longs, so
    * every grouping-set level is hash-exact at any magnitude. */
  def q10RollupCents(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
    joined
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("rev_e4")).as("revenue_e4"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue_e4"))
      .orderBy("region", "nation")
  }

  /** Distinct aggregation (absent from the reference): exact distinct
    * customers per order priority — the shuffle-heavy exact form. */
  def q11DistinctCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Outer + anti joins (the join types the reference never builds,
    * SURVEY §2.3 "Not present"): per order priority, how many orders have
    * NO lineitem shipped after the date — left-anti — next to the total
    * with a left-outer null-probe cross-check. */
  def q12OuterAnti(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > tsLit(q7Date))
      .select(col("l_orderkey")).distinct()
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val anti = ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_unshipped"))
    val outer = ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        count(col("l_orderkey")).as("n_shipped"))
    outer.join(anti, Seq("o_orderpriority"), "left_outer")
      .na.fill(0L, Seq("n_unshipped"))
      .orderBy("o_orderpriority")
  }

  /** Ordered analytic window (SURVEY §2.5 — the surface the reference
    * only approximates by hand): running revenue per customer across
    * their orders in date order. Deterministic frame order via the
    * unique orderkey tiebreak keeps the cumulative double sums
    * bit-aligned with DuckDB. */
  def q13RunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** TPC-H Q17 shape (correlated scalar subquery over the fact table —
    * an optimizer surface the reference's hand-built RDD plans cannot
    * express): revenue of lineitems whose quantity is below 20% of their
    * part's average quantity. Declarative decorrelation: the per-part
    * threshold is a map-side-combinable groupBy over the SAME scan, then
    * a shuffle join back on partkey — both sides scale together, so no
    * broadcast hint; at 100 TB the threshold table is |part| rows and
    * AQE may still elect broadcast at runtime. Determinism: quantities
    * are integral (TESTDATA), so sum is exact in double regardless of
    * summation order, avg is one exact-operand division and ×0.2 one
    * multiplication — the threshold compare is bit-identical in DuckDB. */
  def q14SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val thresh = li.groupBy("l_partkey")
      .agg((avg(col("l_quantity")) * lit(0.2)).as("qty_limit"))
    li.join(thresh, "l_partkey")
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 shape (HAVING + join back to the dimensions): orders whose
    * total quantity exceeds [[q15QtyThreshold]], with customer name and
    * order header, top-100 by total price. The grouped sum runs FIRST
    * (partial map-side combine shrinks the shuffle), the filter keeps
    * only the heavy tail, and the join back touches orders/customer for
    * that tail only. sum(l_quantity) is exact (integral doubles) → cast
    * to long for a clean schema on both engines. */
  val q15QtyThreshold = 220
  def q15LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > q15QtyThreshold)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape (disjunctive OR-of-ANDs mixing both join sides —
    * the predicate-pushdown stress case): revenue over three
    * brand/size/quantity bands. The filter references part AND lineitem
    * columns inside each disjunct, so it cannot move below the join
    * whole; Catalyst's CNF extraction derives the per-side residuals
    * (the brand/size disjunction for the part scan, the quantity range
    * union for the lineitem scan) and pushes those — RelationalSpec
    * asserts the derived part-side filter reaches the scan. */
  def q16DisjunctiveParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#3", 15, 1, 11) || band("Brand#15", 25, 10, 20) ||
        band("Brand#24", 35, 20, 30))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** [[q16DisjunctiveParts]]'s any-scale-exact twin — the
    * [[q9RegionRollupCents]] integer-cents discipline over the
    * disjunctive-band revenue sum. Added r14 after the sf1 sweep caught
    * the float form flipping across RUNS at 10× scale (one sweep exact,
    * the next ulp-off — a single global sum whose rounded value sits at
    * a boundary the summation order can cross), the q9/q10/q18 class
    * exactly; it joins them in the declared scale contract. */
  def q16DisjunctiveCents(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#3", 15, 1, 11) || band("Brand#15", 25, 10, 20) ||
        band("Brand#24", 35, 20, 30))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape (ungrouped scalar subquery + anti join): customers
    * with above-average positive balance and no order since
    * [[q17DormantDate]], counted per market segment. The average is a
    * single-row frame broadcast via crossJoin (the bounded-broadcast
    * pattern); the anti join's date filter pushes to the orders scan so
    * the probe side shrinks before the shuffle. Determinism: balances
    * are 2dp, so cents = round(bal×100) is an exact long, the positive
    * subset's avg is one exact-operand division, and the compare is
    * bit-identical in DuckDB. */
  val q17DormantDate = "2000-01-01"
  def q17WealthyDormant(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
    val avgPos = cust.filter(col("cents") > 0)
      .agg(avg(col("cents")).as("avg_cents"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= tsLit(q17DormantDate))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgPos))
      .filter(col("cents") > col("avg_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** Lakehouse MERGE (CDC latest-wins upsert), the snapshot-maintenance
    * primitive a warehouse user expects — absent from the reference,
    * whose sinks are overwrite-only. The CDC batch is derived
    * deterministically from the base so the oracle can rebuild it:
    * every key ≡ 3 (mod 10) arrives updated (price +1000, status 'U'),
    * keys ≡ 3 (mod 20) arrive updated TWICE in the same batch (a
    * version-3 supersede at +2000 — CDC feeds routinely carry several
    * versions of one key per batch, and latest-wins must pick the
    * newest, not either), and fresh rows arrive under negated keys
    * (guaranteed absent from the positive base keyspace, status 'N').
    *
    * Plan shape — chosen for the 100 TB snapshot, not the small one: the
    * naive MERGE (union all → row_number per key → keep latest) shuffles
    * the ENTIRE base; here the window dedups only the CDC batch (small
    * by nature), and the base contributes through a left_anti on the
    * CDC keyset — which AQE turns into a broadcast anti join when the
    * batch fits, leaving the snapshot side map-only with zero shuffle.
    * No hint: the batch grows with SF, so the broadcast decision belongs
    * to runtime stats. Output is the merged snapshot's per-status
    * rollup (counts + 2dp-rounded price mass). */
  def snapshotMerge(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").map(col)
    val base = Tables.orders(spark, dir).select(cols: _*)
    val updates = base
      .filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("version", lit(2))
    val supersedes = base
      .filter(pmod(col("o_orderkey"), lit(20)) === 3)
      .withColumn("o_totalprice", col("o_totalprice") + lit(2000.0))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("version", lit(3))
    val inserts = base
      .filter(pmod(col("o_orderkey"), lit(100)) === 7)
      .withColumn("o_orderkey", -col("o_orderkey"))
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("version", lit(2))
    // latest-wins WITHIN the batch (the ≡3 mod 20 keys carry v2 AND v3);
    // the window runs over the batch alone, never the base
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderkey").orderBy(desc("version"))
    val batch = updates.unionByName(supersedes).unionByName(inserts)
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1).select(cols: _*)
    base
      .join(batch.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(batch)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** The TPC-H Q21 optimizer shape (the classically hard one): a SEMI
    * and an ANTI self-join on the SAME fact table in one query —
    * suppliers who are the SOLE late shipper inside multi-supplier
    * orders. Neither q8 (semi vs a dimension) nor q12 (anti vs a
    * dimension) exercises this: here both probes are lineitem itself,
    * so the optimizer must plan two fact⋈fact joins sharing a scan.
    *
    * Scale shape: both self-joins key on l_orderkey — ONE exchange of
    * the deduplicated (order, supplier) pairs serves the semi and the
    * anti probe, and on a bucketed-by-orderkey layout ([[Lakehouse]])
    * both would be exchange-free. Supplier pairs per order are bounded
    * (orders have ≤7 lines), so no skew amplification. */
  def q19SoleDelayer(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val allSup = pairs.select("l_orderkey", "l_suppkey").distinct()
    val late = pairs
      .filter(col("l_shipdate") > lit(q6CutoffDate).cast("timestamp"))
      .select("l_orderkey", "l_suppkey").distinct()
    val others = allSup.toDF("o_key", "other_supp")
    val lateOthers = late.toDF("o_key", "other_supp")
    late
      .join(others,
        col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("other_supp"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("other_supp"), "left_anti")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_waiting"))
      .orderBy(desc("n_waiting"), col("suppkey"))
  }

  /** CDC change feed — the read half of the lakehouse CDC story
    * ([[snapshotMerge]] is the write half): row-level inserts / updates
    * / deletes between two snapshot versions, the "change data feed" a
    * downstream incremental consumer reads instead of re-diffing
    * snapshots itself. v2 evolves deterministically from the base
    * snapshot (updates on keys ≡3 mod 10, deletes on ≡11 mod 25,
    * inserts under negated keys ≡7 mod 100), both engines constructing
    * the same evolution.
    *
    * Scale shape: ONE key-equi full-outer join (both sides shuffle on
    * the snapshot key once) + a map-only CASE projection; at 100 TB
    * both snapshots would live bucketed on the key ([[Lakehouse]]'s
    * layout), making the diff exchange-free — the same amortization
    * as bucketed_join. Unchanged rows are filtered AFTER the CASE so
    * the join itself streams; no collect anywhere. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val k = col("o_orderkey")
    val v2 = base.filter(pmod(k, lit(25)) =!= 11)
      .select(k,
        when(pmod(k, lit(10)) === 3, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        when(pmod(k, lit(10)) === 3, lit("U"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"))
      .unionByName(base.filter(pmod(k, lit(100)) === 7)
        .select((-k).as("o_orderkey"), col("o_totalprice"),
          lit("N").as("o_orderstatus")))
    val a = base.select(k.as("ka"), col("o_totalprice").as("old_price"),
      col("o_orderstatus").as("old_status"))
    val b = v2.select(k.as("kb"), col("o_totalprice").as("new_price"),
      col("o_orderstatus").as("new_status"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(
        coalesce(col("ka"), col("kb")).as("o_orderkey"),
        when(col("ka").isNull, lit("insert"))
          .when(col("kb").isNull, lit("delete"))
          .when(col("old_price") =!= col("new_price") ||
            col("old_status") =!= col("new_status"), lit("update"))
          .otherwise(lit("none")).as("change"),
        col("old_status"), col("new_status"),
        col("old_price"), col("new_price"))
      .filter(col("change") =!= "none")
      .orderBy("o_orderkey")
  }

  /** CUBE — the full grouping-sets lattice (q10 covers ROLLUP's prefix
    * chain; CUBE adds the cross-margins: per-linestatus totals across
    * all returnflags, which ROLLUP cannot express). Same NULL→'ALL'
    * coalescing discipline as q10 so the hash compare stays null-free. */
  def q18CubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue"), col("n_items"))
      .orderBy("returnflag", "linestatus")

  /** [[q18CubeRevenue]]'s any-scale-exact twin: the integer-cents
    * discipline through the full CUBE lattice (cross-margins included)
    * — with q9/q10's twins, every float seam the r7 sf1 audit found has
    * a registered exact alternative. */
  def q18CubeCents(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue_e4"), col("n_items"))
      .orderBy("returnflag", "linestatus")

  /** Data-quality audit (the Deequ-style expectation surface): declared
    * constraints checked as data, not assumptions — the pre-flight every
    * 100 TB ingest runs before downstream jobs trust a feed. Plan shape
    * is the cheapest possible: ALL row-local constraints fold into ONE
    * conditional-aggregation pass over each table (a single scan emits
    * every violation counter; `stack` reshapes the 1-row result), and
    * the one cross-table constraint — referential integrity — is a
    * left_anti count, the shape that broadcasts when the key side fits.
    * Output: one row per constraint with checked/violation counts and
    * the verdict, so a scheduler can gate on `bool_and(pass)`. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    // coalesce: SUM over an EMPTY table is NULL, and an empty feed has
    // zero violations, not an indeterminate verdict — without this the
    // audit of a fresh/empty partition reports pass = null and a
    // bool_and gate blocks a perfectly clean pipeline (caught by the
    // empty-tables robustness pin)
    def viol(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 0L).otherwise(1L)), lit(0L))
    val li = Tables.lineitem(spark, dir)
    val liChecks = li.agg(
      count(lit(1)).as("n"),
      viol(col("l_quantity").between(1, 50)).as("v1"),
      viol(col("l_discount").between(0.0, 1.0)).as("v2"),
      viol(col("l_extendedprice") > 0).as("v3"),
      viol(col("l_shipdate").isNotNull).as("v4"))
      .selectExpr(
        """stack(4,
             'lineitem.quantity_in_1_50', n, v1,
             'lineitem.discount_in_0_1', n, v2,
             'lineitem.extendedprice_positive', n, v3,
             'lineitem.shipdate_not_null', n, v4)
           AS (check_name, n_checked, n_violations)""")
    val ord = Tables.orders(spark, dir)
    val ordChecks = ord.agg(
      count(lit(1)).as("n"),
      viol(col("o_totalprice") > 0).as("v1"),
      viol(col("o_orderdate").isNotNull).as("v2"))
      .selectExpr(
        """stack(2,
             'orders.totalprice_positive', n, v1,
             'orders.orderdate_not_null', n, v2)
           AS (check_name, n_checked, n_violations)""")
    val fk = li.select("l_orderkey")
      .join(ord.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .crossJoin(li.agg(count(lit(1)).as("n")))
      .select(lit("lineitem.orderkey_fk_orders").as("check_name"),
        col("n").as("n_checked"), col("orphans").as("n_violations"))
    liChecks.unionByName(ordChecks).unionByName(fk)
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("check_name")
  }

  /** The same TPC-H Q1 block through the SQL entry point (`spark.sql`
    * over registered temp views) — exercising the parser/analyzer path
    * rather than the DataFrame DSL; plans converge to the same physical
    * plan as [[q6PricingSummary]]. */
  def q6PricingSummarySql(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            round(avg(l_quantity), 6) AS avg_qty,
            round(avg(l_extendedprice), 6) AS avg_price,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '$q6CutoffDate 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_shipdate_count" -> (q1ShipdateCount _),
    "q2_order_priority" -> (q2OrderPriority _),
    "q3_part_supplier" -> (q3PartSupplier _),
    "q4_nation_count" -> (q4NationCount _),
    "q4_nation_count_salted" -> (q4NationCountSalted _),
    "q5_monthly_nation" -> (q5MonthlyNation _),
    "q6_pricing_summary" -> (q6PricingSummary _),
    "q6_pricing_summary_sql" -> (q6PricingSummarySql _),
    "q7_top_unshipped" -> (q7TopUnshipped _),
    "q8_semi_join" -> (q8SemiJoin _),
    "q9_region_rollup" -> (q9RegionRollup _),
    "q9_region_rollup_cents" -> (q9RegionRollupCents _),
    "q10_rollup_sets" -> (q10RegionNationRollup _),
    "q11_distinct_customers" -> (q11DistinctCustomers _),
    "q12_outer_anti" -> (q12OuterAnti _),
    "q13_running_revenue" -> (q13RunningRevenue _),
    "q14_small_qty_revenue" -> (q14SmallQtyRevenue _),
    "q15_large_orders" -> (q15LargeOrders _),
    "q16_disjunctive_parts" -> (q16DisjunctiveParts _),
    "q16_disjunctive_cents" -> (q16DisjunctiveCents _),
    "q17_wealthy_dormant" -> (q17WealthyDormant _),
    "snapshot_merge" -> (snapshotMerge _),
    "snapshot_diff" -> (snapshotDiff _),
    "q19_sole_delayer" -> (q19SoleDelayer _),
    "dq_audit" -> (dqAudit _),
    "q18_cube_revenue" -> (q18CubeRevenue _),
    "q10_rollup_cents" -> (q10RollupCents _),
    "q18_cube_cents" -> (q18CubeCents _))

  /** DuckDB-dialect oracles; aliases/ordering mirror the Spark plans. */
  val oracleSql: Map[String, String] = Map(
    "q1_shipdate_count" ->
      s"""SELECT count(*) AS cnt FROM lineitem
          WHERE l_shipdate = TIMESTAMP '$shipDate 00:00:00'""",
    "q2_order_priority" ->
      s"""SELECT o_orderpriority, l_orderkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate = TIMESTAMP '$shipDate 00:00:00'
          ORDER BY l_orderkey LIMIT 20""",
    "q3_part_supplier" ->
      s"""SELECT l_orderkey, p_name, s_name
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE l_shipdate = TIMESTAMP '$shipDate 00:00:00'
          ORDER BY l_orderkey, p_name, s_name LIMIT 20""",
    "q4_nation_count" ->
      s"""SELECT n_nationkey, n_name, count(*) AS cnt
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_shipdate = TIMESTAMP '$shipDate 00:00:00'
          GROUP BY n_nationkey, n_name
          ORDER BY n_nationkey""",
    // salted variant computes the identical result — same oracle as q4
    "q4_nation_count_salted" ->
      s"""SELECT n_nationkey, n_name, count(*) AS cnt
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_shipdate = TIMESTAMP '$shipDate 00:00:00'
          GROUP BY n_nationkey, n_name
          ORDER BY n_nationkey""",
    "q5_monthly_nation" ->
      s"""SELECT n_name, strftime(l_shipdate, '%Y-%m') AS ship_month, count(*) AS cnt
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_name IN (${q5Nations.map(n => s"'$n'").mkString(", ")})
          GROUP BY n_name, ship_month
          ORDER BY n_name, ship_month""",
    "q6_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            round(avg(l_quantity), 6) AS avg_qty,
            round(avg(l_extendedprice), 6) AS avg_price,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '$q6CutoffDate 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q7_top_unshipped" ->
      s"""SELECT c_name, l_orderkey, o_orderdate, o_orderstatus,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE o_orderdate < TIMESTAMP '$q7Date 00:00:00'
            AND l_shipdate > TIMESTAMP '$q7Date 00:00:00'
          GROUP BY c_name, l_orderkey, o_orderdate, o_orderstatus
          ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q6_pricing_summary_sql" ->
      s"""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            round(avg(l_quantity), 6) AS avg_qty,
            round(avg(l_extendedprice), 6) AS avg_price,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '$q6CutoffDate 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q8_semi_join" ->
      s"""SELECT o_orderpriority, count(*) AS cnt
          FROM orders
          WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > TIMESTAMP '$q7Date 00:00:00')
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""",
    "q9_region_rollup" ->
      """SELECT r_name,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name
          ORDER BY r_name""",
    "q9_region_rollup_cents" ->
      """SELECT r_name,
            sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
              AS revenue_e4,
            count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name
          ORDER BY r_name""",
    "q10_rollup_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY region, nation""",
    "q11_distinct_customers" ->
      """SELECT o_orderpriority,
                count(DISTINCT o_custkey) AS n_customers,
                count(*) AS n_orders
          FROM orders
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""",
    "q12_outer_anti" ->
      s"""WITH li AS (
            SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '$q7Date 00:00:00'),
          outer_side AS (
            SELECT o_orderpriority, count(*) AS n_orders,
                   count(l_orderkey) AS n_shipped
            FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority),
          anti_side AS (
            SELECT o_orderpriority, count(*) AS n_unshipped
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM li WHERE l_orderkey = o_orderkey)
            GROUP BY o_orderpriority)
          SELECT o.o_orderpriority, o.n_orders, o.n_shipped,
                 coalesce(a.n_unshipped, 0) AS n_unshipped
          FROM outer_side o LEFT JOIN anti_side a USING (o_orderpriority)
          ORDER BY o.o_orderpriority""",
    "q13_running_revenue" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_total
          FROM orders
          WHERE o_custkey < 100
          ORDER BY o_custkey, o_orderkey""",
    // the oracle keeps the CORRELATED form — DuckDB decorrelates it into
    // the same agg+join the Spark plan declares explicitly
    "q14_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
                count(*) AS n_items
          FROM lineitem l
          WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem i
            WHERE i.l_partkey = l.l_partkey)""",
    "q15_large_orders" ->
      s"""SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
          FROM orders
          JOIN (SELECT l_orderkey, cast(sum(l_quantity) AS BIGINT) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > $q15QtyThreshold) big
            ON o_orderkey = big.l_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q16_disjunctive_parts" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                count(*) AS n_items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#3'
                 AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             OR (p_brand = 'Brand#15'
                 AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#24'
                 AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
    "q16_disjunctive_cents" ->
      """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                    (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
                  AS revenue_e4,
                count(*) AS n_items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#3'
                 AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             OR (p_brand = 'Brand#15'
                 AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#24'
                 AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
    "q17_wealthy_dormant" ->
      s"""WITH c AS (
            SELECT *, cast(round(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer)
          SELECT c_mktsegment, count(*) AS n_customers,
                 round(sum(c_acctbal), 2) AS total_bal
          FROM c
          WHERE cents > (SELECT avg(cents) FROM c WHERE cents > 0)
            AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '$q17DormantDate 00:00:00')
          GROUP BY c_mktsegment
          ORDER BY c_mktsegment""",
    // the Q21 shape restated as EXISTS / NOT EXISTS — the declarative
    // form of the semi + anti self-join pair
    "q19_sole_delayer" ->
      s"""WITH late AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '$q6CutoffDate 00:00:00'),
          allsup AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
          SELECT l.l_suppkey AS suppkey, count(*)::BIGINT AS n_waiting
          FROM late l
          WHERE EXISTS (SELECT 1 FROM allsup a
                        WHERE a.l_orderkey = l.l_orderkey
                          AND a.l_suppkey <> l.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late o
                            WHERE o.l_orderkey = l.l_orderkey
                              AND o.l_suppkey <> l.l_suppkey)
          GROUP BY 1 ORDER BY n_waiting DESC, suppkey""",
    // the same deterministic v1→v2 evolution on both sides; USING is
    // avoided so each side's key stays referenceable for the CASE arms
    "snapshot_diff" ->
      """WITH v1 AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
          v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 10 = 3
                        THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
                   CASE WHEN o_orderkey % 10 = 3
                        THEN 'U' ELSE o_orderstatus END AS o_orderstatus
            FROM orders WHERE o_orderkey % 25 <> 11
            UNION ALL
            SELECT -o_orderkey, o_totalprice, 'N'
            FROM orders WHERE o_orderkey % 100 = 7),
          d AS (
            SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                        WHEN b.o_orderkey IS NULL THEN 'delete'
                        WHEN a.o_totalprice <> b.o_totalprice
                          OR a.o_orderstatus <> b.o_orderstatus THEN 'update'
                        ELSE 'none' END AS change,
                   a.o_orderstatus AS old_status, b.o_orderstatus AS new_status,
                   a.o_totalprice AS old_price, b.o_totalprice AS new_price
            FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
          SELECT o_orderkey, change, old_status, new_status, old_price, new_price
          FROM d WHERE change <> 'none' ORDER BY o_orderkey""",
    "snapshot_merge" ->
      """WITH batch_all AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice,
                   o_orderdate, o_orderpriority, 2 AS version
            FROM orders WHERE o_orderkey % 10 = 3
            UNION ALL
            SELECT o_orderkey, o_custkey, 'U',
                   o_totalprice + 2000.0,
                   o_orderdate, o_orderpriority, 3
            FROM orders WHERE o_orderkey % 20 = 3
            UNION ALL
            SELECT -o_orderkey, o_custkey, 'N', o_totalprice,
                   o_orderdate, o_orderpriority, 2
            FROM orders WHERE o_orderkey % 100 = 7),
          batch AS (
            SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                           ORDER BY version DESC) AS rn
              FROM batch_all)
            WHERE rn = 1),
          merged AS (
            SELECT o_orderstatus, o_totalprice FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
            UNION ALL
            SELECT o_orderstatus, o_totalprice FROM batch)
          SELECT o_orderstatus, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS total_price
          FROM merged
          GROUP BY o_orderstatus
          ORDER BY o_orderstatus""",
    "dq_audit" ->
      """WITH li AS (
            SELECT count(*) AS n,
              cast(coalesce(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v1,
              cast(coalesce(sum(CASE WHEN l_discount BETWEEN 0.0 AND 1.0 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v2,
              cast(coalesce(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v3,
              cast(coalesce(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS v4
            FROM lineitem),
          ord AS (
            SELECT count(*) AS n,
              cast(coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT) AS v1,
              cast(coalesce(sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS v2
            FROM orders),
          fk AS (
            SELECT (SELECT count(*) FROM lineitem) AS n,
                   (SELECT count(*) FROM lineitem
                    WHERE NOT EXISTS (SELECT 1 FROM orders
                                      WHERE o_orderkey = l_orderkey)) AS orphans),
          rows_out AS (
            SELECT 'lineitem.quantity_in_1_50' AS check_name, n AS n_checked, v1 AS n_violations FROM li
            UNION ALL SELECT 'lineitem.discount_in_0_1', n, v2 FROM li
            UNION ALL SELECT 'lineitem.extendedprice_positive', n, v3 FROM li
            UNION ALL SELECT 'lineitem.shipdate_not_null', n, v4 FROM li
            UNION ALL SELECT 'orders.totalprice_positive', n, v1 FROM ord
            UNION ALL SELECT 'orders.orderdate_not_null', n, v2 FROM ord
            UNION ALL SELECT 'lineitem.orderkey_fk_orders', n, orphans FROM fk)
          SELECT check_name, n_checked, n_violations,
                 n_violations = 0 AS pass
          FROM rows_out ORDER BY check_name""",
    "q18_cube_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                count(*) AS n_items
          FROM lineitem
          GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY returnflag, linestatus""",
    "q10_rollup_cents" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                    (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
                  AS revenue_e4
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY region, nation""",
    "q18_cube_cents" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                    (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
                  AS revenue_e4,
                count(*) AS n_items
          FROM lineitem
          GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY returnflag, linestatus""")

  /** The reference's dual-format grading contract: every relational query
    * re-registered on the pipe-text path (`Tables.CsvDirPrefix`), checked
    * against the SAME oracle as its parquet twin — a hash match proves
    * text parse ≡ parquet scan end-to-end, per query. Bench skips these
    * (format parity, not a distinct physical workload). */
  val csvRegistry: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, fn) =>
      s"${k}_csv" -> ((s: SparkSession, d: String) => fn(s, graft.Tables.CsvDirPrefix + d))
    }
  val csvOracleSql: Map[String, String] =
    oracleSql.map { case (k, sql) => s"${k}_csv" -> sql }

  /** Declared scale contract (r14, r13 verdict item 1a): the
    * float-revenue rollups whose 2dp rounding is hash-exact at the
    * sf0.01 gate but mathematically CANNOT absorb summation-order ulp
    * once group sums reach ~6e10 (the r7 sf1 audit — at that magnitude
    * a double's ulp times millions of addends exceeds the 0.005 the
    * rounding can hide). Each names its any-scale-exact integer-cents
    * twin. At-scale oracle sweeps check the float form to an ulp
    * tolerance AND require the named twin exact-passing in the same
    * sweep — the design the cents twins were built for, now machine-
    * readable instead of a per-sweep footnote. The sf0.01 driver gate
    * is unaffected: these rows stay hash-exact there. */
  val scaleContracts: Map[String, String] = Map(
    "q9_region_rollup" -> "q9_region_rollup_cents",
    "q10_rollup_sets" -> "q10_rollup_cents",
    "q18_cube_revenue" -> "q18_cube_cents",
    // r14: caught by the second sf1 HEAD sweep — the float form passed
    // exact in one sweep and read ulp-off in the next (a single global
    // sum at a rounding boundary the summation order crosses run to
    // run); same class, same remedy
    "q16_disjunctive_parts" -> "q16_disjunctive_cents")

  /** The `_csv` twins inherit the contract (same plans over the csv
    * scan). */
  val csvScaleContracts: Map[String, String] =
    scaleContracts.map { case (k, v) => s"${k}_csv" -> s"${v}_csv" }
}
