package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.fn.Compat

/** Core relational operator inventory (SURVEY.md §2.A/§2.B/§2.C) expressed as
  * generic queries over the driver's TPC-H-ish test data.
  *
  * Design rules (see SURVEY.md §7.3):
  *  - Every output column is explicitly aliased; oracle SQL uses identical
  *    aliases (driver hash-compares by sorted column name).
  *  - Deterministic: every query ends in a total ORDER BY; FP aggregates are
  *    rounded.
  *  - Scale: joins against dimension tables are broadcast; aggregations are
  *    partial-agg friendly (plain groupBy on native functions); no collect()
  *    anywhere.
  */
object Relational {

  /** A19/B1/B9 filter + projection + deterministic order.
    * Filter and projection both push into the parquet scan.
    */
  def q01FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** §2.C aggregation: TPC-H Q1-style pricing summary (map-side partial agg,
    * one shuffle on the two grouping keys).
    */
  def q02AggPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A11-style broadcast joins: orders→customer (shuffle) then two broadcast
    * hash joins against tiny dims. nation/region stay broadcast at any SF.
    */
  def q03JoinRevenue(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  /** A2 anti-join (reference: metadata-without-data dict difference). */
  def q04AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Semi-join (A2's positive pairing as a semi). */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") > 49),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy("p_partkey")

  /** A14-analog window: top-3 orders per customer (rank-and-filter). */
  def q06WindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** A4-analog "last line per file": last event per user via max_by — a single
    * partial-aggregable pass, no window shuffle-sort needed.
    */
  def q07LastEvent(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("last_event_id"),
        max_by(col("event_type"), struct(col("ts"), col("event_id")))
          .as("last_event_type"))
      .orderBy("user_id")

  /** A3-analog JSON extraction (reference parses nested market JSON). */
  def q08JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** A13 uniqueness / distinct. */
  def q09Distinct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** §2.C rollup aggregation (absent in reference; Spark-grade extension).
    *
    * Expressed via spark.sql: the Dataset rollup/cube API after any join
    * trips Spark 4.1's ambiguous-self-join check (false positive — verified
    * that plain-table rollup works and the same plan through SQL analyzes
    * fine). Identical logical plan either way.
    */
  def q10Rollup(s: SparkSession, d: String): DataFrame = {
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("c_acctbal"))
      .createOrReplaceTempView("graft_q10_base")
    s.sql(
      """SELECT r_name, n_name, count(*) AS cnt,
           round(sum(c_acctbal), 2) AS sum_bal
         FROM graft_q10_base
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
  }

  /** A5/A12-analog conditional classification + projection contract. */
  def q11CaseClassify(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("band",
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .otherwise("high"))
      .groupBy("event_type", "band")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type", "band")

  /** B7 strftime compat: orders per month (plan-time date_format rewrite,
    * stays inside whole-stage codegen).
    */
  def q12Strftime(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("ym", Compat.strftime("%Y-%m", col("o_orderdate")))
      .groupBy("ym")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("ym")

  /** B6 time() compat: morning events per type. */
  def q13TimeFilter(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(Compat.time(col("ts")) < "12:00:00")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** §2.C top-k: global ORDER BY + LIMIT → TakeOrderedAndProject (no full
    * sort shuffle at scale).
    */
  def q14TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** As-of join (§2.C extension; reference has none): for every purchase
    * event, the most recent strictly-earlier event of the same user that is
    * not a purchase.
    *
    * Implemented the scalable way — NOT a pair-blowup range join: tag the
    * union, sort within user, carry the last non-purchase event forward with
    * an unbounded-preceding window. One shuffle on user_id, linear in events.
    */
  def q15AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // "prior" means STRICTLY earlier ts (oracle: e.ts < p.ts). Sorting
    // purchases (rank 0) before same-ts non-purchases (rank 1) makes the
    // preceding-rows frame of a purchase contain exactly the rows with
    // ts < current ts — a same-ts non-purchase can never leak in, and
    // same-ts purchases contribute only nulls to the ignoreNulls last().
    val rank = when(col("event_type") === "purchase", 0).otherwise(1)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), rank, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prior_event_id",
        last(when(col("event_type") =!= "purchase", col("event_id")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        col("prior_event_id"))
      .orderBy("purchase_event_id")
  }

  /** A14 merge/upsert policies as a query: two snapshots of orders, newer
    * snapshot wins per key (row_number preference — the Spark-native merge).
    */
  def q16MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val old = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice").as("price"), lit("old").as("src"))
    // exact +100.0 (not *1.1+round: double rounding at .005 boundaries is
    // engine-divergent between Spark and DuckDB)
    val fresh = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), (col("o_totalprice") + 100.0).as("price"),
        lit("new").as("src"))
    val w = Window.partitionBy("o_orderkey")
      .orderBy(when(col("src") === "new", 0).otherwise(1))
    old.unionByName(fresh)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("price"), col("src"))
      .orderBy("o_orderkey")
  }

  /** A8-analog per-row timezone local times: tz derived per row, local
    * timestamp string + English weekday (date_format EEEE).
    */
  def q17LocalTime(s: SparkSession, d: String): DataFrame = {
    val tz = when(col("user_id") % 4 === 0, "Australia/Sydney")
      .when(col("user_id") % 4 === 1, "Europe/London")
      .when(col("user_id") % 4 === 2, "America/New_York")
      .otherwise("Asia/Tokyo")
    events(s, d)
      .withColumn("tz", tz)
      .withColumn("local_ts",
        date_format(from_utc_timestamp(col("ts"), col("tz")), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("local_dow",
        date_format(from_utc_timestamp(col("ts"), col("tz")), "EEEE"))
      .select(col("event_id"), col("tz"), col("local_ts"), col("local_dow"))
      .orderBy("event_id")
  }

  /** A10-analog regex extraction: structured fields out of part names/types. */
  def q18RegexExtract(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .withColumn("type_head", regexp_extract(col("p_type"), "^(\\w+)", 1))
      .withColumn("name_first", regexp_extract(col("p_name"), "^(\\w+)", 1))
      .groupBy("type_head")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("name_first")).as("n_first"))
      .orderBy("type_head")

  /** A20-analog audit counters: tagged-union status counts in one pass. */
  def q19Counters(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type").as("status"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("status")

  /** §2.C: exact percentiles (linear interpolation — same definition as
    * DuckDB quantile_cont).
    */
  def q32Percentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
      .orderBy("l_returnflag")

  /** §2.C: GROUPING SETS (via SQL — same Spark 4.1 rollup-after-join
    * analyzer workaround as q10).
    */
  def q33GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("o_totalprice"))
      .createOrReplaceTempView("graft_q33_base")
    s.sql(
      """SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS sum_price
         FROM graft_q33_base
         GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority))
         ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  /** §2.C: pivot — wide conditional aggregation by return flag. */
  def q34Pivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")

  /** §2.C: statistical aggregates (stddev / covariance / correlation). */
  def q35Stats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qe"))
      .orderBy("l_returnflag")

  /** §2.C set operations: EXCEPT (customers in a segment minus big
    * spenders) + INTERSECT via union-compatible legs.
    */
  def q36SetOps(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bigSpenders = orders(s, d).filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    building.except(bigSpenders)
      .orderBy("c_custkey")
  }

  /** §2.C range join, Spark-first: a pure inequality join (ship date within
    * 7 days after any urgent-order date) would be O(n*m); binning both sides
    * to week buckets turns it into an equi-join on the bucket (candidates)
    * plus a cheap refine predicate — the standard bin-and-refine rewrite
    * that scales linearly with bucket occupancy.
    */
  def q38RangeJoin(s: SparkSession, d: String): DataFrame = {
    val urgentDates = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(to_date(col("o_orderdate")).as("d"))
      .distinct()
    val ships = lineitem(s, d).select(to_date(col("l_shipdate")).as("sd"))
    val week = (c: Column) => floor(datediff(c, lit("1992-01-01")) / 7)
    val datesBinned = urgentDates
      .withColumn("wk", explode(array(week(col("d")), week(col("d")) + 1)))
    val shipsBinned = ships.withColumn("wk", week(col("sd")))
    datesBinned.join(shipsBinned,
        datesBinned("wk") === shipsBinned("wk") &&
          col("sd") >= col("d") && col("sd") < date_add(col("d"), 7))
      .groupBy("d")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("d")
  }

  /** §2.C sketches: HLL-based approximate distinct counts per group (the
    * scale path for cardinality at 100 TB — constant memory per group,
    * mergeable across partitions). The sketch estimate itself is
    * engine-specific, so it is NOT an output column; instead `sketch_ok`
    * asserts the sketch's accuracy contract (within 5% of the exact count,
    * rsd=0.02 → ~3σ) and the oracle asserts the exact columns plus a literal
    * TRUE — a full hash-checked oracle for a sketch query.
    */
  def q37ApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("_approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .withColumn("sketch_ok",
        abs(col("_approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05)
      .drop("_approx_users")
      .orderBy("event_type")

  /** §2.C: CUBE — all grouping-set combinations of (returnflag, linestatus).
    * Plain-table cube (no join upstream), so the Dataset API is safe from
    * the Spark 4.1 cube-after-join analyzer false positive (q10/q33 note).
    */
  def q43Cube(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** §2.C set ops: INTERSECT (the companion leg to q36's EXCEPT) — BUILDING
    * customers who are also big spenders. Spark plans INTERSECT as a
    * left-semi join after aggregation: no full-row comparison shuffle.
    */
  def q44Intersect(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bigSpenders = orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(bigSpenders)
      .orderBy("c_custkey")
  }

  /** Session gap for [[q45Sessionize]]: a new session starts after 30 min
    * of inactivity (the classic web-analytics rule; same constant as the
    * streaming sessionizer in StreamOps).
    */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** §2.C windows: batch sessionization — per-user gap-based session
    * assignment via lag + running sum, then session-level aggregation.
    * The training-data shape: turning raw event streams into bounded
    * interaction sessions.
    *
    * Scale: ONE shuffle on user_id for the window; the follow-up
    * groupBy(user_id, sess) reuses it (hash-partitioning on user_id
    * satisfies the clustered distribution of the superset key, so Catalyst
    * plans no second exchange). Gap math is epoch-millis (exact — events.ts
    * is whole microseconds).
    */
  def q45Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
    val newSession =
      when(gapMs.isNull || gapMs > SessionGapMs, 1L).otherwise(0L)
    events(s, d)
      .withColumn("sess", sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"))
      .orderBy("user_id", "sess")
  }

  /** §2.C windows: rolling 7-day revenue/order-count via a RANGE-frame
    * window over day numbers. The window is ordered globally WITHOUT a
    * partition key — safe at any corpus scale because it runs over the
    * per-day aggregate, whose cardinality is bounded by the calendar
    * (~365 rows/year), not by the fact table; the corpus-sized work is the
    * partial-aggregated groupBy upstream.
    */
  def q50MovingAvg(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum("o_totalprice").as("rev_raw"), count(lit(1)).as("n"))
      .withColumn("dn", datediff(col("d"), to_date(lit("1970-01-01"))))
    val w = Window.orderBy("dn").rangeBetween(-6, 0)
    daily
      .withColumn("rev7", round(sum("rev_raw").over(w), 2))
      .withColumn("n7", sum("n").over(w))
      .select(col("d"), round(col("rev_raw"), 2).as("rev"), col("n"),
        col("rev7"), col("n7"))
      .orderBy("d")
  }

  /** §2.C subqueries: uncorrelated scalar subquery — orders above the global
    * average price, aggregated by priority. Catalyst plans the subquery as
    * its own stage whose single-row result feeds the main scan's filter
    * (no join, no per-row re-evaluation); the EXISTS/NOT EXISTS correlated
    * forms are covered by q04/q05's semi/anti joins.
    */
  def q51ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_above,
           round(min(o_totalprice), 2) AS min_above
         FROM orders_v
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  /** §2.C aggregations: FILTER-clause conditional aggregation (ANSI
    * `agg(...) FILTER (WHERE ...)`) — compiles to the same partial-agg
    * shape as plain aggregates (the predicate folds into the agg buffer
    * update, no extra scan or join).
    */
  def q52FilteredAgg(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
             AS disc_rev,
           count(*) AS n
         FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** §2.C aggregations: deterministic ordered string aggregation — per
    * customer, the sorted comma-joined list of their order keys (Spark's
    * collect_list is order-nondeterministic, so sort_array makes it
    * deterministic and engine-portable).
    *
    * Scale caveat: unlike every other aggregate in this file, collect_list
    * state grows with the GROUP size, not O(1) — safe here because
    * orders-per-customer is naturally bounded; for unbounded or hot keys
    * use slice(sort_array(collect_list(...)), 1, k) to cap the state, or a
    * window top-k instead.
    */
  def q53StringAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_custkey") % 100 === 0)
      .groupBy("o_custkey")
      .agg(
        concat_ws(",",
          sort_array(collect_list(col("o_orderkey")))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** §2.C windows: lag/lead offset frames — per-user previous/next event
    * value and the step delta (the change-detection primitive next to q50's
    * RANGE frame). Both offsets and the delta share one window sort, so the
    * whole query is a single shuffle on user_id.
    */
  def q54LagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"),
        round(lag("value", 1).over(w), 2).as("prev_value"),
        round(lead("value", 1).over(w), 2).as("next_value"),
        round(col("value") - coalesce(lag("value", 1).over(w), col("value")),
          2).as("delta"))
      .orderBy("event_id")
  }

  /** §2.C reshaping: unpivot/melt — the inverse of q34's pivot, turning the
    * per-status measure columns into (measure, val) rows via Spark's native
    * `unpivot` (an Expand node: map-side row replication, no shuffle beyond
    * the feeding aggregate).
    */
  def q55Unpivot(s: SparkSession, d: String): DataFrame = {
    val base = lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(sum("l_discount"), 2).as("sum_disc"))
    base.unpivot(Array(col("l_linestatus")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "val")
      .orderBy("l_linestatus", "measure")
  }

  /** §2.C subqueries: CORRELATED scalar subquery (per-row dependent
    * aggregate) next to q51's uncorrelated one — orders beating 1.5× their
    * own customer's average. Written as real subquery SQL so Catalyst's
    * decorrelation kicks in: the optimizer rewrites it to one aggregate on
    * o_custkey + an equi-join, i.e. the per-row re-evaluation a naive
    * engine would do never happens, at any scale.
    */
  def q56CorrelatedSub(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_q56")
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders_q56 o
         WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                               FROM orders_q56 o2
                               WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""")
  }

  /** §2.C windows: the rank family — rank, dense_rank, percent_rank,
    * ntile, cume_dist over one per-user ordering. All five share a single
    * window sort, so the query is one user_id shuffle regardless of how
    * many rank flavors ride it. Ratio outputs are floor-truncated (not
    * rounded) for engine-exact parity on int/int rationals.
    */
  def q62RankFamily(s: SparkSession, d: String): DataFrame = {
    def trunc4(c: Column): Column = floor(c * 10000) / 10000
    val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
    events(s, d)
      .filter(col("user_id") % 20 === 0)
      .select(col("event_id"), col("user_id"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        trunc4(percent_rank().over(w)).as("prnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        trunc4(cume_dist().over(w)).as("cdist"))
      .orderBy("event_id")
  }

  /** §2.C scalar lib: calendar bucketing — date_trunc-to-week rollup with
    * extracted date parts (ISO weekday, hour). The time-dimension
    * aggregation shape every event pipeline runs; one partial-agg shuffle
    * on the truncated key.
    */
  def q63DateTrunc(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        to_date(date_trunc("week", col("ts"))).as("week_start"),
        weekday(col("ts")).cast("long").as("iso_dow"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("week_start", "iso_dow")

  /** §2.C sketches: heavy hitters (approximate frequent items) — the
    * skew-detection primitive (find the hot keys before they melt a join).
    * Exact side: one partial-aggregated groupBy + a scalar total via a
    * broadcast single-row aggregate. Sketch side: an explicit
    * [[MisraGries]] typed Aggregator (k = 1/support counters) whose
    * contract — every item with frequency > support IS returned — is
    * asserted in-row as `sketch_ok`, same oracle pattern as q37/q42.
    * Unlike `stat.freqItems` (which runs an aggregate action EAGERLY at
    * DataFrame-construction time, outside any bench's timed region), the
    * whole query here is lazy: the sketch is an ordinary one-row aggregate
    * in the same job.
    */
  def q49HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val support = 0.05
    val mg = udaf(new MisraGries(math.ceil(1.0 / support).toInt),
      org.apache.spark.sql.Encoders.STRING)
    val sketch = ev.agg(mg(col("event_type")).as("mg_items"))
    // persist(): totals feeds both the main plan and the single-row total
    // aggregate — without it the events scan + groupBy subtree runs twice
    // (same recompute pattern as the v41 codebook)
    val totals = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .persist()
    totals
      .crossJoin(broadcast(totals.agg(sum("cnt").as("total"))))
      .filter(col("cnt") * 1.0 / col("total") > support)
      .crossJoin(broadcast(sketch))
      .select(col("event_type"), col("cnt"),
        array_contains(col("mg_items"), col("event_type"))
          .as("sketch_ok"))
      .orderBy("event_type")
  }

  /** §2.C sketches: quantile sketch (approx_percentile / KLL-style) next to
    * the exact percentile of q32 — the 100 TB path for quantiles, since exact
    * percentile state is O(distinct values) per group while the sketch is
    * bounded by the accuracy parameter and mergeable across partitions.
    * Like q37, the engine-specific sketch values are validated in-row against
    * the exact percentiles (within 1%) and surfaced as `sketch_ok`, so the
    * oracle hash-checks the exact columns plus a literal TRUE.
    */
  def q42QuantileSketch(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("_p50_sketch"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_exact"),
        expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("_p95_sketch"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_exact"),
        count(lit(1)).as("n"))
      .withColumn("sketch_ok",
        abs(col("_p50_sketch") - col("p50_exact")) <= col("p50_exact") * 0.01 &&
          abs(col("_p95_sketch") - col("p95_exact")) <= col("p95_exact") * 0.01)
      .drop("_p50_sketch", "_p95_sketch")
      .orderBy("l_returnflag")

  /** q06's top-3-per-customer re-expressed through the k-bounded
    * [[TopKByValue]] aggregator: identical result, different physical
    * contract. The window form shuffles every order row and sorts per
    * customer; this form partial-aggregates map-side, so at most k entries
    * per (customer, partition) reach the shuffle — O(groups × k) wire
    * volume instead of O(rows), and no full per-group sort. The plan shows
    * ObjectHashAggregate(partial) → exchange → ObjectHashAggregate(final)
    * with no Window/Sort over the fact table (asserted in
    * TrainingPipelineOpsSpec).
    */
  /** The salted fact-fact join under the correctness gate: lineitem⋈orders
    * through [[Skew.saltedJoin]] (hot order keys spread over 8 salt values,
    * right side replicated per salt), aggregated to order-priority revenue.
    * The oracle is the PLAIN join — salting must be result-invisible, and
    * hash-checking it here proves the replication/drop bookkeeping exact
    * rather than "close".
    */
  def q77SaltedJoin(s: SparkSession, d: String): DataFrame = {
    // shuffle_hash on both sides: salting only matters for shuffle joins
    // (a broadcast join has no reducer to overload), and the hint keeps the
    // demonstrated plan the one a fact-fact join gets at 100 TB — a
    // ShuffledHashJoin on (salt, key), never a sort-merge
    val l = lineitem(s, d).select(col("l_orderkey").as("okey"),
      col("l_extendedprice"), col("l_discount")).hint("shuffle_hash")
    val r = orders(s, d).select(col("o_orderkey").as("okey"),
      col("o_orderpriority")).hint("shuffle_hash")
    Skew.saltedJoin(l, r, "okey", salt = 8)
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Mergeable sketch states — the property that makes sketches THE 100 TB
    * distinct-count path: per-shard HLL sketches (hll_sketch_agg) union into
    * one (hll_union_agg) whose estimate must land within 5% of the exact
    * count, asserted in-row like q37/q42 so the engine-specific sketch bytes
    * never reach the oracle compare. At scale the shards are partitions or
    * daily increments; the union replaces any re-scan of history.
    */
  def q78SketchMerge(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("shard", pmod(col("event_id"), lit(2L)))
    val shards = ev.groupBy("shard")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = shards
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    ev.agg(countDistinct(col("user_id")).as("exact_users"))
      .crossJoin(broadcast(merged))
      .select(col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * 0.05).as("sketch_ok"))
  }

  /** §2.C events analytics: the conversion-WINDOW funnel — q108's strict
    * ordering plus the bound every real attribution model adds: a step
    * only converts within `windowDays` of the previous step (a purchase a
    * month after the click is organic, not funnel conversion). Same
    * single-exchange plan as q108 — the window bound is one more
    * comparison inside each step's `when`, free at any scale.
    */
  def q115WindowedFunnel(s: SparkSession, d: String,
      windowDays: Int = 7): DataFrame =
    funnelCounts(funnelStaged(events(s, d),
      window = Some(expr(s"INTERVAL $windowDays DAYS"))))

  /** Scale-safe EXACT group percentiles — the t94 histogram-order-statistic
    * technique promoted to a first-class relational operator, and the
    * answer to "exact `percentile` materializes every distinct value in
    * ONE aggregation buffer" (the q32 shape, fine for conformance, fatal
    * at 10^9 rows): pass 1 is a partial-aggregable (group, value)
    * histogram; the cumulative walk runs over THAT bounded table
    * (partitioned per group, ordered by value); the cut is the smallest
    * value whose cumulative count reaches the integer rank
    * ceil(p·n) — computed in INTEGER arithmetic ((p_num·n + p_den − 1)
    * div p_den), never float (0.9·n in binary floats lands just above the
    * integer for n divisible by 10, and ceil then overshoots by one — the
    * classic off-by-one this formulation exists to avoid).
    *
    * Scale: the only corpus-sized stage is the histogram groupBy
    * (mergeable). The window runs over distinct (group, value) pairs —
    * for discrete measures like quantity that is thousands of rows at ANY
    * corpus size; for continuous measures, quantize first (the t94
    * convention) and the same bound holds.
    */
  def q116GroupPercentile(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val cum = hist.withColumn("cum", sum("cnt").over(byFlag))
      .withColumn("n", sum("cnt").over(Window.partitionBy("l_returnflag")))
    // integer ranks: ceil(n/2) = (n+1) div 2, ceil(9n/10) = (9n+9) div 10
    cum
      .groupBy(col("l_returnflag"), col("n"))
      .agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("l_quantity")))
          .as("p50"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("l_quantity")))
          .as("p90"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        col("p50"), col("p90"))
      .orderBy("l_returnflag")
  }

  /** Count-Min frequency sketch under the correctness gate — q78's
    * mergeable-summaries story for FREQUENCIES: one pass builds the 32 KiB
    * sketch (typed Aggregator, pointwise-add merge → per-shard partials
    * union without re-scans), then the 10 hottest keys' estimates are
    * checked in-row against their exact counts (the q37/q42/q78
    * convention — `sketch_ok` asserts the CMS guarantee
    * exact ≤ est ≤ exact + 3N/W, so the engine-specific counter bytes
    * never reach the oracle). Build and probe share ONE xxhash64
    * expression ([[CountMin]]'s Bloom-style discipline).
    *
    * Scale: at 100 TB the exact per-key groupBy here exists only to GRADE
    * the sketch; the production read is sketch-only — point frequency
    * estimates from 32 KiB of mergeable state per shard, the companion of
    * q49's Misra-Gries (MG finds WHICH keys are hot; CMS answers HOW hot
    * any key is). The hot-key scan is TakeOrderedAndProject (k-bounded),
    * and the 10-row verdict join is a broadcast of the one-row sketch.
    */
  def q114CountMin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"))
    val h = xxhash64(col("user_id"))
    val cmAgg = udaf(new CountMinAgg,
      org.apache.spark.sql.Encoders.scalaLong)
    val sketch = ev.agg(cmAgg(h).as("st"), count(lit(1)).as("n_total"))
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(10)
    top.crossJoin(broadcast(sketch))
      // bind the estimate once via a projection: both bound checks then
      // read one computed column instead of re-expanding the 4-probe
      // least() tree (and its xxhash64) on each side of the &&
      .withColumn("est", CountMin.estimate(col("st"), h))
      .select(col("user_id"), col("exact_cnt"),
        (col("est") >= col("exact_cnt") &&
          col("est") <= col("exact_cnt") +
            (col("n_total") * 3 / lit(CountMin.W)).cast("long"))
          .as("sketch_ok"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  def q73TopKAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new TopKByValue(3),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
    orders(s, d)
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("topk"))
      .select(col("o_custkey"), posexplode(col("topk")))
      .select(col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** The shared week bucketing of the retention family — integer
    * day-offset from the corpus epoch divided by 7. Single source of truth
    * for q107 (one-shot), d113 (batch-incremental), and
    * [[graft.streaming.StreamOps.retentionStream]] (streaming sink), so
    * the three forms can never bucket a timestamp differently; the DuckDB
    * oracle mirrors it as `floor((CAST(ts AS DATE) - DATE '2024-01-01')
    * / 7.0)` — floor, NOT DuckDB's integer `//` (which truncates toward
    * zero), so a pre-epoch timestamp buckets identically on both sides
    * (floor(-1/7) = -1 in both; `(-1) // 7` would be 0).
    */
  def retentionWeek(ts: Column): Column =
    floor(datediff(to_date(ts), to_date(lit("2024-01-01"))) / 7).cast("long")

  /** The retention matrix from a distinct (user_id, wk) activity table —
    * the shared tail of q107/d113/the streaming sink's reader: cohort
    * anchor as a window min over the user-bounded state, then the
    * calendar-bounded rollup.
    */
  def retentionMatrixFrom(act: DataFrame): DataFrame =
    act
      .withColumn("cohort_week",
        min("wk").over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")

  /** §2.C events analytics: weekly retention cohorts — the classic
    * product-analytics matrix (cohort week of first activity × week offset →
    * distinct active users). Weeks are integer day-offsets from the corpus
    * epoch divided by 7, so the bucketing is exact integer math the oracle
    * reproduces bit-for-bit.
    *
    * Scale: the corpus-sized work is the (user_id, week) distinct — one
    * partial-aggregated exchange whose output cardinality is bounded by
    * users×weeks, orders of magnitude below raw events. The cohort anchor
    * is a window min over THAT reduced table (one user_id exchange, no
    * join back), and the final matrix groupBy is calendar-bounded
    * (weeks²). No window ever touches raw events, nothing non-mergeable.
    */
  def q107RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val act = events(s, d)
      .select(col("user_id"), retentionWeek(col("ts")).as("wk")).distinct()
    retentionMatrixFrom(act)
  }

  /** Batch-incremental retention — the d113 query, extending the
    * incremental matrix (document d84 / component d91 / cluster d92 / URL
    * d101 / perceptual-hash d104+d111) to the ANALYTICS family. The whole
    * state of a retention computation is the distinct (user_id, week)
    * activity set — idempotent under union-distinct, so each ingest batch
    * contributes its own O(batch) partial and the merge is one
    * partial-aggregable distinct; the cohort anchor (per-user min week)
    * derives from the merged state, never from raw history. Two halves of
    * the events stream are ingested as separate batches; the matrix built
    * from the merged state must reproduce the one-shot
    * [[q107RetentionCohorts]] bit for bit — the oracle IS q107's SQL.
    *
    * Scale: per batch, ONE partial-aggregated distinct over the batch's
    * events; the cross-batch merge shuffles only the compact
    * user×week-bounded state (idempotence absorbs re-delivered events —
    * the exactly-once-free property that makes this the production shape
    * for daily retention rollups). Nothing re-reads prior batches.
    */
  def d113IncrementalRetention(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .select(col("user_id"), retentionWeek(col("ts")).as("wk"),
        col("event_id"))
    val b1 = base.filter(col("event_id") % 2 === 0)
    val b2 = base.filter(col("event_id") % 2 === 1)
    def actState(b: DataFrame): DataFrame =
      b.select("user_id", "wk").distinct()
    def mergeState(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b).distinct()
    retentionMatrixFrom(mergeState(actState(b1), actState(b2)))
  }

  /** §2.C events analytics: ordered conversion funnel
    * view → click-after-view → purchase-after-click, counted over users.
    * Step k's timestamp is the earliest qualifying event STRICTLY after step
    * k-1's — the standard ordered-funnel semantics (an early purchase before
    * any view does not count).
    *
    * Scale: ONE exchange on user_id; the three step columns are window mins
    * over the same partition spec, so Catalyst chains Window operators on a
    * single sort with no further shuffle (each step's `when` reads the
    * previous step's per-partition constant). The per-user collapse reuses
    * the same partitioning (groupBy on the partition key → no new
    * exchange), and the final count is a single partial-aggregated scalar.
    */
  def q108Funnel(s: SparkSession, d: String): DataFrame =
    funnelCounts(funnelStaged(events(s, d), window = None))

  /** The funnel's per-user step timestamps over any (user_id, event_type,
    * ts) frame — the single source of truth for q108 (unbounded), q115
    * (conversion-window bound) and the spec's synthetic-corpus ordering
    * test, so the strict-ordering semantics exist in exactly one place.
    * Step k's timestamp is the earliest qualifying event STRICTLY after
    * step k-1's, optionally within `window` of it.
    */
  def funnelStaged(ev: DataFrame, window: Option[Column]): DataFrame = {
    val w = Window.partitionBy("user_id")
    def within(prev: Column): Column =
      window.map(b => col("ts") <= prev + b).getOrElse(lit(true))
    ev
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view") &&
          within(col("t_view")), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_click") && within(col("t_click")),
          col("ts"))).over(w))
  }

  /** Collapse [[funnelStaged]] to the 3-counter funnel row. */
  private def funnelCounts(staged: DataFrame): DataFrame =
    staged
      .groupBy("user_id")
      .agg(first("t_view").as("t_view"), first("t_click").as("t_click"),
        first("t_purchase").as("t_purchase"))
      .agg(
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_click").isNotNull, 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_purchase").isNotNull, 1L).otherwise(0L))
          .as("n_view_click_purchase"))
}
