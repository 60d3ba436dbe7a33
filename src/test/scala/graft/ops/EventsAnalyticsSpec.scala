package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Semantic + executed-plan checks for the events-analytics pair
  * (q107 retention cohorts, q108 ordered funnel) — invariants the DuckDB
  * hash-compare cannot state (monotonicity, plan shape).
  */
class EventsAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q107: cohort sizes at offset 0 cover every user; offsets never exceed the cohort base") {
    val out = Relational.q107RetentionCohorts(spark, sf).persist()
    CacheRegistry.harness.add(out)
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // every user is active in their own cohort week -> offset-0 rows
    // partition the user population exactly
    val base = out.filter(col("week_offset") === 0)
    assert(base.agg(sum("n_users")).head.getLong(0) == nUsers)
    // retention at any later offset is bounded by the cohort's base size
    val joined = out.join(
      base.select(col("cohort_week"), col("n_users").as("base_users")),
      Seq("cohort_week"))
    assert(joined.filter(col("n_users") > col("base_users")).count() == 0)
    // offsets are non-negative (first activity defines the cohort)
    assert(out.filter(col("week_offset") < 0).count() == 0)
    CacheRegistry.harness.release()
  }

  test("q107 plan: no cartesian product, aggregation is partial (map-side combine)") {
    val df = Relational.q107RetentionCohorts(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join shape:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregation:\n$plan")
    CacheRegistry.harness.release()
  }

  test("q108: funnel counts are monotone and bounded by the user population") {
    val row = Relational.q108Funnel(spark, sf).head
    val (v, c, p) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v, $c, $p")
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(v <= nUsers)
    assert(p >= 0)
  }

  test("q108: step ordering is strict — a purchase before the first view never converts") {
    import spark.implicits._
    // user 1: view -> click -> purchase (converts);
    // user 2: purchase, then view -> click (click converts, purchase does not);
    // user 3: click only (no view -> nothing converts)
    val ev = Seq(
      (1L, "view", 1000L), (1L, "click", 2000L), (1L, "purchase", 3000L),
      (2L, "purchase", 500L), (2L, "view", 1000L), (2L, "click", 1500L),
      (3L, "click", 700L)
    ).toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    // the PRODUCTION staged pipeline over the synthetic frame — the test
    // drives the same code q108/q115 run, not a copy
    val staged = Relational.funnelStaged(ev, window = None)
    val agg = staged.groupBy("user_id")
      .agg(first("t_view").as("tv"), first("t_click").as("tc"),
        first("t_purchase").as("tp"))
      .orderBy("user_id").collect()
    assert(agg(0).getAs[Any]("tp") != null)          // user 1 fully converts
    assert(agg(1).getAs[Any]("tc") != null)          // user 2 reaches click
    assert(agg(1).getAs[Any]("tp") == null)          // early purchase ignored
    assert(agg(2).getAs[Any]("tv") == null)          // user 3 never views
  }

  test("q108 plan: one user_id exchange feeds windows and the per-user collapse") {
    val df = Relational.q108Funnel(spark, sf)
    df.collect()
    // AQE's toString prints the plan twice (Final + Initial) — count in the
    // final plan only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val userExchanges = "Exchange hashpartitioning\\(user_id"
      .r.findAllIn(plan).length
    assert(userExchanges == 1,
      s"expected exactly one user_id exchange, got $userExchanges:\n$plan")
    CacheRegistry.harness.release()
  }
}
