package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariant specs for the round-5 operators (q54-q56, d57, t58, t59, v60,
  * v61). Exact-value correctness is covered by the DuckDB oracle gate
  * (scripts/check.py); these assert the semantic contracts that a hash
  * compare alone would not explain if broken.
  */
class Round5OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q54 lag/lead: first event per user has null prev and zero delta") {
    val df = Relational.q54LagLead(spark, sf).cache()
    val firsts = df.filter(col("prev_value").isNull)
    assert(firsts.count() > 0)
    // delta is defined as value - coalesce(lag, value) => 0.0 on firsts
    assert(firsts.filter(col("delta") =!= 0.0).count() == 0)
    // every user contributes exactly one null-prev (its first event)
    val users = df.select("user_id").distinct().count()
    assert(firsts.count() == users)
    df.unpersist()
  }

  test("q55 unpivot: three measure rows per status, values round-trip") {
    val df = Relational.q55Unpivot(spark, sf)
    val perStatus = df.groupBy("l_linestatus").count().collect()
    assert(perStatus.nonEmpty)
    assert(perStatus.forall(_.getLong(1) == 3L))
    // unpivoted sum_qty value equals the direct aggregate
    val direct = graft.Tables.lineitem(spark, sf)
      .groupBy("l_linestatus").agg(round(sum("l_quantity"), 2).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val melted = df.filter(col("measure") === "sum_qty")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(melted == direct)
  }

  test("q56 correlated subquery: every row beats 1.5x its customer average") {
    val result = Relational.q56CorrelatedSub(spark, sf)
    val avgs = graft.Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(avg("o_totalprice").as("cavg"))
    val violations = result.join(avgs, "o_custkey")
      .filter(col("price") <= col("cavg") * 1.5 - 0.01)
    assert(result.count() > 0)
    assert(violations.count() == 0)
  }

  test("d57 passage dedup: groups span >=2 docs and occurrences cover docs") {
    val df = TextOps.d57PassageDedup(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_docs") < 2).count() == 0)
    assert(df.filter(col("n_occ") < col("n_docs")).count() == 0)
    df.unpersist()
  }

  test("t58 source stats: doc counts partition the corpus") {
    val df = TextOps.t58SourceStats(spark, sf)
    val total = df.agg(sum("n_docs")).head().getLong(0)
    assert(total == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("min_chars") > col("max_chars")).count() == 0)
  }

  test("t59 gopher filter: keep is the conjunction of the rules") {
    val df = TextOps.t59GopherFilter(spark, sf).cache()
    val bad = df.filter(col("keep") =!=
      (col("rule_wc") && col("rule_mwl") && col("rule_stop") &&
        col("rule_rep") && col("rule_2g") && col("rule_3g") &&
        col("rule_4g") && col("rule_bullet") && col("rule_ellipsis") &&
        col("rule_alpha") && col("rule_symbol")))
    assert(bad.count() == 0)
    // top_cnt agrees with t47's groupBy-free repetition scan
    val t47 = TextOps.t47Repetition(spark, sf)
      .select(col("doc_id"), col("top_cnt").as("t47_top"))
    assert(df.join(t47, "doc_id")
      .filter(col("top_cnt") =!= col("t47_top")).count() == 0)
    df.unpersist()
  }

  test("v60 kmeans: full-dimensional centroids, occupancy sums to corpus") {
    val df = VectorOps.v60Kmeans(spark, sf).cache()
    val dims = df.groupBy("cid").count().collect()
    assert(dims.nonEmpty && dims.forall(_.getLong(1) == VectorOps.Dim.toLong))
    // n_vecs is constant per cid; summed over distinct cids = corpus size
    val total = df.select("cid", "n_vecs").distinct()
      .agg(sum("n_vecs")).head().getLong(0)
    assert(total == graft.Tables.embeddings(spark, sf).count())
    df.unpersist()
  }

  test("q62 rank family: ranks are consistent within each user partition") {
    val df = Relational.q62RankFamily(spark, sf).cache()
    assert(df.count() > 0)
    // dense_rank never exceeds rank; cume_dist and percent_rank in [0,1]
    assert(df.filter(col("drnk") > col("rnk")).count() == 0)
    assert(df.filter(col("prnk") < 0 || col("prnk") > 1).count() == 0)
    assert(df.filter(col("cdist") <= 0 || col("cdist") > 1).count() == 0)
    assert(df.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    // per user, max rank equals the row count of that partition
    val bad = df.groupBy("user_id")
      .agg(max("rnk").as("mr"), count(lit(1)).as("n"))
      .filter(col("mr") =!= col("n"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("q63 date_trunc: week buckets cover all events, weekday in range") {
    val df = Relational.q63DateTrunc(spark, sf).cache()
    val total = df.agg(sum("n")).head().getLong(0)
    assert(total == graft.Tables.events(spark, sf).count())
    assert(df.filter(col("iso_dow") < 0 || col("iso_dow") > 6).count() == 0)
    // week_start is always a Monday (weekday 0)
    assert(df.filter(weekday(col("week_start")) =!= 0).count() == 0)
    df.unpersist()
  }

  test("v64 pq ann: top-3 per query, codes compress, scores descend") {
    val df = VectorOps.v64PqAnn(spark, sf).cache()
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L))
    // rnk 1..3, approx_r non-increasing within a query
    val w = df.select("query_id", "rnk", "approx_r").collect()
      .groupBy(_.getLong(0))
    w.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.sliding(2).forall(p =>
        p.head.getDouble(2) >= p.last.getDouble(2)))
    }
    df.unpersist()
  }

  test("t65 clean pipeline: kept is the conjunction, stages agree with parts") {
    val df = TextOps.t65CleanPipeline(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("kept") =!=
      (col("keep_quality") && col("keep_exact") && col("keep_neardup")))
      .count() == 0)
    // keep_quality agrees with t59's keep verdict
    val t59 = TextOps.t59GopherFilter(spark, sf)
      .select(col("doc_id"), col("keep"))
    assert(df.join(t59, "doc_id")
      .filter(col("keep_quality") =!= col("keep")).count() == 0)
    // something must survive and something must be dropped at sf0.001
    assert(df.filter(col("kept")).count() > 0)
    df.unpersist()
  }

  test("t66 hash split: stable buckets, splits partition the corpus") {
    val df = TextOps.t66HashSplit(spark, sf).cache()
    assert(df.count() == graft.Tables.documents(spark, sf).count())
    assert(df.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    val bad = df.filter(
      (col("bucket") < 80 && col("split") =!= "train") ||
        (col("bucket") >= 80 && col("bucket") < 90 &&
          col("split") =!= "valid") ||
        (col("bucket") >= 90 && col("split") =!= "test"))
    assert(bad.count() == 0)
    // deterministic: re-running assigns identical splits
    val again = TextOps.t66HashSplit(spark, sf)
      .withColumnRenamed("split", "split2").select("doc_id", "split2")
    assert(df.join(again, "doc_id")
      .filter(col("split") =!= col("split2")).count() == 0)
    df.unpersist()
  }

  test("t67 decontaminate: benchmark docs excluded, flag matches threshold") {
    val df = TextOps.t67Decontaminate(spark, sf).cache()
    assert(df.filter(col("doc_id") < 10).count() == 0)
    assert(df.filter(col("n_shared") > col("n_sh")).count() == 0)
    assert(df.filter(col("contaminated") =!=
      (col("n_shared") * 5 >= col("n_sh"))).count() == 0)
    df.unpersist()
  }

  test("v61 array hof: per-vector profile matches a driver-side recompute") {
    val df = VectorOps.v61ArrayHof(spark, sf)
    val row = df.filter(col("vec_id") === 0).head()
    val vec = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(1) == r4(math.sqrt(vec.map(x => x * x).sum)))
    assert(row.getDouble(2) == r4(vec.max))
    assert(row.getLong(3) == vec.count(_ > 0).toLong)
    assert(row.getDouble(4) == r4(vec.sum / vec.size))
  }
}
