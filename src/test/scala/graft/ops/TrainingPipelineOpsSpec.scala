package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariant specs for the third round-5 batch (t68 NFC normalize, t69
  * sequence packing, t70 stratified sampling, t71 TF-IDF top-terms). Exact
  * values are covered by the DuckDB oracle gate; these assert the semantic
  * contracts a hash compare alone would not explain if broken.
  */
class TrainingPipelineOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t68 nfc: odd (decomposed) docs change, even (composed) don't") {
    val df = TextOps.t68NfcNormalize(spark, sf).cache()
    assert(df.filter(col("doc_id") % 2 === 1 && !col("changed")).count() == 0)
    assert(df.filter(col("doc_id") % 2 === 0 && col("changed")).count() == 0)
    // NFC removes exactly the 3 combining marks of the decomposed suffix
    assert(df.filter(col("doc_id") % 2 === 1 &&
      col("n_norm") =!= col("n_raw") - 3).count() == 0)
    assert(df.filter(col("doc_id") % 2 === 0 &&
      col("n_norm") =!= col("n_raw")).count() == 0)
    // the normalization stays inside whole-stage codegen (native expression,
    // no UDF/eval boundary)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"nfc path fell out of codegen:\n$plan")
    df.unpersist()
  }

  test("t69 packing: offsets bounded, streams contiguous per shard") {
    val df = TextOps.t69PackSequences(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("pack_offset") < 0 ||
      col("pack_offset") >= 512).count() == 0)
    // each shard's first doc starts pack 0 at offset 0
    val firsts = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("pack_id") =!= 0 ||
      col("pack_offset") =!= 0).count() == 0)
    // the packing is gap-free: total tokens per shard == last start + last n
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      .orderBy(col("doc_id").desc)
    val lastRows = df
      .withColumn("start_tok", col("pack_id") * 512 + col("pack_offset"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("shard"), (col("start_tok") + col("n_tokens")).as("end_tok"))
    val totals = df.groupBy("shard").agg(sum("n_tokens").as("tot"))
    assert(lastRows.join(totals, "shard")
      .filter(col("end_tok") =!= col("tot")).count() == 0)
    df.unpersist()
  }

  test("t69 plan: the packing window partitions by shard, not globally") {
    val df = TextOps.t69PackSequences(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // a global-stream formulation would show an empty partition spec and
    // move the corpus through one task — the 100 TB failure mode
    assert(plan.contains("windowspecdefinition(shard"),
      s"packing window is not shard-partitioned:\n$plan")
  }

  test("t71 plan: vocabulary join shuffles on term, no cartesian blowup") {
    val df = TextOps.t71TfidfTopTerms(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"tfidf planned a cartesian product:\n$plan")
    // the only nested-loop join allowed is the single-row N broadcast
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }

  test("t70 stratified sample: kept rows obey their stratum rate") {
    val df = TextOps.t70StratifiedSample(spark, sf).cache()
    assert(df.filter(col("bucket") >= col("rate")).count() == 0)
    // non-downsampled strata are kept in full
    val langs = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langs.keys.filterNot(l => l == "en" || l == "zh").foreach { l =>
      assert(kept.getOrElse(l, 0L) == langs(l), s"stratum $l not kept whole")
    }
    // downsampled strata actually shrank (md5 buckets spread uniformly
    // enough that a 40% rate cannot retain everything)
    assert(kept.getOrElse("en", 0L) < langs("en"))
    df.unpersist()
  }

  test("q73 topk aggregator: matches the window form, plans as partial agg") {
    val viaAgg = Relational.q73TopKAgg(spark, sf)
    val viaWindow = Relational.q06WindowTopN(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    // identical rows (q06 selects the same four columns, different order)
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
    // the scale contract: partial ObjectHashAggregate before the exchange,
    // no Window/Sort over the full fact table
    viaAgg.count()
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"aggregator did not plan as object hash aggregate:\n$plan")
    assert("partial_topkbyvalue".r.findFirstIn(plan.toLowerCase).isDefined,
      s"no partial (map-side) aggregation in plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }

  test("v74 scalar quant: full uint8 range used, error bounded by half-step") {
    val df = VectorOps.v74ScalarQuant(spark, sf).cache()
    assert(df.count() > 0)
    // the per-vector min/max endpoints map to code 0 and 255 by construction
    assert(df.filter(col("code_min") =!= 0 || col("code_max") =!= 255)
      .count() == 0)
    // mid-bucket dequantization: error can never exceed one bucket width
    val bad = df.filter(
      col("max_err4") > (col("hi4") - col("lo4")) / 255 + 0.0002)
    assert(bad.count() == 0)
    assert(df.filter(col("mean_err4") > col("max_err4")).count() == 0)
    // map-only: no aggregation/join shuffle (the only exchange allowed is
    // the final deterministic ORDER BY's range partitioning)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"v74 shuffled:\n$plan")
    df.unpersist()
  }

  test("q77 salted join is result-identical to the plain join") {
    val salted = Relational.q77SaltedJoin(spark, sf)
    val plain = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("q78 merged shard sketches estimate within the asserted bound") {
    val r = Relational.q78SketchMerge(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(r.getBoolean(1), "merged HLL estimate drifted beyond 5%")
  }

  test("v76 matryoshka recall: bounded by k, matches a window recomputation") {
    val df = VectorOps.v76MatryoshkaRecall(spark, sf).cache()
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 10 && rows.values.forall(v => v >= 0 && v <= 10))
    // cross-check one query against the independent window formulation
    val emb = graft.Tables.embeddings(spark, sf)
    val qv = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val cand = emb.filter(col("vec_id") =!= 0).collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        def cos(n: Int): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0
          for (i <- 0 until n) {
            d += qv(i).toDouble * v(i); na += qv(i).toDouble * qv(i)
            nb += v(i).toDouble * v(i)
          }
          if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
        }
        (r.getLong(0), cos(64), cos(16))
      }
    def top10(key: ((Long, Double, Double)) => Double) =
      cand.sortBy(t => (-key(t), t._1)).take(10).map(_._1).toSet
    val expected = (top10(_._2) intersect top10(_._3)).size.toLong
    assert(rows(0L) == expected, s"recall mismatch: got ${rows(0L)}, want $expected")
    df.unpersist()
  }

  test("t75 collocations: support floor holds, pmi ranking is monotone") {
    val rows = TextOps.t75Collocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (cxy, cx, cy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cxy >= 3, s"support floor violated: $r")
      // a pair cannot occur more often than either of its words
      assert(cx >= cxy && cy >= cxy, s"marginals inconsistent: $r")
    }
    val pmis = rows.map(_.getLong(5))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b },
      "pmi not sorted descending")
  }

  test("t72 mixing: rarest lang kept whole, rates monotone in corpus share") {
    val df = TextOps.t72TempMixing(spark, sf).cache()
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the minimum-count language gets permille 1000 (kept whole, modulo
    // nothing: bucket < 1000 always holds)
    val minLang = rows.minBy(_._2)
    assert(minLang._3 == 1000L && minLang._4 == minLang._2,
      s"rarest stratum not kept whole: $minLang")
    // bigger corpus share => smaller keep rate (temperature flattening)
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, s"rates not monotone: $a $b")
      case _ =>
    }
    // kept counts never exceed originals
    assert(rows.forall(r => r._4 <= r._2))
    df.unpersist()
  }

  test("t71 tfidf: top-3 per doc, scores ranked, idf floor is 100") {
    val df = TextOps.t71TfidfTopTerms(spark, sf).cache()
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
    assert(df.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    // score must be non-increasing with rank inside a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rn")
    val bad = df.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() == 0)
    // df <= N  =>  idf_q = (N*100) div df >= 100
    assert(df.filter(col("idf_q") < 100).count() == 0)
    assert(df.filter(col("score") =!= col("tf") * col("idf_q")).count() == 0)
    df.unpersist()
  }
}
