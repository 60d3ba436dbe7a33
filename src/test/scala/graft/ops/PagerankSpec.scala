package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** t135 link-graph PageRank invariants (exact values are oracle-checked;
  * this spec pins the properties that must hold at ANY corpus size):
  * probability-mass conservation up to the known truncation loss, the
  * teleport floor, and the deterministic graph construction.
  */
class PagerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mass conserved within truncation loss; teleport floor holds") {
    val out = CacheRegistry.harness.add(
      TextOps.t135LinkPagerank(spark, sf).persist())
    val n = out.count()
    val mass = out.agg(sum("pr")).head.getDouble(0)
    // truncation sites, each losing < 1e-6 of mass per quantized value:
    //  - the rank floor (trunc6): n values at init + per iteration;
    //  - the per-EDGE flow quantization (floor((pr/outdeg)·1e6), the
    //    order-independence fix): ≤ 3n edge terms per iteration, damped
    //    by 0.85 before they reach the rank.
    val maxLoss =
      n * (TextOps.PrIters + 1) * 1e-6 +
        3 * n * TextOps.PrIters * TextOps.PrDamping * 1e-6
    assert(mass <= 1.0 + 1e-9 && mass >= 1.0 - maxLoss,
      s"mass $mass outside [1 - $maxLoss, 1]")
    // every node keeps at least the truncated teleport mass
    val teleportFloor = math.floor(0.15 / n * 1e6) / 1e6
    assert(out.filter(col("pr") < teleportFloor).count() == 0)
    // ranks are NOT uniform: the graph structure concentrates mass
    assert(out.select(countDistinct("pr")).head.getLong(0) > 1)
    CacheRegistry.harness.release()
  }

  test("graph is the deterministic 3-outlink construction") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val n = docs.count()
    // out-degree 2 or 3 for every node (3 minus any dropped self-link);
    // reconstruct the edge rule and check totals line up with N*3 minus
    // self-hits
    val edges = docs.select(col("doc_id").as("src"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("j"))
      .select(col("src"),
        (conv(substring(md5(concat(col("src").cast("string"), lit("#"),
          col("j").cast("string"))), 1, 12), 16, 10).cast("long") % n)
          .as("dst"))
    val selfHits = edges.filter(col("dst") === col("src")).count()
    val kept = edges.filter(col("dst") =!= col("src"))
    assert(kept.count() == n * 3 - selfHits)
    val degrees = kept.groupBy("src").count()
    assert(degrees.filter(col("count") < 2 || col("count") > 3)
      .count() == 0, "out-degree must be 2 or 3")
    assert(degrees.count() == n, "every node must have outlinks")
  }
}
