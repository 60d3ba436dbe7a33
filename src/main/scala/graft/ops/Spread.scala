package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Floor a CPU-dense map stage's parallelism at the session's core count.
  *
  * Parquet scan splits are floored at `spark.sql.files.openCostInBytes`
  * (4 MB), so a small input file arrives as 1-3 partitions regardless of
  * core count — and every stage BEFORE the first exchange (payload
  * synthesis + codec decode, tokenize/shingle/hash partial aggregation)
  * then runs on one or two cores while the rest of the machine idles
  * (guide §2.5, input skew: "one huge unsplittable file … repartition
  * immediately after the read"; measured at sf0.1/local[32]: the image
  * hash pass 3.7 s → 0.5 s, the MJPEG frame decode 6.6 s → 0.9 s).
  *
  * The repartition is CONDITIONAL on the input actually scanning narrower
  * than the session's default parallelism, so at production scale — where
  * the corpus arrives as thousands of splits — it never fires and plans
  * are unchanged; when it fires, the bytes moved are the pre-explosion
  * input rows (ids + text), the cheapest point in the pipeline to move
  * them. Partitioning is BY KEY (hash), not round-robin: deterministic
  * row placement under retries, and no sort-before-repartition tax
  * (guide §2.5 on keyless repartition). Downstream per-key aggregations
  * on the same key reuse the partitioning, eliding their own exchange.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}
