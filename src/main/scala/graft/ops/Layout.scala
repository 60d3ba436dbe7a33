package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout operators: Z-order (Morton) clustering for multi-column scan
  * pruning — the 100 TB lever the query operators themselves can't pull.
  *
  * Parquet scans prune via per-file/row-group min-max stats, which only cut
  * work when the layout CLUSTERS the filtered columns. A sort on (a, b)
  * clusters a perfectly and b not at all; interleaving the two columns'
  * bits (Morton order) makes files tight in BOTH dimensions, so a
  * two-sided box filter (customer range × date range) skips most files
  * where a single-column sort skips none on the second column. Same recipe
  * production lakehouses ship as `OPTIMIZE ... ZORDER BY`; here it is an
  * ordinary deterministic Column expression + `repartitionByRange` write,
  * nothing engine-private. ZOrderSpec measures the actual file-stat
  * pruning of the written layout, not just the math.
  */
object Layout {

  /** Spread a 16-bit value's bits to the even positions of a 32-bit word
    * (the classic Morton magic-mask chain — four shift/or/mask steps, pure
    * codegen'd integer ops, identical arithmetic in any engine).
    */
  def spread16(v: Column): Column = {
    val v0 = v.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x in even bits, y in odd. */
  def morton16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` Z-ordered on `zval` into `nFiles` range partitions — each
    * output file then covers a tight Morton range, i.e. a tight box in both
    * source dimensions, which is exactly what min-max file skipping needs.
    * `repartitionByRange` samples quantiles so files are even-sized under
    * ANY key skew (a hash layout would interleave the space again).
    */
  def zorderWrite(df: DataFrame, zval: Column, nFiles: Int, path: String): Unit =
    df.withColumn("zval", zval)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)

  /** The oracle-checked face of the layout math: orders keyed by
    * (customer, order-day) Morton code, rolled up per 16-bit Z-region.
    * Hash-matching DuckDB on the region/min/max/count proves the bit
    * interleave — the entire correctness surface of a Z-order — is exact
    * integer arithmetic, so the layout the spec measures is built on
    * checked math rather than an engine-private code.
    *
    * Scale: the z-value is a pure map expression over the scan (no
    * exchange), and the rollup is one partial-aggregated groupBy on a
    * 16-bit key — bounded output regardless of corpus size.
    */
  def q110ZorderLayout(s: SparkSession, d: String): DataFrame = {
    val x = col("o_custkey")
    val y = datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
      .cast("long")
    orders(s, d)
      .select(col("o_orderkey"), morton16(x, y).as("zval"))
      .groupBy(shiftright(col("zval"), 16).as("zregion"))
      .agg(count(lit(1)).as("n_orders"),
        min("zval").as("z_min"), max("zval").as("z_max"))
      .orderBy("zregion")
  }
}
