package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * All queries go through here so the scan is a plain parquet read that
  * Catalyst can push filters/projections into (verify via
  * `.explain("formatted")`: PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so branch on the type
    * Spark actually observes rather than assuming either:
    *
    *  - NANOS: Spark's vectorized reader rejects it; with
    *    `nanosAsLong` set (below) it surfaces as LongType. Convert with
    *    integral `div`, NOT `/`: `/` is double division, and epoch nanos
    *    (~1.7e18) exceed double's 2^53 mantissa — the rounding shifts some
    *    timestamps by ±1 microsecond, which flips millisecond boundaries.
    *    The generator emits whole-microsecond values, so `div 1000` is
    *    lossless.
    *  - MICROS: surfaces as TIMESTAMP_NTZ; a plain cast to session-local
    *    TimestampType is wall-clock-exact under the UTC session timezone —
    *    the same instants DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        // fail loudly on a third testdata generation (e.g. string or INT96):
        // a blind cast would coerce to nulls/garbage and ship a silently-bad
        // artifact — the round-8 failure mode this reader exists to prevent
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other; expected " +
            "LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP — extend " +
            "Tables.events with an explicit lossless conversion for it")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
