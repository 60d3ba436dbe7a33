package graft.betfair

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public API of the Spark-native betfair market index — the reference's
  * surface (index/select/columns/size/export/clean/insert; reference
  * betfairdatabase/api.py) re-expressed on Spark SQL.
  *
  * Storage: the index is a parquet directory `.betfairdatabaseindex` at the
  * database root (one row per market, 37-column contract). Mutations write a
  * new snapshot then swap (write-temp-then-rename) — the Spark-native
  * equivalent of SQLite's in-place DELETE/UPDATE (SURVEY.md §7.3).
  */
class BetfairDatabase(spark: SparkSession, databaseDir: String) {

  import BetfairDatabase._

  val indexPath = s"$databaseDir/$IndexDirName"

  private def fs: FileSystem =
    new Path(databaseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def indexExists: Boolean = fs.exists(new Path(indexPath))

  /** A13: build and persist the index. */
  def index(force: Boolean = false): IndexPipeline.Counters = {
    if (indexExists) {
      if (!force) throw new IllegalStateException(
        s"Index already exists in '$databaseDir'.") // IndexExistsError
      fs.delete(new Path(indexPath), true)
    }
    val result = IndexPipeline.build(spark, databaseDir)
    val deduped = result.index
      .dropDuplicates("marketMetadataFilePath", "marketDataFilePath")
    writeSnapshot(deduped)
    result.counters
  }

  def indexDF: DataFrame = {
    if (!indexExists) throw new IllegalStateException(
      s"Betfair database index not found in '$databaseDir'.") // IndexMissingError
    spark.read.schema(Schemas.indexSchema).parquet(indexPath)
  }

  /** A19/B1-B9: projection + raw SQL `where` + limit, mirroring
    * `select(columns, where, limit)` (reference
    * betfairdatabase/database.py:119-157). The where string is Spark SQL,
    * which covers the reference's documented SQLite surface (=, ==, AND/OR,
    * IN, BETWEEN, IS NULL, true/false literals, time()/strftime() via the
    * registered compat UDFs).
    */
  def select(columns: Seq[String] = null, where: String = null,
      limit: Int = -1): DataFrame = {
    graft.fn.Compat.register(spark)
    Functions.register(spark)
    var df = indexDF
    if (where != null) df = df.where(expr(where))
    if (columns != null) df = df.select(columns.map(col): _*)
    if (limit >= 0) df = df.limit(limit)
    df
  }

  /** The 37 index columns, in contract order. */
  def columns: Seq[String] = Schemas.IndexColumns

  /** Typed Dataset boundary over the index (SURVEY.md §1.4). */
  def typedIndex: org.apache.spark.sql.Dataset[MarketIndexRow] = {
    import spark.implicits._
    indexDF.as[MarketIndexRow]
  }

  /** A17: market count. */
  def size: Long = indexDF.count()

  /** A18: CSV export (header, NULL -> ""). Returns the output path. */
  def export(dest: String): String = {
    // parity mode: one header + all rows in one file (reference
    // betfairdatabase/database.py:165-186 materializes a single CSV)
    indexDF.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("nullValue", "")
      .option("emptyValue", "\"\"")
      .csv(dest)
    dest
  }

  /** A16: drop index rows whose data file no longer exists. Returns the
    * number of removed rows. Existence checks run in executors.
    */
  def clean(): Long = {
    val df = indexDF
    val before = df.count()
    import spark.implicits._
    val existing = df.mapPartitions { rows =>
      val conf = new Configuration()
      var cachedFs: FileSystem = null
      rows.filter { row =>
        val p = new Path(row.getAs[String]("marketDataFilePath"))
        if (cachedFs == null) cachedFs = p.getFileSystem(conf)
        cachedFs.exists(p)
      }
    }(org.apache.spark.sql.Encoders.row(Schemas.indexSchema))
      .toDF()
    writeSnapshot(existing)
    before - size
  }

  /** A14/A15: incremental insert of a source directory with re-layout
    * (import pattern) and duplicate policy. Returns rows inserted.
    *
    * Dataflow: build the source-market DataFrame (same pipeline), compute
    * destination paths from the pattern column, resolve each market's
    * (metadata action, data action) against the CURRENT destination state
    * (existence / row-equality / file-size, reference
    * betfairdatabase/market.py:135-198), apply file moves in executors, then
    * merge the index and swap the snapshot.
    */
  def insert(sourceDir: String, copy: Boolean = false,
      pattern: ImportPattern = ImportPatterns.betfairHistorical,
      onDuplicates: String = "update"): Long = {
    require(Seq("skip", "replace", "update").contains(onDuplicates))
    if (!indexExists) index(force = false)
    val built = IndexPipeline.build(spark, sourceDir)
    val src = built.index
      .withColumn("_destDir",
        when(pattern.dir.isNull || pattern.dir === "", databaseDir)
          .otherwise(concat(lit(databaseDir + "/"), pattern.dir)))
      .withColumn("_metaName",
        regexp_extract(col("marketMetadataFilePath"), "[^/]+$", 0))
      .withColumn("_dataName",
        regexp_extract(col("marketDataFilePath"), "[^/]+$", 0))
      .withColumn("_destMeta", concat(col("_destDir"), lit("/"), col("_metaName")))
      .withColumn("_destData", concat(col("_destDir"), lit("/"), col("_dataName")))

    // Resolution + file side effects run per-partition in executors; results
    // (one row per source market: the action taken) come back as a DataFrame.
    val existing = indexDF.cache()
    val existingByMeta = existing
      .select(Schemas.IndexColumns.filterNot(
        c => c == "marketMetadataFilePath" || c == "marketDataFilePath")
        .map(c => col(c).as(s"_ex_$c")) :+
        col("marketMetadataFilePath").as("_destMeta"): _*)
    val nonPathCols = Schemas.IndexColumns.filterNot(
      c => c == "marketMetadataFilePath" || c == "marketDataFilePath")
    val joined = src.join(existingByMeta, Seq("_destMeta"), "left_outer")
      .withColumn("_rowMatches",
        nonPathCols.map(c => col(c) <=> col(s"_ex_$c")).reduce(_ && _))

    import spark.implicits._
    val doCopy = copy
    val policy = onDuplicates
    val applied = joined.mapPartitions { rows =>
      val conf = new Configuration()
      var cfs: FileSystem = null
      def theFs(p: Path): FileSystem = {
        if (cfs == null) cfs = p.getFileSystem(conf)
        cfs
      }
      rows.map { row =>
        val srcMeta = new Path(row.getAs[String]("marketMetadataFilePath"))
        val srcData = new Path(row.getAs[String]("marketDataFilePath"))
        val destMeta = new Path(row.getAs[String]("_destMeta"))
        val destData = new Path(row.getAs[String]("_destData"))
        val f = theFs(destMeta)
        val metaExists = f.exists(destMeta)
        val dataExists = f.exists(destData)
        val rowMatches = row.getAs[Boolean]("_rowMatches")
        // metadata action (reference market.py:146-165)
        val action =
          if (!metaExists) "INSERT"
          else policy match {
            case "replace" => "UPDATE"
            case "skip" => "SKIP"
            case "update" => if (rowMatches) "SKIP" else "UPDATE"
          }
        // data-file action (reference market.py:168-178)
        val processData =
          if (!dataExists) true
          else policy match {
            case "skip" => false
            case "update" =>
              f.getFileStatus(destData).getLen <
                theFs(srcData).getFileStatus(srcData).getLen
            case "replace" => true
          }
        f.mkdirs(destMeta.getParent)
        def place(from: Path, to: Path): Unit = {
          if (f.exists(to)) f.delete(to, false)
          if (doCopy) FileUtil.copy(theFs(from), from, f, to, false, conf)
          else f.rename(from, to)
        }
        if (action != "SKIP") place(srcMeta, destMeta)
        if (processData) place(srcData, destData)
        (row.getAs[String]("_destMeta"), row.getAs[String]("_destData"), action)
      }
    }.toDF("_destMeta", "_destData", "_action").cache()
    applied.count() // force side effects exactly once

    val actions = applied.filter(col("_action") =!= "SKIP")
    // new rows: source markets re-pointed at their destination paths
    val newRows = src.join(actions, Seq("_destMeta", "_destData"), "left_semi")
      .withColumn("marketMetadataFilePath", col("_destMeta"))
      .withColumn("marketDataFilePath", col("_destData"))
      .select(Schemas.IndexColumns.map(col): _*)
    val merged = existing
      .join(actions.select(col("_destMeta").as("marketMetadataFilePath")),
        Seq("marketMetadataFilePath"), "left_anti")
      .unionByName(newRows)
      .dropDuplicates("marketMetadataFilePath", "marketDataFilePath")
    val inserted = newRows.count()
    writeSnapshot(merged)
    existing.unpersist()
    applied.unpersist()
    inserted
  }

  /** Snapshot-swap write: write to a temp dir, then atomically rename over
    * the live index (SURVEY.md §7.3).
    */
  private def writeSnapshot(df: DataFrame): Unit = {
    val tmp = s"$databaseDir/.betfairdatabaseindex_tmp"
    df.write.mode("overwrite").parquet(tmp)
    val f = fs
    val live = new Path(indexPath)
    if (f.exists(live)) f.delete(live, true)
    f.rename(new Path(tmp), live)
  }
}

object BetfairDatabase {
  val IndexDirName = ".betfairdatabaseindex"
}

/** A15: import patterns as Column functions over the flat index row
  * (reference betfairdatabase/imports.py:12-53).
  */
case class ImportPattern(dir: Column)

object ImportPatterns {
  /** "{year}/{month_abbrev}/{day}/{event_id}" from settled-else-start time. */
  val betfairHistorical: ImportPattern = {
    val ts = to_timestamp(coalesce(col("marketSettledTime"),
      col("marketStartTime")))
    ImportPattern(concat_ws("/",
      date_format(ts, "yyyy"), date_format(ts, "MMM"),
      date_format(ts, "d"), col("eventId")))
  }

  /** Markets stored in directories named after event ids. */
  val eventId: ImportPattern = ImportPattern(col("eventId"))

  /** Everything directly in the base directory. */
  val flat: ImportPattern = ImportPattern(lit(""))
}
