package graft.betfair

import org.apache.spark.sql.SparkSession

/** Command-line surface mirroring the reference's `bfdb` subcommands
  * (reference: betfairdatabase/cli.py — index/select/insert/clean/export/
  * size/columns), driving the Spark engine.
  *
  * Usage:
  *   graft.betfair.Cli index <db> [--force]
  *   graft.betfair.Cli select <db> [--where W] [--columns a,b] [--limit n]
  *   graft.betfair.Cli insert <db> <source> [--copy] [--pattern P] [--on-duplicates D]
  *   graft.betfair.Cli clean <db>
  *   graft.betfair.Cli export <db> <dest>
  *   graft.betfair.Cli size <db>
  *   graft.betfair.Cli columns
  */
object Cli {

  private def flag(args: Array[String], name: String): Boolean =
    args.contains(name)

  private def opt(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("missing subcommand"); sys.exit(2) }
    val cmd = args.head
    if (cmd == "columns") {
      Schemas.IndexColumns.foreach(println)
      return
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-bfdb")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val db = new BetfairDatabase(spark, args(1))
      cmd match {
        case "index" =>
          val c = db.index(force = flag(args, "--force"))
          println(s"indexed ${c.rowsInserted} markets " +
            s"(total=${c.totalMarkets}, withoutData=${c.marketsWithoutData}, " +
            s"withoutMetadata=${c.marketsWithoutMetadata}, corrupt=${c.corruptFiles})")
        case "select" =>
          val cols = opt(args, "--columns").map(_.split(",").toSeq).orNull
          val n = opt(args, "--limit").map(_.toInt).getOrElse(-1)
          db.select(columns = cols, where = opt(args, "--where").orNull,
            limit = n).show(1000, truncate = false)
        case "insert" =>
          val pattern = opt(args, "--pattern").getOrElse("betfair-historical") match {
            case "flat" => ImportPatterns.flat
            case "event-id" => ImportPatterns.eventId
            case _ => ImportPatterns.betfairHistorical
          }
          val n = db.insert(args(2), copy = flag(args, "--copy"),
            pattern = pattern,
            onDuplicates = opt(args, "--on-duplicates").getOrElse("update"))
          println(s"inserted $n markets")
        case "clean" => println(s"removed ${db.clean()} rows")
        case "export" => println(db.export(args(2)))
        case "size" => println(db.size)
        case other =>
          System.err.println(s"unknown subcommand $other"); sys.exit(2)
      }
    } finally spark.stop()
  }
}
