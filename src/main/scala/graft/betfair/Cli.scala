package graft.betfair

import org.apache.spark.sql.SparkSession

/** Command-line surface mirroring the reference's `bfdb` subcommands
  * (reference: betfairdatabase/cli.py — index/select/insert/clean/export/
  * size/columns), driving the Spark engine.
  *
  * Usage:
  *   graft.betfair.Cli [-V|--version] [-v|--verbose] [-q|--quiet] <cmd> ...
  *   graft.betfair.Cli index <db> [-f|--force]
  *   graft.betfair.Cli select <db> [--where W] [--columns a,b] [--limit n]
  *   graft.betfair.Cli insert <db> <source> [-c|--copy] [-p|--pattern P]
  *                     [-d|--on-duplicates D]
  *   graft.betfair.Cli clean <db>
  *   graft.betfair.Cli export <db> [dest]
  *   graft.betfair.Cli size <db>
  *   graft.betfair.Cli columns
  *
  * Error behavior mirrors the reference's tested contract (cli.py:199-237):
  * an existing index without --force, a missing index for clean/size, or an
  * invalid option value prints a message and exits nonzero; `--version`
  * prints the version and exits 0; `--verbose`/`--quiet` set the Spark log
  * level (DEBUG / OFF, quiet wins — cli.py:157-163).
  */
object Cli {

  /** Library version (reference: importlib.metadata.version, cli.py:17-24). */
  val Version = "0.3.0"

  private val Patterns = Seq("betfair_historical", "event_id", "flat")
  private val OnDuplicates = Seq("skip", "replace", "update")

  private def flag(args: Array[String], names: String*): Boolean =
    names.exists(args.contains)

  private def opt(args: Array[String], names: String*): Option[String] =
    names.flatMap { name =>
      val i = args.indexOf(name)
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }.headOption

  private def fail(msg: String): Nothing = {
    System.err.println(msg)
    sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    if (flag(args, "-V", "--version")) { println(Version); return }
    val cmds = args.filterNot(_.startsWith("-"))
    if (cmds.isEmpty) { System.err.println("missing subcommand"); sys.exit(2) }
    val cmd = cmds.head
    if (cmd == "columns") {
      Schemas.IndexColumns.foreach(println)
      return
    }
    if (cmds.length < 2) fail(s"$cmd: missing database directory argument")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-bfdb")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // quiet overrides verbose, like the reference (cli.py:160)
    val logLevel =
      if (flag(args, "-q", "--quiet")) "OFF"
      else if (flag(args, "-v", "--verbose")) "DEBUG"
      else "WARN"
    spark.sparkContext.setLogLevel(logLevel)
    try {
      val db = new BetfairDatabase(spark, cmds(1))
      cmd match {
        case "index" =>
          val c =
            try db.index(force = flag(args, "-f", "--force"))
            catch {
              case ex: IllegalStateException =>
                fail(ex.getMessage +
                  " Use -f/--force option to reindex the database.")
            }
          println(s"indexed ${c.rowsInserted} markets " +
            s"(total=${c.totalMarkets}, withoutData=${c.marketsWithoutData}, " +
            s"withoutMetadata=${c.marketsWithoutMetadata}, corrupt=${c.corruptFiles})")
        case "select" =>
          val cols = opt(args, "--columns").map(_.split(",").toSeq).orNull
          val n = opt(args, "--limit").map(_.toInt).getOrElse(-1)
          db.select(columns = cols, where = opt(args, "--where").orNull,
            limit = n).show(1000, truncate = false)
        case "insert" =>
          if (cmds.length < 3) fail("insert: missing source directory argument")
          val patternName = opt(args, "-p", "--pattern")
            .getOrElse("betfair_historical")
          if (!Patterns.contains(patternName))
            fail(s"insert: invalid --pattern '$patternName' " +
              s"(choose from ${Patterns.mkString(", ")})")
          val pattern = patternName match {
            case "flat" => ImportPatterns.flat
            case "event_id" => ImportPatterns.eventId
            case _ => ImportPatterns.betfairHistorical
          }
          val dup = opt(args, "-d", "--on-duplicates").getOrElse("update")
          if (!OnDuplicates.contains(dup))
            fail(s"insert: invalid --on-duplicates '$dup' " +
              s"(choose from ${OnDuplicates.mkString(", ")})")
          val c = db.insert(cmds(2), copy = flag(args, "-c", "--copy"),
            pattern = pattern, onDuplicates = dup)
          println(s"inserted ${c.rowsInserted} markets " +
            s"(added=${c.marketsAdded}, updated=${c.marketsUpdated}, " +
            s"skipped=${c.marketsSkipped})")
        case "clean" =>
          try println(s"removed ${db.clean()} rows")
          catch { case ex: IllegalStateException => fail(ex.getMessage) }
        case "export" =>
          println(db.export(if (cmds.length >= 3) cmds(2) else "."))
        case "size" =>
          try println(db.size)
          catch { case ex: IllegalStateException => fail(ex.getMessage) }
        case other =>
          System.err.println(s"unknown subcommand $other"); sys.exit(2)
      }
    } finally spark.stop()
  }
}
