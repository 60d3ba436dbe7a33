package graft.betfair

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden value-count parity against the reference's official fixture
  * datasets (uncompressed + zip-lzma + official = the 14-market database of
  * reference tests/test_integration.py:107-248). The datasets under
  * src/test/resources/datasets are byte-for-byte copies of the reference's
  * test DATA (market stream files + catalogues); every expected count below
  * is the reference's own assertion, re-expressed over our index schema
  * (booleans instead of SQLite 0/1, Double distances).
  */
class OfficialFixtureSpec extends SparkSpec {

  private def copyTree(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  private def countJsonFiles(dir: Path): Long = {
    val s = Files.list(dir)
    try s.filter(_.toString.endsWith(".json")).count()
    finally s.close()
  }

  private lazy val (dbDir: Path, index: DataFrame) = {
    val dir = Fixtures.tempDir("graft-official")
    val res = Paths.get("src/test/resources/datasets")
    Seq("uncompressed", "zip-lzma", "official").foreach { d =>
      copyTree(res.resolve(d), dir.resolve(d))
    }
    val db = new BetfairDatabase(spark, dir.toString)
    val counters = db.index()
    assert(counters.rowsInserted == 14)
    assert(counters.marketsWithoutData == 1) // lone catalogue 1.199967351
    (dir, db.indexDF.cache())
  }

  private def counts(column: String): Map[Option[Any], Long] =
    index.groupBy(col(column)).count().collect()
      .map(r => (Option(r.get(0)), r.getLong(1))).toMap

  private def assertCounts(column: String, expected: (Any, Long)*): Unit = {
    val exp: Map[Option[Any], Long] =
      expected.map { case (k, v) => (Option(k), v) }.toMap
    assert(counts(column) == exp, s"column $column")
  }

  test("official 14-market database: size, exclusions, alias") {
    assert(index.count() == 14)
    // market without data is not imported (test_integration.py:120-122)
    assert(index.filter(col("marketId") === "1.199967351").count() == 0)
    // marketTime is aliased to marketStartTime, both kept (py:148-151)
    assert(index.filter(col("marketTime") =!= col("marketStartTime"))
      .count() == 0)
    // metadata is generated for the 4 official data files missing it
    // (py:124-131): official/ has 6 data files, 1 shipped .json
    assert(countJsonFiles(dbDir.resolve("official")) == 5)
  }

  test("official goldens: identity and event columns") {
    assertCounts("eventTypeId",
      "1" -> 3L, "2" -> 1L, "3" -> 1L, "4" -> 2L, "7" -> 3L, "4339" -> 4L)
    assertCounts("competitionId",
      "11365612" -> 1L, "12247754" -> 2L, "12596293" -> 1L, (null, 10L))
    assertCounts("eventCountryCode",
      "GB" -> 7L, "AU" -> 2L, "FR" -> 1L, "BG" -> 1L, (null, 3L))
    assertCounts("eventVenue",
      "Uttoxeter" -> 1L, "Sheffield" -> 2L, "DAX" -> 1L, "Richmond" -> 1L,
      "Pakenham" -> 1L, (null, 8L))
  }

  test("official goldens: market description columns") {
    assertCounts("bettingType",
      "ASIAN_HANDICAP_SINGLE_LINE" -> 1L, "ASIAN_HANDICAP_DOUBLE_LINE" -> 1L,
      "LINE" -> 1L, "ODDS" -> 11L)
    assertCounts("priceLadderDescriptionType",
      "FINEST" -> 2L, "LINE_RANGE" -> 1L, "CLASSIC" -> 6L, (null, 5L))
    assertCounts("marketType",
      "WIN" -> 4L, "MATCH_ODDS" -> 2L, "BOTH_TEAMS_TO_SCORE" -> 1L,
      "TOP_5_FINISH" -> 1L, "ASIAN_HANDICAP" -> 1L,
      "1_INNING_6_OVR_LINE" -> 1L, "TEAMB_1ST_INN_RUNS" -> 1L,
      "EACH_WAY" -> 1L, "PLACE" -> 1L, "TRAP_CHALLENGE" -> 1L)
    assertCounts("raceType", "Flat" -> 1L, "Hurdle" -> 1L, (null, 12L))
    assertCounts("bspMarket", true -> 5L, false -> 9L)
    assertCounts("turnInPlayEnabled", true -> 10L, false -> 4L)
    assertCounts("persistenceEnabled", true -> 10L, false -> 4L)
    assertCounts("lineRangeInfoMarketUnit",
      "Goals" -> 1L, "Runs" -> 1L, (null, 12L))
    assertCounts("eachWayDivisor", 5.0 -> 1L, (null, 13L))
    assertCounts("numberOfWinners", 1 -> 4L, 5 -> 1L, (null, 9L))
  }

  test("corrupt + uncompressed: reference counter contract") {
    // reference tests/test_database.py:34-83: 7 markets total, 5 added,
    // 1 corrupt (1.221089567), 1 without data (1.199967351)
    val dir = Fixtures.tempDir("graft-corrupt")
    val res = Paths.get("src/test/resources/datasets")
    Seq("corrupt", "uncompressed").foreach { d =>
      copyTree(res.resolve(d), dir.resolve(d))
    }
    val db = new BetfairDatabase(spark, dir.toString)
    val c = db.index()
    assert(c.totalMarkets == 7)
    assert(c.rowsInserted == 5)
    assert(c.corruptFiles == 1)
    assert(c.marketsWithoutData == 1)
    assert(c.marketsWithoutMetadata == 0)
    val ids = db.indexDF.select("marketId").collect().map(_.getString(0)).toSet
    assert(!ids.contains("1.221089567"))
    assert(!ids.contains("1.199967351"))
  }

  test("missing metadata: definitions generated where possible") {
    // reference tests/test_database.py:85-128 (flatten=true): 6 markets,
    // 4 added with generated metadata, 1 corrupt (1.223716890 — unparsable),
    // 1 without metadata (1.209492553 — stream file with no definition)
    val dir = Fixtures.tempDir("graft-missingmeta")
    copyTree(Paths.get("src/test/resources/datasets/missing_metadata"), dir)
    val db = new BetfairDatabase(spark, dir.toString)
    val c = db.index()
    assert(c.totalMarkets == 6)
    assert(c.rowsInserted == 4)
    assert(c.corruptFiles == 1)
    assert(c.marketsWithoutData == 0)
    assert(c.marketsWithoutMetadata == 1)
    // the 4 importable markets each got a generated catalogue file
    assert(countJsonFiles(dir) == 4)
    val ids = db.indexDF.select("marketId").collect().map(_.getString(0)).toSet
    assert(!ids.contains("1.209492553"))
    assert(!ids.contains("1.223716890"))
  }

  private def copyFlat(src: Path, dst: Path): Unit = {
    val s = Files.list(src)
    try s.forEach { p =>
      Files.copy(p, dst.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
  }

  test("bulk metadata.json: pairs in-directory, no files generated") {
    // reference tests/test_database.py:368-381: 4 markets, bulk metadata
    // takes precedence, indexing creates NO metadata files
    val dir = Fixtures.tempDir("graft-bulk")
    copyTree(Paths.get("src/test/resources/datasets/bulk_metadata"),
      dir.resolve("bulk_metadata"))
    def marketFiles() = {
      val s = Files.walk(dir)
      try s.filter(p => p.getFileName.toString.startsWith("1.")).count()
      finally s.close()
    }
    val before = marketFiles()
    val db = new BetfairDatabase(spark, dir.toString)
    val c = db.index()
    assert(marketFiles() == before)
    assert(c.rowsInserted == 4)
    val ids = db.indexDF.select("marketId").collect().map(_.getString(0)).toSet
    assert(ids == Set("1.197931750", "1.197931751", "1.201590187",
      "1.214870442"))
  }

  test("truncated metadata.json: parse error + definition-extraction fallback") {
    // reference tests/test_database.py:383-398: corrupt bulk file is logged
    // as a parse error and the markets still import via extracted definitions
    val dir = Fixtures.tempDir("graft-bulkbad")
    copyTree(Paths.get("src/test/resources/datasets/bulk_metadata"),
      dir.resolve("bulk_metadata"))
    val mf = dir.resolve("bulk_metadata/metadata.json")
    val bytes = Files.readAllBytes(mf)
    Files.write(mf, java.util.Arrays.copyOf(bytes, bytes.length - 5))
    val db = new BetfairDatabase(spark, dir.toString)
    val c = db.index()
    assert(c.corruptFiles == 1)
    assert(c.rowsInserted == 4)
  }

  test("duplicates dataset: skip policy matches the reference import counters") {
    // reference tests/test_database.py:137-218: index zip-lzma flattened
    // (4 added), then insert duplicates/ with SKIP → 2 added, 1 skipped
    val dir = Fixtures.tempDir("graft-dups")
    copyFlat(Paths.get("src/test/resources/datasets/zip-lzma"), dir)
    val db = new BetfairDatabase(spark, dir.toString)
    val c = db.index()
    assert(c.rowsInserted == 4 && c.corruptFiles == 0 &&
      c.marketsWithoutData == 0 && c.marketsWithoutMetadata == 0)
    val src = Fixtures.tempDir("graft-dups-src")
    copyFlat(Paths.get("src/test/resources/datasets/duplicates"), src)
    val ins = db.insert(src.toString, copy = true,
      pattern = ImportPatterns.flat, onDuplicates = "skip")
    assert(ins.marketsAdded == 2)
    assert(ins.marketsUpdated == 0)
    assert(ins.marketsSkipped == 1)
    assert(db.size == 6)
  }

  test("official goldens: derived metadata columns") {
    assertCounts("localDayOfWeek",
      "Friday" -> 4L, "Thursday" -> 3L, "Sunday" -> 2L, "Tuesday" -> 2L,
      "Wednesday" -> 1L, "Monday" -> 1L, "Saturday" -> 1L)
    assertCounts("raceTypeFromName",
      "OR" -> 2L, "Mdn Claim" -> 1L, "Mdn" -> 1L, "3yo" -> 1L, (null, 9L))
    // only round distance values are asserted (py:240-247)
    val meters = counts("raceDistanceMeters")
    assert(meters(Some(280.0)) == 2L)
    assert(meters(Some(320.0)) == 1L)
    assert(meters(Some(1200.0)) == 1L)
    assert(meters(None) == 9L)
    val furlongs = counts("raceDistanceFurlongs")
    assert(furlongs(Some(6.0)) == 1L)
    assert(furlongs(None) == 9L)
    assert(counts("raceId")(None) == 9L)
  }
}
