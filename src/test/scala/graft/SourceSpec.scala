package graft

import graft.sources.{Canonicalize, ConfigLoader, SupplierConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Config parsing + canonicalization pipeline (S1–S3, P1–P7). */
class SourceSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val refShapedJson =
    """{
      |  "name": "vitya",
      |  "column_mapping": {
      |    "Unnamed: 1": "name", "Unnamed: 4": "price_usd", "курс": "article_vitya"
      |  },
      |  "ignore_columns": ["служебн", "Фото"],
      |  "data_types": {"price_usd": "float", "article_vitya": "int", "name": "string"},
      |  "validation": {
      |    "required_columns": ["article_vitya", "name", "price_usd"],
      |    "price_min": 0, "price_max": 100000
      |  },
      |  "settings": {"skip_empty_rows": true}
      |}""".stripMargin

  test("ConfigLoader parses reference-shaped JSON") {
    val cfg = ConfigLoader.fromJson(refShapedJson)
    assert(cfg.name === "vitya")
    assert(cfg.columnMapping("курс") === "article_vitya")
    assert(cfg.ignoreColumns === Seq("служебн", "Фото"))
    assert(cfg.dataTypes("price_usd") === "float")
    assert(cfg.requiredColumns === Seq("article_vitya", "name", "price_usd"))
    assert(cfg.priceMax === 100000.0)
    assert(cfg.skipEmptyRows)
    assert(cfg.reverseMapping("article_vitya") === "курс")
  }

  test("ConfigLoader defaults for missing sections (fallback config)") {
    val cfg = ConfigLoader.fromJson("""{"name": "x"}""")
    // skip_empty_rows defaults TRUE like the reference (loader.py:464);
    // only an explicit false keeps all-null rows.
    assert(cfg.columnMapping.isEmpty && cfg.requiredColumns.isEmpty && cfg.skipEmptyRows)
    val explicitFalse =
      ConfigLoader.fromJson("""{"name": "x", "settings": {"skip_empty_rows": false}}""")
    assert(!explicitFalse.skipEmptyRows)
  }

  test("fixtures/vitya_config.json is byte-identical to the reference shipped config") {
    import java.nio.file.{Files, Paths}
    val ref = Paths.get("/root/reference/excel_loader/configs/vitya_config.json")
    assume(Files.exists(ref), "reference checkout not present")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(ref),
      Files.readAllBytes(Paths.get(graft.queries.SourceQueries.refConfigPath))),
      "fixture config drifted from the reference file")
    // and it parses into the expected reference shape
    val cfg = graft.queries.SourceQueries.refConfig
    assert(cfg.columnMapping("курс") === "article_vitya")
    assert(cfg.skipEmptyRows)
    assert(cfg.requiredColumns === Seq("article_vitya", "name", "price_usd"))
    // same contract for the dimi config
    val dimiRef = Paths.get("/root/reference/excel_loader/configs/dimi_config.json")
    assert(java.util.Arrays.equals(
      Files.readAllBytes(dimiRef),
      Files.readAllBytes(Paths.get(graft.queries.SourceQueries.dimiConfigPath))),
      "dimi fixture config drifted from the reference file")
    val dimi = graft.queries.SourceQueries.dimiConfig
    assert(dimi.columnMapping(" ") === "article_dimi")
    assert(dimi.normalizedMapping("") === "article_dimi",
      "single-space mapping key must match a blank trimmed header")
    assert(dimi.dataTypes("article_dimi") === "string")
  }

  test("detectByFilename follows the reference rules") {
    assert(ConfigLoader.detectByFilename("JHT_Xiaomi_31.07.xlsx") === "vitya")
    assert(ConfigLoader.detectByFilename("DiMi_Opt_Price.xlsx") === "dimi")
    assert(ConfigLoader.detectByFilename("dima_list.xls") === "dimi")
    assert(ConfigLoader.detectByFilename("base_ОСНОВА.xlsx") === "base")
    assert(ConfigLoader.detectByFilename("файл БАЗА.xlsx") === "base")
    assert(ConfigLoader.detectByFilename("random.xlsx") === "auto")
  }

  test("Canonicalize: drop-by-substring, case-insensitive rename, coerce casts, empty rows") {
    val cfg = ConfigLoader.fromJson(refShapedJson)
    val schema = StructType(Seq(
      StructField("Unnamed: 1", StringType), StructField("Unnamed: 4", StringType),
      StructField("КУРС", StringType), StructField("Служебная колонка", StringType),
      StructField("Фото товара", StringType)))
    val rows = Seq(
      Row("Item A", "12.5", "'00042", "junk", "img"),
      Row("Item B", "oops", "x9", "junk", "img"),
      Row(null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Canonicalize(df, cfg)
    assert(out.columns.toSeq === Seq("name", "price_usd", "article_vitya"))
    val got = out.collect()
    assert(got.length === 2, "all-null row dropped")
    val a = got.find(_.getString(0) == "Item A").get
    assert(a.getDouble(1) === 12.5)
    assert(a.isNullAt(2), "non-numeric article coerces to null ('00042 has apostrophe)")
    val b = got.find(_.getString(0) == "Item B").get
    assert(b.isNullAt(1), "unparsable price coerces to null")
  }

  test("Canonicalize hard-fails on missing required columns (P5)") {
    val cfg = ConfigLoader.fromJson(refShapedJson)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("x"))),
      StructType(Seq(StructField("Unnamed: 1", StringType))))
    val e = intercept[IllegalArgumentException](Canonicalize(df, cfg))
    assert(e.getMessage.contains("article_vitya"))
  }

  // ---- legacy .xls (BIFF8/CFB) front door --------------------------------

  private def checkXlsGrid(path: String): org.apache.spark.sql.DataFrame = {
    val df = graft.sources.Xlsx.read(spark, path)
    assert(df.columns.take(4).toSeq ===
      Seq("Артикул", "Название", "Цена", "Unnamed: 3"))
    val rows = df.collect()
    val r1 = rows(0)
    assert(r1.getString(0) === "10001") // NUMBER, integral → no ".0"
    assert(r1.getString(1) === "Кабель USB") // UTF-16 shared string
    assert(r1.getString(2) === "99.9") // NUMBER, fractional
    assert(r1.getString(3) === "Широкий-" + ("ω" * 27)) // wide SST (split in big)
    val r2 = rows(1)
    assert(r2.getString(0) === "10002") // RK integer
    assert(r2.getString(2) === "123.45") // RK ×100 integer
    val r3 = rows(2)
    assert(r3.getString(0) === "2.5") // RK double-bits
    assert(r3.getString(1).startsWith("SplitMarker-")) // SST tail string
    assert(r3.getString(1).length === "SplitMarker-".length + 40)
    assert(r3.getString(2) === "7") // MULRK first
    assert(r3.getString(3) === "9.99") // MULRK second
    val r4 = rows(3)
    assert(r4.getString(0) === "TRUE") // BOOLERR value cell
    assert(r4.getString(1) === "Инлайн текст") // old-style inline LABEL, wide
    assert(r4.getString(2) === "41.5") // FORMULA cached numeric result
    assert(r4.getString(3) === "Rich текст") // LABEL with rich runs + ext block
    df
  }

  test("S1/.xls: mini-stream container (workbook < 4096 bytes) reads through Xlsx.read") {
    val path = java.nio.file.Files.createTempFile("graft_small", ".xls").toString
    graft.tools.MakeXlsFixture.write(path, big = false)
    assert(new java.io.File(path).length() < 8192, "fixture should exercise the mini path")
    val df = checkXlsGrid(path)
    assert(df.count() === 4)
  }

  test("S1/.xls: regular-FAT container with an SST CONTINUE split") {
    val path = java.nio.file.Files.createTempFile("graft_big", ".xls").toString
    graft.tools.MakeXlsFixture.write(path, big = true)
    val df = checkXlsGrid(path)
    // 3 data rows + 300 pad rows (plus the all-null gap rows in between)
    assert(df.count() > 300)
    assert(df.collect().last.getString(0) === "299")
  }

  test("S1/.xls: >7 MB container walks the DIFAT sector chain") {
    val path = java.nio.file.Files.createTempFile("graft_huge", ".xls").toString
    // 35k pad rows × 12 NUMBER cols ≈ 7.6 MB workbook → ~15k sectors →
    // ~117 FAT sectors, past the 109 header DIFAT slots (the shape
    // round 6 rejected). BIFF8 caps rows at 65536, so bulk pads WIDE.
    graft.tools.MakeXlsFixture.writeHuge(path, padRows = 35000)
    assert(new java.io.File(path).length() > 7L * 1024 * 1024,
      "fixture must exceed the header-DIFAT capacity (~7.1 MB)")
    val grid = graft.sources.Biff8.parseGrid(path)
    // same cell content as the big fixture — compare the data prefix
    // (huge rows are 12 wide from the pad block; the twin's are 4)
    val smallPath = java.nio.file.Files.createTempFile("graft_twin", ".xls").toString
    graft.tools.MakeXlsFixture.write(smallPath, big = true)
    val twin = graft.sources.Biff8.parseGrid(smallPath)
    assert(grid.take(5).map(_.take(4).toSeq) === twin.take(5).map(_.take(4).toSeq))
    // pad rows survive intact through the chained FAT
    assert(grid.length === 1000 + 35000)
    assert(grid(1000)(0) === "0")
    assert(grid(36000 - 1)(11) === (34999L * 12 + 11).toString)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    java.nio.file.Files.delete(java.nio.file.Paths.get(smallPath))
  }

  test("S1/.xls: CFB major-version-4 container (4096-byte sectors)") {
    val path = java.nio.file.Files.createTempFile("graft_v4", ".xls").toString
    graft.tools.MakeXlsFixture.write(path, big = true, sectorSize = 4096)
    checkXlsGrid(path)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("S1/.xls: corrupt SST (wide string split at an odd byte) throws, not hangs") {
    val path = java.nio.file.Files.createTempFile("graft_corrupt", ".xls").toString
    graft.tools.MakeXlsFixture.writeCorruptSstXls(path)
    val e = intercept[IllegalArgumentException](graft.sources.Biff8.parseGrid(path))
    assert(e.getMessage.contains("corrupt SST"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("property: BIFF8 write→read roundtrip on random grids") {
    import org.scalacheck.{Gen, Prop}
    val cellStr = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.frequency(4 -> Gen.alphaNumChar, 2 -> Gen.oneOf('я', 'Ж', 'ü'), 1 -> Gen.const(' '))))
      .map(_.mkString)
    val cellNum = Gen.oneOf(
      Gen.choose(-999999L, 999999L).map(_.toDouble),
      Gen.choose(-99999L, 99999L).map(_ / 4.0)) // exact halves/quarters
    val cell: Gen[Option[Either[String, Double]]] = Gen.frequency(
      3 -> Gen.const(None),
      4 -> cellStr.map(s => Some(Left(s))),
      3 -> cellNum.map(d => Some(Right(d))))
    val gridGen = for {
      nRows <- Gen.choose(1, 6)
      nCols <- Gen.choose(1, 4)
      header <- Gen.listOfN(nCols, cellStr)
      data <- Gen.listOfN(nRows, Gen.listOfN(nCols, cell))
    } yield (header, data)

    def fmt(d: Double): String =
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

    PropCheck.check(Prop.forAll(gridGen) { case (header, data) =>
      val strings = for {
        (row, r) <- data.zipWithIndex
        (Some(Left(s)), c) <- row.zipWithIndex
      } yield (r + 1, c, s)
      val numbers = for {
        (row, r) <- data.zipWithIndex
        (Some(Right(d)), c) <- row.zipWithIndex
      } yield (r + 1, c, d)
      val wb = graft.tools.MakeXlsFixture.workbookStream(
        header, strings, numbers, Nil, Nil, padRows = 0,
        splitLastSstAt = None, extras = false)
      val path = java.nio.file.Files.createTempFile("graft_prop", ".xls")
      java.nio.file.Files.write(path, graft.tools.MakeXlsFixture.cfb(wb))
      val got = graft.sources.Biff8.parseGrid(path.toString)
      java.nio.file.Files.delete(path)
      // expected: header row + data rows, trailing all-empty rows/cols
      // trimmed the way a sparse cell store renders them
      val full: Seq[Seq[String]] = header.map(h => Option(h).orNull) +:
        data.map(_.map {
          case Some(Left(s)) => s
          case Some(Right(d)) => fmt(d)
          case None => null
        })
      val maxRow = full.lastIndexWhere(_.exists(_ != null))
      val maxCol = full.map(_.lastIndexWhere(_ != null)).max
      val expected = full.take(maxRow + 1).map(_.take(maxCol + 1))
      val gotSeq = got.map(_.toSeq)
      gotSeq == expected
    }, minSuccessful = 60)
  }

  test("S1/.xls: non-Excel input fails with a clear front-door error") {
    val path = java.nio.file.Files.createTempFile("graft_not_excel", ".xls").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "id,name\n1,x\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](graft.sources.Xlsx.read(spark, path))
    assert(e.getMessage.contains("not an Excel file"))
    assert(e.getMessage.contains("convert"))
  }
}
