package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class XlsxSpec extends SparkSpec {

  test("write → read roundtrip preserves the display-string sheet") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("Ann", 25, 49.5), ("Bob<&>", 0, -1.0), ("", 7, 0.125)
    ).toDF("Name", "Age", "Score")
    val path = java.nio.file.Files.createTempDirectory("xlsx")
      .resolve("t.xlsx").toString
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("Name", "Age", "Score"))
    val rows = back.collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("Ann", "25", "49.5"),
      Seq("Bob<&>", "0", "-1.0"),
      Seq("", "7", "0.125")))
  }

  test("writeSharded → read roundtrip: one workbook per partition, no driver collect") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (s"k$i", i.toString))
      .toDF("K", "V").repartition(7)
    val dir = java.nio.file.Files.createTempDirectory("xlsxshard")
      .resolve("out").toString
    Xlsx.writeSharded(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xlsx"))
    assert(parts.length > 1, "expected a multi-part write")
    val back = Xlsx.read(spark, s"$dir/*.xlsx")
    assert(back.columns.toSeq == Seq("K", "V"))
    assert(back.count() == 100)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet
      == (1 to 100).map(i => (s"k$i", i.toString)).toSet)
  }

  test("write scale guard (r16): above maxBulkRows the bulk write " +
      "routes to the sharded executor-side sink automatically — " +
      "part files that round-trip through read — while small sheets " +
      "keep the faithful single-workbook path") {
    val s = spark
    import s.implicits._
    val big = (1 to 50).map(i => (s"k$i", i.toString))
      .toDF("K", "V").repartition(5)
    val dir = java.nio.file.Files.createTempDirectory("xlsxguard")
      .resolve("out").toString
    Xlsx.write(big, dir, maxBulkRows = 10)
    assert(new java.io.File(dir).isDirectory,
      "above the threshold the path must become a sharded directory")
    assert(new java.io.File(dir, "_SUCCESS").exists)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xlsx"))
    assert(parts.length > 1, "expected a multi-part write")
    val back = Xlsx.read(spark, s"$dir/*.xlsx")
    assert(back.count() == 50 &&
      back.collect().map(r => (r.getString(0), r.getString(1))).toSet
        == (1 to 50).map(i => (s"k$i", i.toString)).toSet)
    // below the threshold: one plain workbook FILE, as before
    val small = java.nio.file.Files.createTempDirectory("xlsxguard2")
      .resolve("t.xlsx").toString
    Xlsx.write(big.limit(3), small, maxBulkRows = 10)
    assert(new java.io.File(small).isFile,
      "small sheets keep the single-workbook bulk path")
  }

  test("writeSharded re-export overwrites: no stale parts survive") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsxre")
      .resolve("out").toString
    Xlsx.writeSharded((1 to 60).map(i => (s"old$i", "1"))
      .toDF("K", "V").repartition(6), dir)
    Xlsx.writeSharded((1 to 20).map(i => (s"new$i", "2"))
      .toDF("K", "V").repartition(2), dir)
    val back = Xlsx.read(spark, s"$dir/*.xlsx").collect()
      .map(_.getString(0)).toSet
    assert(back == (1 to 20).map(i => s"new$i").toSet,
      s"stale rows leaked: ${back.filter(_.startsWith("old")).take(3)}")
    assert(new java.io.File(dir, "_SUCCESS").exists)
    assert(!new java.io.File(dir, "_temporary").exists)
  }

  test("reader feeds the mapping engine like any other sheet source") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsxmap")
    val path = dir.resolve("src.xlsx").toString
    Xlsx.write(Seq(("a", "10"), ("b", "3")).toDF("K", "V"), path)
    val out = graft.etl.Engine.transform(Xlsx.read(spark, path),
      Seq(("_filter:v", "eval: src[V] >= 5"), ("Key", "src[K]")))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("shared-strings and sparse cells parse correctly") {
    // Hand-built workbook exercising t="s", t="inlineStr", plain <v>,
    // and a skipped cell (A..C with B missing on row 3).
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>H3</t></is></c></row>
        |<row r="2"><c r="A2"><v>42</v></c><c r="B2" t="s"><v>2</v></c><c r="C2"><v>1.5</v></c></row>
        |<row r="3"><c r="A3"><v>7</v></c><c r="C3" t="inlineStr"><is><t>z</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>H1</t></si><si><t>H2</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si>
        |</sst>""".stripMargin
    val base = Xlsx.workbookBytes(Seq(Seq("x")))
    // rebuild the zip with our sheet + sharedStrings
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(base))
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName != "xl/worksheets/sheet1.xml") {
        zout.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        zout.write(zin.readAllBytes())
        zout.closeEntry()
      }
      e = zin.getNextEntry
    }
    zout.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zout.write(sheet.getBytes("UTF-8")); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
    zout.write(sst.getBytes("UTF-8")); zout.closeEntry()
    zout.close()

    val dir = java.nio.file.Files.createTempDirectory("xlsxsst")
    val p = dir.resolve("s.xlsx")
    java.nio.file.Files.write(p, bos.toByteArray)
    val df = Xlsx.read(spark, p.toString)
    assert(df.columns.toSeq == Seq("H1", "H2", "H3"))
    val rows = df.orderBy("H1").collect().map(_.toSeq).toSeq
    assert(rows == Seq(Seq("42", "rich", "1.5"), Seq("7", "", "z")))
  }

  test("column letter ↔ index agree (A, Z, AA, BC42)") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA7") == 26)
    assert(Xlsx.colIndex("BC42") == 54)
  }
}
