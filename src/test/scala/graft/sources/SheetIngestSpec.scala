package graft.sources

import graft.SparkSpec

class SheetIngestSpec extends SparkSpec {

  private val junk = Seq("fleet report", "", "", "", "", "")
  private val header = Seq("id", "FLOOR ", "printer ip", "Type", "serial", "Comment")
  private val rows = Seq(
    Seq("3", "2", "10.0.1.7", "M404dn", "PHB8C12345", ""),
    Seq("", "", "", "", "", ""),                      // all-blank → dropped
    Seq("7.0", "1", "-", "M426fdw", "PHC0D00001", "nan"))

  test("A12: header elected below junk rows; case/space-insensitive") {
    val raw = SheetIngest.positional(spark, Seq(junk, Seq("x"), header) ++ rows)
    val out = SheetIngest(spark, raw, SheetIngest.CompanySpec)
    assert(out.columns.toSeq == "row_idx" +: SheetIngest.CompanySpec.keys)
    assert(out.count() == 2) // blank row dropped
    val r = out.orderBy("row_idx").collect()
    assert(r(0).getAs[String]("ID") == "3")
    assert(r(1).getAs[String]("Printer IP") == "-")
    assert(r(1).isNullAt(r(1).fieldIndex("Comment"))) // "nan" → null
  }

  test("S1: missing wanted header falls back to its positional slot") {
    // 'Serial' header misspelled → name lookup fails, position 4 used.
    val h2 = Seq("ID", "Floor", "Printer IP", "Type", "Srl#", "Comment")
    val raw = SheetIngest.positional(spark, h2 +: rows)
    val out = SheetIngest(spark, raw, SheetIngest.CompanySpec)
    assert(out.orderBy("row_idx").collect()(0)
      .getAs[String]("Serial") == "PHB8C12345")
  }

  test("A12: no key column in first 20 rows → clear failure") {
    val raw = SheetIngest.positional(spark,
      Seq(Seq("a", "b"), Seq("c", "d")))
    val e = intercept[IllegalArgumentException] {
      SheetIngest(spark, raw, SheetIngest.CompanySpec)
    }
    assert(e.getMessage.contains("no header row"))
  }
}
