package graft

import graft.extract.HtmlTables
import org.scalatest.funsuite.AnyFunSuite

class HtmlTablesSpec extends AnyFunSuite {

  test("well-formed table: headers, positions, entity decode") {
    val html =
      """<table><tr><th>name</th><th>a &amp; b</th></tr>
        |<tr><td>x</td><td>1</td></tr></table>""".stripMargin
    val cs = HtmlTables.cells(html)
    assert(cs.map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.isHeader, c.text)) == Vector(
      (0, 0, 0, true, "name"), (0, 0, 1, true, "a & b"),
      (0, 1, 0, false, "x"), (0, 1, 1, false, "1")))
  }

  test("optional closing tags: td closed by next td, tr by next tr, last cell by </table>") {
    val html = "<table><tr><td>a<td>b<tr><td>c</table>"
    val cs = HtmlTables.cells(html).map(c => (c.rowIdx, c.colIdx, c.text))
    assert(cs == Vector((0, 0, "a"), (0, 1, "b"), (1, 0, "c")))
  }

  test("attributes and mixed case tolerated; inline markup stripped from cells") {
    val html =
      """<TABLE class="wikitable" id=t1><TR align=left>
        |<TD colspan="2"><b>bold</b> text</TD></TR></TABLE>""".stripMargin
    val cs = HtmlTables.cells(html)
    assert(cs == Vector(HtmlTables.Cell(0, 0, 0, isHeader = false, "bold text")))
  }

  test("multiple top-level tables index independently; nested tables are skipped") {
    val html =
      """<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>
        |<table><tr><td>second</td></tr></table>""".stripMargin
    val cs = HtmlTables.cells(html).map(c => (c.tableIdx, c.text))
    assert(cs == Vector((0, "outer"), (1, "second")))
  }

  test("no tables -> no cells; unclosed table consumes to end without error") {
    assert(HtmlTables.cells("<p>plain</p>").isEmpty)
    val cs = HtmlTables.cells("<table><tr><td>tail")
    assert(cs == Vector(HtmlTables.Cell(0, 0, 0, isHeader = false, "tail")))
  }

  test("lifting: header-as-predicate, first-column subject, headerless skipped") {
    val html =
      """<table><tr><th>who</th><th>age</th><th>city</th></tr>
        |<tr><td>ann</td><td>41</td><td>rome</td></tr>
        |<tr><td>bob</td><td>7</td></tr></table>
        |<table><tr><td>no</td><td>header</td></tr></table>""".stripMargin
    val got = HtmlTables.lift(HtmlTables.cells(html))
    assert(got == Vector(
      ("ann", "age", "41"), ("ann", "city", "rome"),
      ("bob", "age", "7"))) // short row lifts what it has; headerless table lifts nothing
  }

  test("distributed surface is a zero-shuffle projection") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq((3L, "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"))
      .toDF("doc_id", "html")
    val out = HtmlTables.tableCells(df, "doc_id", "html")
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
