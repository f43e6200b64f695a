package graft.extract

/** HTML table extraction — the "WebTables" harvest (relational facts
  * embedded in page markup, the second-highest-precision triple source on
  * the web after explicit JSON-LD/microdata).
  *
  * Same discipline as [[HtmlText]]/[[JsonLd]]: pinned, dependency-free
  * string processing — tolerant of attributes, case, and unclosed
  * `<td>/<tr>` (closing tags are optional for both in the HTML spec, and
  * real web tables omit them constantly). Nested tables are out of scope
  * (skipped wholesale rather than mis-parsed: an inner `<table` closes the
  * outer cell scan until its matching `</table>`).
  *
  * Output shape is the flat cell relation `(table_idx, row_idx, col_idx,
  * is_header, text)` — downstream stages (entity linking over cells,
  * header-driven predicate induction) are ordinary relational work on it.
  * Extraction is a pure per-row flatMap: zero shuffle, scan-co-partitioned.
  */
object HtmlTables {

  final case class Cell(tableIdx: Int, rowIdx: Int, colIdx: Int, isHeader: Boolean, text: String)

  private val TableOpen = """(?is)<table[^>]*>""".r
  private val RowOpen = """(?is)<tr[^>]*>""".r
  private val CellOpen = """(?is)<(td|th)[^>]*>""".r

  /** All cells of all top-level tables in document order. */
  def cells(html: String): Vector[Cell] = {
    val out = Vector.newBuilder[Cell]
    var tableIdx = 0
    var m = TableOpen.findFirstMatchIn(html)
    var offset = 0
    while (m.isDefined) {
      val start = offset + m.get.end
      val body = html.substring(start)
      val end = findTableEnd(body)
      parseTable(body.substring(0, end), tableIdx, out)
      tableIdx += 1
      offset = start + end
      m = TableOpen.findFirstMatchIn(html.substring(offset))
    }
    out.result()
  }

  /** Index just past the `</table>` matching an already-consumed `<table>`,
    * skipping balanced nested tables (or end of string if unclosed).
    */
  private def findTableEnd(body: String): Int = {
    val lower = body.toLowerCase
    var depth = 1
    var i = 0
    while (i < lower.length) {
      val nextOpen = lower.indexOf("<table", i)
      val nextClose = lower.indexOf("</table", i)
      if (nextClose < 0) return lower.length
      if (nextOpen >= 0 && nextOpen < nextClose) { depth += 1; i = nextOpen + 6 }
      else {
        depth -= 1
        if (depth == 0) return nextClose
        i = nextClose + 7
      }
    }
    lower.length
  }

  private def parseTable(body: String, tableIdx: Int, out: collection.mutable.Builder[Cell, Vector[Cell]]): Unit = {
    // nested tables were already consumed by findTableEnd for the RANGE, but
    // their markup is still inside `body`: blank them so cell scans skip them
    val flat = blankNested(body)
    val rowStarts = RowOpen.findAllMatchIn(flat).toVector
    rowStarts.zipWithIndex.foreach { case (rm, rowIdx) =>
      val rowEndCandidates = Seq(
        flat.indexOf("</tr", rm.end),
        rowStarts.lift(rowIdx + 1).map(_.start).getOrElse(-1),
        flat.length).filter(_ >= 0)
      val rowBody = flat.substring(rm.end, rowEndCandidates.min)
      val cellStarts = CellOpen.findAllMatchIn(rowBody).toVector
      cellStarts.zipWithIndex.foreach { case (cm, colIdx) =>
        val isHeader = cm.group(1).equalsIgnoreCase("th")
        val cellEndCandidates = Seq(
          rowBody.indexOf("</td", cm.end),
          rowBody.indexOf("</th", cm.end),
          cellStarts.lift(colIdx + 1).map(_.start).getOrElse(-1),
          rowBody.length).filter(_ >= 0)
        val raw = rowBody.substring(cm.end, cellEndCandidates.min)
        out += Cell(tableIdx, rowIdx, colIdx, isHeader, cleanCell(raw))
      }
    }
  }

  private def blankNested(body: String): String = {
    val lower = body.toLowerCase
    val sb = new StringBuilder(body)
    var i = 0
    while (true) {
      val open = lower.indexOf("<table", i)
      if (open < 0) return sb.toString
      val end = findTableEnd(body.substring(open + 6))
      val close = math.min(body.length, open + 6 + end + 8) // past "</table>"
      var j = open
      while (j < close) { sb.setCharAt(j, ' '); j += 1 }
      i = close
    }
    sb.toString // unreachable
  }

  /** Strip residual inline tags and normalize whitespace via the pinned
    * [[HtmlText]] entity/whitespace rules (one shared definition of "text").
    */
  private def cleanCell(raw: String): String =
    HtmlText.extractText(raw).replace('\n', ' ').trim

  /** The classic WebTables lifting rule (header row = predicates, first
    * column = subject): for every table whose row 0 is all-header, each data
    * cell at col > 0 becomes `(subject_cell, header_text, cell_text)`.
    * Headerless tables and cells beyond the header width lift nothing —
    * silence over guesses. Purely local to one page's cells.
    */
  def lift(cs: Vector[Cell]): Vector[(String, String, String)] =
    cs.groupBy(_.tableIdx).toVector.sortBy(_._1).flatMap { case (_, tc) =>
      val headerRow = tc.filter(c => c.rowIdx == 0)
      if (headerRow.isEmpty || !headerRow.forall(_.isHeader)) Vector.empty
      else {
        val preds = headerRow.map(c => c.colIdx -> c.text).toMap
        val dataRows = tc.filter(c => !c.isHeader && c.rowIdx > 0).groupBy(_.rowIdx)
        dataRows.toVector.sortBy(_._1).flatMap { case (_, row) =>
          row.find(_.colIdx == 0).map(_.text) match {
            case None => Vector.empty
            case Some(subj) =>
              row.filter(_.colIdx > 0).sortBy(_.colIdx).flatMap(c =>
                preds.get(c.colIdx).map(p => (subj, p, c.text)))
          }
        }
      }
    }

  /** Distributed lifting surface: (idCol, subj, pred, obj) per lifted
    * triple — the cells never leave the page's task (zero shuffle).
    */
  def liftedTriples(df: org.apache.spark.sql.DataFrame, idCol: String, htmlCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(htmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        lift(cells(html)).map(t => (id, t._1, t._2, t._3))
      }
      .toDF(idCol, "subj", "pred", "obj")
  }

  /** Distributed surface: one output row per cell. */
  def tableCells(df: org.apache.spark.sql.DataFrame, idCol: String, htmlCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{functions => F}
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(idCol).cast("long"), F.col(htmlCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, html) =>
        cells(html).map(c => (id, c.tableIdx, c.rowIdx, c.colIdx, c.isHeader, c.text))
      }
      .toDF(idCol, "table_idx", "row_idx", "col_idx", "is_header", "cell_text")
  }
}
