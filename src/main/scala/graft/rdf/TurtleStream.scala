package graft.rdf

import graft.model.Triple

/** Bounded-memory Turtle parsing for arbitrarily large single files — the
  * Spark re-expression of the reference's constant-memory streaming parse
  * (chilon_rs `src/parse.rs:24-51` `TriplesParser::parse_step`, validated on
  * single graphs "over 90 gigabytes", `Readme.md:23`).
  *
  * A whole-file `wholeTextFiles` parse materializes one JVM String per file
  * (OOM for multi-GB Turtle; hard-fails past 2 GB). Instead, a single-pass
  * scanner walks the character stream tracking just enough lexical state
  * (strings, long strings, IRIs, comments, bracket depth) to find statement
  * terminators — a top-level `.` followed by whitespace/comment/EOF — and
  * feeds complete-statement batches through [[Turtle.parseWith]] with the
  * `@prefix`/`@base`/fresh-blank [[Turtle.State]] carried across batches.
  * Memory is bounded by (longest single statement + batch budget), never by
  * file size; the chunked parse is statement-for-statement equal to the
  * in-memory parse (parity-tested in RdfSpec).
  */
object TurtleStream {

  private val Code = 0
  private val Iri = 1
  private val Comment = 2
  private val ShortStr = 3
  private val LongStr = 4
  private val QuoteOpen1 = 5
  private val QuoteOpen2 = 6

  /** Iterator of parse batches over an incremental reader. The reader is
    * closed on exhaustion. `batchChars` bounds how much statement text is
    * buffered before a parse is emitted (default 1 MiB).
    */
  def batches(
      reader: java.io.Reader,
      srcUrl: String,
      batchChars: Int = 1 << 20
  ): Iterator[Turtle.Result] = new Iterator[Turtle.Result] {
    private val in =
      if (reader.isInstanceOf[java.io.BufferedReader]) reader
      else new java.io.BufferedReader(reader, 1 << 16)
    private val state = new Turtle.State
    private val stmt = new java.lang.StringBuilder
    private val batch = new java.lang.StringBuilder

    private var mode = Code
    private var q: Char = '"'
    private var esc = false
    private var closeRun = 0
    private var depth = 0
    private var pendingDot = false
    private var eof = false

    private var ready: Turtle.Result = null

    /** Lexical step for one character already appended to `stmt`; returns
      * true when the char CLOSED a statement (the terminator dot was the
      * previous char — `c` itself belongs to the next statement).
      */
    private def step(c: Char): Boolean = {
      if (pendingDot && mode == Code) {
        pendingDot = false
        if (c.isWhitespace || c == '#') return true
      }
      mode match {
        case Code =>
          c match {
            case '<'                 => mode = Iri
            case '#'                 => mode = Comment
            case '"' | '\''          => q = c; mode = QuoteOpen1
            case '[' | '('           => depth += 1
            case ']' | ')'           => if (depth > 0) depth -= 1
            case '.' if depth == 0   => pendingDot = true
            case _                   =>
          }
        case Iri =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '>') mode = Code
        case Comment =>
          if (c == '\n') mode = Code
        case QuoteOpen1 =>
          if (c == q) mode = QuoteOpen2
          else if (c == '\\') { mode = ShortStr; esc = true }
          else mode = ShortStr
        case QuoteOpen2 =>
          if (c == q) { mode = LongStr; closeRun = 0 }
          else {
            // empty short string already closed; reprocess c as code
            mode = Code
            return step(c)
          }
        case ShortStr =>
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == q) mode = Code
        case LongStr =>
          if (esc) { esc = false; closeRun = 0 }
          else if (c == '\\') { esc = true; closeRun = 0 }
          else if (c == q) { closeRun += 1; if (closeRun == 3) { mode = Code; closeRun = 0 } }
          else closeRun = 0
      }
      false
    }

    /** Moves the completed statement (everything but its trailing `c`, the
      * first char of the next statement) from `stmt` to `batch`.
      */
    private def closeStatement(): Unit = {
      val last = stmt.charAt(stmt.length - 1)
      batch.append(stmt, 0, stmt.length - 1).append('\n')
      stmt.setLength(0)
      stmt.append(last)
    }

    private def parseBatch(): Turtle.Result = {
      val doc = batch.toString
      batch.setLength(0)
      Turtle.parseWith(doc, srcUrl, state)
    }

    private def advance(): Unit = {
      while (ready == null && !eof) {
        val r = in.read()
        if (r < 0) {
          eof = true
          in.close()
          // trailing statement text (possibly terminator-at-EOF or a
          // dot-less SPARQL directive) joins the final batch
          if (stmt.toString.exists(ch => !ch.isWhitespace && ch != '\n')) {
            batch.append(stmt).append('\n')
          }
          stmt.setLength(0)
          if (batch.length > 0) ready = parseBatch()
        } else {
          val c = r.toChar
          stmt.append(c)
          if (step(c)) {
            closeStatement()
            if (batch.length >= batchChars) ready = parseBatch()
          }
        }
      }
    }

    override def hasNext: Boolean = { advance(); ready != null }

    override def next(): Turtle.Result = {
      advance()
      if (ready == null) throw new NoSuchElementException("TurtleStream exhausted")
      val r = ready
      ready = null
      r
    }
  }

  /** Flat triple iterator (decls are in each batch's `prefixes`). */
  def triples(reader: java.io.Reader, srcUrl: String, batchChars: Int = 1 << 20): Iterator[Triple] =
    batches(reader, srcUrl, batchChars).flatMap(_.triples)
}
