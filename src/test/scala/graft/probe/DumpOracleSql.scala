package graft.probe

import java.nio.file.{Files, Paths}

/** Diagnostic: rewrite only `<outDir>/oracle_sql.json` (same escaping as
  * graft.Verify) so oracle-SQL edits can be re-checked against an existing
  * Verify parquet dump without re-running every query.
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/verify_out")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote $outDir/oracle_sql.json")
  }
}
