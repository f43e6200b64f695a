package graft.probe

/** Throwaway diagnostic: print the q_url_normalize oracle SQL for a direct
  * DuckDB parse/row check without a full Verify cycle.
  */
object UrlOracleMain {
  def main(args: Array[String]): Unit = {
    println("=== SQL START ===")
    println(graft.queries.Oracles.sqls("q_url_normalize"))
    println("=== SQL END ===")
  }
}
