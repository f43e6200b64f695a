package graft.sinks

import graft.model.SummaryRow
import org.apache.spark.sql.{DataFrame, functions => F}

/** `vis-data.json` sink (reference `src/visualization.rs:34-108,274-288`):
  * node/edge JSON for the d3 force-directed app.
  *
  * The reference un-pivots the summary to TTL and reassembles it with a 5-way
  * SPARQL star-join (`src/visualization.rs:229-246`); since we keep the summary
  * relational, that join disappears (SURVEY J1) and the two aggregates remain:
  *
  *   - node count = sum of `occurs` over all incident edges, both endpoints,
  *     self-loops counted twice (`src/visualization.rs:161-187`) — an explode of
  *     both endpoints + groupBy;
  *   - `link_num`: parallel edges grouped by unordered endpoint pair get
  *     1-based ordinals, sign = whether the edge's source is the
  *     lexicographically first endpoint (`src/visualization.rs:189-209`) — a
  *     window over (least, greatest).
  *
  * Edges arrive ordered by occurs desc (the reference's `ORDER BY DESC(?occurs)`),
  * so ordinals follow that order within each unordered pair.
  */
object VisJson {

  final case class VisNode(name: String, count: Long, nodeType: String)
  final case class VisEdge(source: String, target: String, count: Long, label: String,
      isDatatype: Boolean, linkNum: Int)
  final case class VisData(nodes: Seq[VisNode], edges: Seq[VisEdge], aliases: Map[String, String])

  def nodeType(name: String): String = name match {
    case "UNKNOWN" => "Unknown"
    case "BLANK"   => "Blank"
    case _         => "Namespace"
  }

  /** Node counts as a Spark aggregate (SURVEY A5). */
  def nodeCounts(summary: DataFrame): DataFrame =
    summary
      .select(F.explode(F.array(F.col("s_ns"), F.col("o_ns"))).as("name"), F.col("occurs"))
      .groupBy("name")
      .agg(F.sum("occurs").as("count"))

  /** Edges with link_num as a window over the unordered endpoint pair (SURVEY A6). */
  def edgesWithLinkNum(summary: DataFrame): DataFrame = {
    val lo = F.least(F.col("s_ns"), F.col("o_ns"))
    val hi = F.greatest(F.col("s_ns"), F.col("o_ns"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lo, hi)
      .orderBy(F.col("occurs").desc, F.col("p_ns"), F.col("is_datatype"), F.col("s_ns"))
    summary
      .withColumn("ord", F.row_number().over(w))
      .withColumn("sign", F.when(F.col("s_ns") === lo, 1).otherwise(-1))
      .withColumn("link_num", F.col("sign") * F.col("ord"))
      .select(
        F.col("s_ns").as("source"), F.col("o_ns").as("target"), F.col("occurs").as("count"),
        F.col("p_ns").as("label"), F.col("is_datatype"), F.col("link_num"))
  }

  /** Driver-side assembly from collected summary rows (tiny), matching the
    * reference's in-memory construction exactly — used for golden tests and the
    * JSON sink; the DataFrame variants above are the scale path.
    */
  def build(rows: Seq[SummaryRow], aliases: Map[String, String]): VisData = {
    val ordered = rows.sortBy(r => (-r.occurs, r.s_ns, r.p_ns, r.o_ns, r.is_datatype))
    val nodes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val perPair = scala.collection.mutable.Map[(String, String), Int]()
    val edges = Vector.newBuilder[VisEdge]
    ordered.foreach { r =>
      nodes(r.s_ns) = nodes.getOrElse(r.s_ns, 0L) + r.occurs
      nodes(r.o_ns) = nodes.getOrElse(r.o_ns, 0L) + r.occurs
      val key = if (r.s_ns <= r.o_ns) (r.s_ns, r.o_ns) else (r.o_ns, r.s_ns)
      val n = perPair.getOrElse(key, 0) + 1
      perPair(key) = n
      val sign = if (r.s_ns == key._1) 1 else -1
      edges += VisEdge(r.s_ns, r.o_ns, r.occurs, r.p_ns, r.is_datatype, sign * n)
    }
    val sortedNodes = nodes.toSeq
      .map { case (n, c) => VisNode(n, c, nodeType(n)) }
      .sortBy(n => (-n.count, n.name))
    val sortedEdges = edges.result().sortBy(e => -e.count)
    VisData(sortedNodes, sortedEdges, aliases)
  }

  private def jstr(s: String): String = graft.ns.Registry.jstr(s)

  def toJson(d: VisData): String = {
    val nodes = d.nodes.map { n =>
      s"""    {"name": ${jstr(n.name)}, "count": ${n.count}, "node_type": ${jstr(n.nodeType)}}"""
    }
    val edges = d.edges.map { e =>
      s"""    {"source": ${jstr(e.source)}, "target": ${jstr(e.target)}, "count": ${e.count}, """ +
        s""""label": ${jstr(e.label)}, "is_datatype": ${e.isDatatype}, "link_num": ${e.linkNum}}"""
    }
    val aliases = d.aliases.toSeq.sorted.map { case (a, ns) => s"""    ${jstr(a)}: ${jstr(ns)}""" }
    "{\n  \"nodes\": [\n" + nodes.mkString(",\n") + "\n  ],\n" +
      "  \"edges\": [\n" + edges.mkString(",\n") + "\n  ],\n" +
      "  \"aliases\": {\n" + aliases.mkString(",\n") + "\n  }\n}"
  }
}
