package graft

import graft.kg.GraphOps
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  // a -> b (twice, distinct predicates), a -> c, b -> c, c -> a, plus a
  // literal attribute on d (node with no graph edges) and a blank subject
  private def triples = Seq(
    ("a", 0, "p1", "b", 0),
    ("a", 0, "p9", "b", 0),
    ("a", 0, "p2", "c", 0),
    ("b", 0, "p1", "c", 0),
    ("c", 0, "p1", "a", 0),
    ("d", 0, "p3", "year", 4),
    ("_:x", 1, "p4", "a", 0)
  ).toDF("s", "sKind", "p", "o", "oKind")
    .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
      $"o", $"oKind".cast("byte").as("oKind"))

  test("entityDegrees: out counts all statements, in counts node objects") {
    val got = GraphOps.entityDegrees(triples).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "a" -> ((3L, 2L, 3L)), // out p1,p9,p2; in from c and _:x
      "b" -> ((1L, 2L, 1L)),
      "c" -> ((1L, 2L, 1L)),
      "d" -> ((1L, 0L, 1L)), // literal attribute counts as outgoing
      "_:x" -> ((1L, 0L, 1L))
    ))
  }

  test("reciprocity: same-predicate reverse only; ppm exact; blanks count") {
    // graph edges: a-p1->b, a-p9->b, a-p2->c, b-p1->c, c-p1->a, _:x-p4->a
    // reverses present: none under the same predicate in the base fixture;
    // add b-p1->a (reciprocal of a... wait a->b is p1? a-p1->b yes) and
    // c-p2->a (reciprocal of a-p2->c under p2)
    val extra = Seq(
      ("b", 0, "p1", "a", 0), // makes a-p1->b reciprocal (and itself)
      ("c", 0, "p2", "a", 0) // makes a-p2->c reciprocal (and itself)
    ).toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.reciprocity(triples.unionByName(extra)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // p1 edges: a->b, b->c, c->a, b->a => recips: a->b and b->a (2 of 4)
    assert(got("p1") == ((4L, 2L, 500000L)))
    // p2 edges: a->c, c->a => both reciprocal
    assert(got("p2") == ((2L, 2L, 1000000L)))
    // p9: a->b with no p9 reverse (the p1 b->a does NOT count)
    assert(got("p9") == ((1L, 0L, 0L)))
    // blank-subject edge has no reverse
    assert(got("p4") == ((1L, 0L, 0L)))
    // literal attribute predicates never appear
    assert(!got.contains("p3"))
  }

  test("degreeDistribution: exact bit-length buckets over total degree") {
    val got = GraphOps.degreeDistribution(triples).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // total degrees: a=5, b=3, c=3, d=1, _:x=1
    // buckets: floor(log2): 1->0, 3->1, 5->2
    assert(got == Map(
      0L -> ((2L, 1L, 1L, 2L)),
      1L -> ((2L, 3L, 3L, 6L)),
      2L -> ((1L, 5L, 5L, 5L))
    ))
  }

  test("assortativitySums: exact endpoint-degree moments over distinct edges") {
    val row = GraphOps.assortativitySums(triples).collect()(0)
    // distinct graph edges: (a,b) (a,c) (b,c) (c,a) (_:x,a)
    // degrees: a=5 b=3 c=3 _:x=1
    val xs = Seq(5L -> 3L, 5L -> 3L, 3L -> 3L, 3L -> 5L, 1L -> 5L)
    assert(row.getLong(0) == xs.length.toLong)
    assert(row.getLong(1) == xs.map(_._1).sum)
    assert(row.getLong(2) == xs.map(_._2).sum)
    assert(row.getLong(3) == xs.map(p => p._1 * p._2).sum)
    assert(row.getLong(4) == xs.map(p => p._1 * p._1).sum)
    assert(row.getLong(5) == xs.map(p => p._2 * p._2).sum)
  }

  /** Straight-line reference of the same integer recurrence. */
  private def refPageRank(
      edges: Seq[(String, String)], nodes: Set[String], iters: Int
  ): Map[String, Long] = {
    val dedup = edges.distinct
    val outdeg = dedup.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inc = dedup.groupBy(_._2).map { case (o, es) =>
        o -> es.map { case (s, _) => (r(s) * 17) / (20 * outdeg(s)) }.sum
      }
      r = nodes.map(n => n -> (150000L + inc.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRank: matches the integer recurrence; edges dedup; dangling ok") {
    val nodes = Set("a", "b", "c", "d", "_:x")
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "c",
      "c" -> "a", "_:x" -> "a")
    for (iters <- Seq(0, 1, 5)) {
      val got = GraphOps.pageRank(triples, iters).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(edges, nodes, iters), s"iters=$iters")
    }
    // d has a literal-only statement: it is a node (ranks) but never
    // receives mass -> exactly the teleport term after any iteration >= 1
    val r5 = GraphOps.pageRank(triples, 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r5("d") == 150000L)
  }

  test("pageRank plan: no global window, no cartesian product") {
    val plan = GraphOps.pageRank(triples, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }

  test("triangleCounts: degree-oriented count equals naive enumeration") {
    // K4 on {a,b,c,d} (4 triangles, 3 per node) plus a pendant edge and a
    // reverse duplicate (c->a exists as a->c too: must collapse)
    val k4 = for {
      Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (x, 0, "p", y, 0)
    val extra = Seq(("c", 0, "p", "a", 0), ("d", 0, "p", "e", 0),
      ("a", 0, "lit", "1999", 4))
    val t = (k4 ++ extra).toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.triangleCounts(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // pendant e and literal edges contribute nothing
    assert(!got.contains("e"))
  }

  test("cooccurrence: unordered same-page pairs over distinct mentions") {
    val mentions = Seq(
      ("u1", "E1"), ("u1", "E2"), ("u1", "E3"), ("u1", "E1"), // dup mention
      ("u2", "E2"), ("u2", "E1")
    ).toDF("srcUrl", "entityIri")
    val got = GraphOps.cooccurrence(mentions).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("E1", "E2") -> 2L,
      ("E1", "E3") -> 1L,
      ("E2", "E3") -> 1L
    ))
  }

  test("mentionPriors: counts, ambiguity, priors sum to 1 per surface") {
    val mentions = Seq(
      ("u1", "Mercury", "E_planet"), ("u2", "Mercury", "E_planet"),
      ("u3", "Mercury", "E_planet"), ("u4", "Mercury", "E_metal"),
      ("u1", "Paris", "E_city"),
      ("u2", "Paris", "E_city")
    ).toDF("srcUrl", "surface", "entityIri")
    val got = GraphOps.mentionPriors(mentions).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("Mercury", "E_planet")) == ((3L, 4L, 2L, 0.75)))
    assert(got(("Mercury", "E_metal")) == ((1L, 4L, 2L, 0.25)))
    assert(got(("Paris", "E_city")) == ((2L, 2L, 1L, 1.0)))
    // power-of-2 denominators in this fixture -> the IEEE divides are exact
    // and sum to exactly 1 per surface
    got.toSeq.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(rows.map(_._2._4).sum == 1.0)
    }
  }

  test("resolveByLabel: transitive closure through shared labels") {
    // L1:{A,B}, L2:{B,C} chain -> {A,B,C} one class through multi-label B;
    // L3:{D} singleton maps to itself; L4:{E,F} separate class
    val mentions = Seq(
      ("L1", "B"), ("L1", "A"), ("L1", "A"), // dup pair collapses
      ("L2", "C"), ("L2", "B"),
      ("L3", "D"),
      ("L4", "F"), ("L4", "E")
    ).toDF("surface", "entityIri")
    val got = GraphOps.resolveByLabel(mentions).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "A" -> "A", "B" -> "A", "C" -> "A",
      "D" -> "D",
      "E" -> "E", "F" -> "E"
    ))
    // r6 driver cutover parity: the alias-vocabulary-sized fast path (one
    // collect + driver union-find) must equal the distributed
    // reps→edges→pointer-jumping path row-for-row
    val dist = GraphOps.resolveByLabel(mentions, driverThreshold = 0L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist == got)
  }

  test("canonicalLabels: vote count, tie on label asc, unmapped entity self-canon") {
    val mentions = Seq(
      ("Apple", "E1"), ("Apple", "E1"), ("Apfel", "E1"), // E1: Apple 2-1
      ("Zeta", "E2"), ("Beta", "E2"), // E2 tie 1-1 -> Beta (label asc)
      ("Solo", "E9") // E9 not in mapping -> self-canonical
    ).toDF("surface", "entityIri")
    val mapping = Seq(("E1", "E0"), ("E2", "E0")).toDF("entity", "canon")
    val got = GraphOps.canonicalLabels(mentions, mapping).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // E0 absorbs both: Apple 2, Apfel 1, Zeta 1, Beta 1 -> Apple wins
    assert(got == Map("E0" -> (("Apple", 2L)), "E9" -> (("Solo", 1L))))
    val plan = GraphOps.canonicalLabels(mentions, mapping)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window reached the plan:\n$plan")
  }

  test("snapshotDiff: all four statuses, null-bearing keys match null-safely") {
    def t(rows: Seq[(String, String, Option[String])]) =
      rows.toDF("s", "p", "oLang")
        .select($"s", F.lit(0).cast("byte").as("sKind"), $"p",
          F.lit("o").as("o"), F.lit(0).cast("byte").as("oKind"),
          $"oLang", F.lit(null).cast("string").as("oDt"))
    val old = t(Seq(("a", "p", None), ("a", "p", None), // kept if new has 2
      ("b", "p", None), // changed: 1 -> 2
      ("c", "p", Some("en")) // removed
    ))
    val nw = t(Seq(("a", "p", None), ("a", "p", None),
      ("b", "p", None), ("b", "p", None),
      ("d", "p", None) // added
    ))
    val got = GraphOps.snapshotDiff(old, nw).collect()
      .map(r => r.getString(0) -> ((r.getLong(7), r.getLong(8), r.getString(9))))
      .toMap
    assert(got == Map(
      "a" -> ((2L, 2L, "kept")),
      "b" -> ((1L, 2L, "changed")),
      "c" -> ((1L, 0L, "removed")),
      "d" -> ((0L, 1L, "added"))
    ))
  }

  test("neighborhood: min hop distance, undirected, bounded by maxHops") {
    // s -> a -> b -> c chain plus shortcut s -> b; undirected so c also
    // reaches back; d is disconnected
    val ts = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "b"), ("d", "e"))
      .toDF("s", "o")
      .select($"s", F.lit(0).cast("byte").as("sKind"), F.lit("p").as("p"),
        $"o", F.lit(0).cast("byte").as("oKind"),
        F.lit(null).cast("string").as("oLang"), F.lit(null).cast("string").as("oDt"))
    val got = GraphOps.neighborhood(ts, Seq("s"), maxHops = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("s" -> 0, "a" -> 1, "b" -> 1, "c" -> 2))
    // maxHops binds: 1 hop stops at {s, a, b}
    val h1 = GraphOps.neighborhood(ts, Seq("s"), maxHops = 1).collect()
      .map(_.getString(0)).toSet
    assert(h1 == Set("s", "a", "b"))
  }

  test("canonicalizeTriples: IRI terms rewrite, literals/blanks pass through") {
    val mapping = Seq(("b", "a"), ("c", "a")).toDF("entity", "canon")
    val ts = Seq(
      ("b", 0, "p1", "c", 0, null, null),
      ("a", 0, "p1", "a", 0, null, null), // same triple post-rewrite
      ("b", 0, "p2", "lit", 2, null, null), // literal object untouched
      ("_:b", 1, "p1", "b", 0, null, null), // blank subject untouched
      ("d", 0, "p3", "b", 3, "en", null) // oKind=3: "b" is a STRING, not the entity
    ).toDF("s", "sKind", "p", "o", "oKind", "oLang", "oDt")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"oLang".cast("string").as("oLang"),
        $"oDt".cast("string").as("oDt"))
    val got = GraphOps.canonicalizeTriples(ts, mapping).collect()
      .map(r => ((r.getString(0), r.getByte(1), r.getString(2), r.getString(3),
        r.getByte(4), Option(r.getString(5)), Option(r.getString(6))), r.getLong(7)))
      .toMap
    assert(got == Map(
      ("a", 0.toByte, "p1", "a", 0.toByte, None, None) -> 2L,
      ("a", 0.toByte, "p2", "lit", 2.toByte, None, None) -> 1L,
      ("_:b", 1.toByte, "p1", "a", 0.toByte, None, None) -> 1L,
      ("d", 0.toByte, "p3", "b", 3.toByte, Some("en"), None) -> 1L
    ))
  }

  test("predicateStats: functional vs multi-valued predicates profiled") {
    val ts = Seq(
      ("a", 0, "born", "1901", 4), ("b", 0, "born", "1902", 4), // functional
      ("a", 0, "knows", "b", 0), ("a", 0, "knows", "c", 0), // multi-valued
      ("b", 0, "knows", "c", 0),
      ("a", 0, "knows", "b", 0) // duplicate triple still counts in n_triples
    ).toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.predicateStats(ts).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got("born") == ((2L, 2L, 2L, 1.0)))
    assert(got("knows") == ((4L, 2L, 2L, 0.5)))
  }

  test("predicateSignatures: identical predicate sets group, duplicates collapse") {
    val ts = Seq(
      ("a", 0, "p1", "x", 0), ("a", 0, "p2", "y", 0), ("a", 0, "p1", "z", 0),
      ("b", 0, "p2", "x", 0), ("b", 0, "p1", "w", 0), // same {p1,p2} as a
      ("c", 0, "p1", "x", 0),
      ("_:n", 1, "p1", "x", 0) // blank subject counts as a node too
    ).map { case (s, sk, p, o, ok) => (s, sk, p, o, ok) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.predicateSignatures(ts).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    // {p1,p2} → a,b (example = min = "a"); {p1} → c and _:n (example "_:n")
    assert(got == Set((2L, 2L, "a"), (1L, 2L, "_:n")))
  }

  test("neighborJaccard: hand-computed values, hub excluded consistently") {
    // star hub h touches x1..x4 (degree 4 > maxDeg 3 → excluded entirely);
    // x1,x2 also share real neighbors m,n; x3 shares only m with x1/x2
    val es = Seq(
      ("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),
      ("x1", "m"), ("x2", "m"), ("x3", "m"),
      ("x1", "n"), ("x2", "n"),
      ("x1", "z")
    )
    val ts = es.map { case (s, o) => (s, 0, "p", o, 0) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.neighborJaccard(ts, maxDeg = 3L, minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // hubs (degree > 3): h AND x1 — both vanish from every neighbor SET but
    // keep their own (reduced) sets: N(h) = {x2,x3,x4}, N(x1) = {m,n,z},
    // N(x2) = {m,n}, N(m) = {x2,x3}. Survivors at minShared = 2:
    //   (x1,x2): share {m,n} → 2/(3+2-2) = 2/3
    //   (h,m):   share {x2,x3} → 2/(3+2-2) = 2/3
    assert(got == Map(
      ("x1", "x2") -> ((2L, 2.0 / 3.0)),
      ("h", "m") -> ((2L, 2.0 / 3.0))))
  }

  test("personalizedPageRank: straight-line integer parity, seeds only restart") {
    // the shared `triples` fixture's DISTINCT node-node edges:
    // (a,b),(a,c),(b,c),(c,a),(_:x,a); d has only a literal attribute
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("_:x", "a"))
    val nodes = Seq("a", "b", "c", "d", "_:x")
    val outdeg = Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "_:x" -> 1L)
    var r: Map[String, Long] =
      nodes.map(n => n -> (if (n == "a") 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val inc = edges.groupBy(_._2).map { case (o, es) =>
        o -> es.map { case (s, _) => (r(s) * 17) / (20 * outdeg(s)) }.sum
      }
      r = nodes.map(n =>
        n -> ((if (n == "a") 150000L else 0L) + inc.getOrElse(n, 0L))).toMap
    }
    val got = GraphOps.personalizedPageRank(triples,
        n => n === "a", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach(n => assert(got(n) == r(n), s"node $n"))
    // non-seed node with no graph in-edges stays at zero
    assert(got("d") == 0L)
  }

  test("resourceAllocation: exact micro-unit weights, hub excluded consistently") {
    // same fixture as the jaccard test; weights are 1000000 div deg(z)
    val es = Seq(
      ("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),
      ("x1", "m"), ("x2", "m"), ("x3", "m"),
      ("x1", "n"), ("x2", "n"),
      ("x1", "z")
    )
    val ts = es.map { case (s, o) => (s, 0, "p", o, 0) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.resourceAllocation(ts, maxDeg = 3L, minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (h,m) share {x2 (deg 3 -> 333333), x3 (deg 2 -> 500000)} = 833333
    // (x1,x2) share {m (deg 3 -> 333333), n (deg 2 -> 500000)} = 833333
    assert(got == Map(
      ("h", "m") -> ((2L, 833333L)),
      ("x1", "x2") -> ((2L, 833333L))))
  }

  test("encodeForEmbedding: ids dense by (freq desc, term asc), window parity") {
    val enc = GraphOps.encodeForEmbedding(triples)
    val rows = enc.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getString(5)))
    // node-node distinct triples: (a,p1,b),(a,p9,b),(a,p2,c),(b,p1,c),
    // (c,p1,a),(_:x,p4,a). Entity freqs (endpoint occurrences): a=5, b=3,
    // c=3, _:x=1 → ids a=0, b=1, c=2, _:x=3. Relation freqs: p1=3,
    // p2=1, p4=1, p9=1 → ids p1=0, p2=1, p4=2, p9=3.
    val entId = Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "_:x" -> 3L)
    val relId = Map("p1" -> 0L, "p2" -> 1L, "p4" -> 2L, "p9" -> 3L)
    assert(rows.length == 6)
    rows.foreach { case (h, r, t, hs, rs, ts) =>
      assert(h == entId(hs) && r == relId(rs) && t == entId(ts))
    }
    // dictionary ids are a dense 0..n-1 range on both sides
    assert(rows.flatMap(x => Seq(x._1, x._3)).toSet == Set(0L, 1L, 2L, 3L))
    assert(rows.map(_._2).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("negativeSamples: splitmix tails in range, collision flag exact") {
    val enc = GraphOps.encodeForEmbedding(triples).cache()
    val pos = enc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nEnt = pos.flatMap(p => Seq(p._1, p._3)).max + 1
    val got = GraphOps.negativeSamples(enc, seed = 13L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.length == pos.size)
    got.foreach { case (h, r, t, tn, clean) =>
      assert(tn >= 0 && tn < nEnt)
      val expected = java.lang.Long.remainderUnsigned(
        graft.extract.Synth.mix64(13L ^ (h * 1000003L + r * 7919L + t)), nEnt)
      assert(tn == expected)
      assert(clean == !pos.contains((h, r, tn)))
    }
    // determinism across invocations
    val again = GraphOps.negativeSamples(enc, seed = 13L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.sortBy(x => (x._1, x._2, x._3)).toSeq ==
      again.sortBy(x => (x._1, x._2, x._3)).toSeq)
  }

  /** Straight-line reference peel (to the fixed point). */
  private def refKCore(edges: Seq[(String, String)], k: Long): Map[String, Long] = {
    var es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    es.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      .filter(_._2 >= k)
  }

  test("predicatePairLift: exact counts, lift = n_pair*n_subj/(n1*n2)") {
    // distinct (s,p): a->{p1,p9,p2}, b->{p1}, c->{p1}, d->{p3}, _:x->{p4}
    // n_subj=5; marginals p1=3, p2=p9=p3=p4=1; pairs only on subject a
    val got = GraphOps.predicatePairLift(triples).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == Map(
      ("p1", "p2") -> ((1L, 3L, 1L, 5.0 / 3.0)),
      ("p1", "p9") -> ((1L, 3L, 1L, 5.0 / 3.0)),
      ("p2", "p9") -> ((1L, 1L, 1L, 5.0))))
  }

  /** Straight-line reference of the same integer HITS recurrence. */
  private def refHits(
      edges: Seq[(String, String)], rounds: Int
  ): Map[String, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var hub = nodes.map(n => n -> 1000000L).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to rounds) {
      val aRaw = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val am = math.max(aRaw.values.max, 1L)
      auth = aRaw.map { case (n, v) => n -> v * 1000000L / am }
      val hRaw = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val hm = math.max(hRaw.values.max, 1L)
      hub = hRaw.map { case (n, v) => n -> v * 1000000L / hm }
    }
    nodes.map(n => n -> ((hub(n), auth(n)))).toMap
  }

  test("hits: 3 integer rounds match the straight-line reference") {
    // distinct node-node edges of the fixture: a->b, a->c, b->c, c->a, _:x->a
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("_:x", "a"))
    val got = GraphOps.hits(triples, rounds = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == refHits(es, 3))
    // a emits to the two strongest authorities -> top hub is max-normalized
    assert(got("a")._1 == 1000000L)
    // d never appears (no node-node edge); _:x is a pure hub (auth 0)
    assert(!got.contains("d"))
    assert(got("_:x")._2 == 0L)
  }

  /** Straight-line synchronous LPA with the same deterministic tiebreak. */
  private def refLpa(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val nb = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lbl = nb.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val old = lbl
      lbl = nb.map { case (u, vs) =>
        val counts = vs.map(old).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        u -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lbl
  }

  test("labelPropagation: two triangles + bridge split into two communities") {
    // triangle a-b-c, triangle x-y-z, bridge c-x: LPA should give each
    // triangle one label (the bridge is outvoted by the triangle neighbors)
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x"))
    val ts = es.map { case (s, o) => (s, 0, "p", o, 0) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.labelPropagation(ts, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == refLpa(es, 3))
    // the two triangles end up with exactly two distinct community labels
    assert(Set(got("a"), got("b"), got("c")).size == 1)
    assert(Set(got("x"), got("y"), got("z")).size == 1)
    assert(got("a") != got("x"))
  }

  test("labelPropagation matches the reference on the shared fixture") {
    val got = GraphOps.labelPropagation(triples, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // undirected edges from the fixture: a-b, a-c, b-c, a-_:x (d has no
    // graph edges and is absent from the label domain)
    val expected = refLpa(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("_:x", "a")), 3)
    assert(got == expected)
    assert(!got.contains("d"))
  }

  test("kCore: 4 rounds reach the fixed point; matches the reference peel") {
    // triangle a-b-c (the 2-core) plus a pendant path c-d-e that peels away
    // over TWO rounds (e first, then d) — exercises multi-round convergence
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"))
    val ts = es.map { case (s, o) => (s, 0, "p", o, 0) }
      .toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.kCore(ts, k = 2L, rounds = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refKCore(es, 2L))
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // one more round changes nothing (fixed point genuinely reached)
    val more = GraphOps.kCore(ts, k = 2L, rounds = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(more == got)
  }

  /** Plain-Scala strict transitive closure (BFS fixpoint). */
  private def refClosure(es: Seq[(String, String)]): Set[(String, String)] = {
    var cl = es.toSet
    var grew = true
    while (grew) {
      val next = cl ++ (for ((a, b) <- cl; (c, d) <- cl if b == c) yield (a, d))
      grew = next.size > cl.size
      cl = next
    }
    cl.filter { case (a, b) => a != b }
  }

  test("subClassClosure: diamond + depth-4 chain, log-round sufficiency") {
    val es = graft.kg.Ontology.subClassEdges
    val got = GraphOps.subClassClosure(es.toDF("sub", "sup"), rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == refClosure(es))
    // depth-4 chain present end-to-end
    val dbo = graft.extract.Dict.dbo
    assert(got.contains((dbo + "City", graft.kg.Ontology.owlThing)))
    // the diamond contributes exactly one (Scientist, Agent) row
    assert(got.count(_ == (dbo + "Scientist", dbo + "Agent")) == 1)
    // 1 round (paths <= 2) provably misses the depth-4 pair — the log-round
    // bound genuinely binds, 2 rounds (paths <= 4) suffice
    val one = GraphOps.subClassClosure(es.toDF("sub", "sup"), rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!one.contains((dbo + "City", graft.kg.Ontology.owlThing)))
    val two = GraphOps.subClassClosure(es.toDF("sub", "sup"), rounds = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(two == got)
  }

  test("rdfsTypeClosure: supers inferred, direct assertion wins") {
    val dbo = graft.extract.Dict.dbo
    val onto = graft.kg.Ontology.subClassEdges.toDF("sub", "sup")
    val types = Seq(
      ("ada", dbo + "Scientist"),
      ("ada", dbo + "Person"), // redundant: derivable AND asserted
      ("london", dbo + "City")
    ).toDF("s", "cls")
    val got = GraphOps.rdfsTypeClosure(types, onto, rounds = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    val ref = refClosure(graft.kg.Ontology.subClassEdges)
    val expect =
      Map(("ada", dbo + "Scientist") -> false, ("ada", dbo + "Person") -> false,
        ("london", dbo + "City") -> false) ++
        (ref.collect { case (s, sup) if s == dbo + "Scientist" => ("ada", sup) -> true } ++
          ref.collect { case (s, sup) if s == dbo + "City" => ("london", sup) -> true })
          .filterNot { case ((_, c), _) => c == dbo + "Person" } // asserted wins
    assert(got == expect.toMap)
    assert(got(("ada", dbo + "Person")) == false)
    assert(got(("ada", dbo + "Agent")) == true)
  }

  test("constraintViolations counts DISTINCT object terms, violators only") {
    val n = Option.empty[String]
    val ts = Seq(
      // s1: 2 distinct birthPlaces across 3 statements (re-assertion ignored)
      ("s1", 0, "born", "x", 0, n, n),
      ("s1", 0, "born", "x", 0, n, n),
      ("s1", 0, "born", "y", 0, n, n),
      // s2: 1 distinct birthPlace -> no violation
      ("s2", 0, "born", "x", 0, n, n),
      // s2: same lexical form as IRI and as literal = 2 distinct TERMS
      ("s2", 0, "label", "x", 0, n, n),
      ("s2", 0, "label", "x", 2, n, n),
      // unconstrained predicate never reported
      ("s3", 0, "free", "a", 0, n, n),
      ("s3", 0, "free", "b", 0, n, n)
    ).toDF("s", "sKind", "p", "o", "oKind", "oLang", "oDt")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"oLang", $"oDt")
    val got = GraphOps.constraintViolations(ts, Seq("born" -> 1L, "label" -> 1L))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("s1", "born") -> ((2L, 1L)),
      ("s2", "label") -> ((2L, 1L))
    ))
  }

  test("fuseFacts: majority of distinct sources wins, ties by object asc") {
    val ts = Seq(
      // slot (s1, born): y supported by 2 pages (one page re-asserts), x by 1
      ("s1", 0, "born", "x", 0, "u1"),
      ("s1", 0, "born", "y", 0, "u1"),
      ("s1", 0, "born", "y", 0, "u1"), // same-page duplicate: not a 2nd source
      ("s1", 0, "born", "y", 0, "u2"),
      // slot (s2, born): 1-1 tie -> lexicographically smaller object wins
      ("s2", 0, "born", "a", 0, "u1"),
      ("s2", 0, "born", "b", 0, "u2"),
      // unfused predicate ignored; blank subject ignored
      ("s1", 0, "free", "z", 0, "u1"),
      ("_:b", 1, "born", "x", 0, "u1")
    ).toDF("s", "sKind", "p", "o", "oKind", "srcUrl")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"srcUrl")
    val got = GraphOps.fuseFacts(ts, Seq("born")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      ("s1", "born") -> (("y", 2L, 2L, 3L)),
      ("s2", "born") -> (("a", 1L, 2L, 2L))
    ))
  }

  test("typeCounts: direct vs total per class") {
    val et = Seq(
      ("a", "C1", false), ("b", "C1", false), ("c", "C1", true),
      ("a", "C2", true)
    ).toDF("s", "cls", "is_inferred")
    val got = GraphOps.typeCounts(et).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("C1" -> ((3L, 2L)), "C2" -> ((1L, 0L))))
  }

  test("domainViolations: missing entailed domain flags, blanks out of scope") {
    val ts = Seq(
      ("person", 0, "born", "x", 0),
      ("robot", 0, "born", "y", 0),  // robot is not a Person -> violation
      ("untyped", 0, "born", "z", 0), // no type info -> violation
      ("_:b", 1, "born", "x", 0)      // blank subject: out of scope
    ).toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val et = Seq(
      ("person", "Person", false), ("robot", "Machine", false)
    ).toDF("s", "cls", "is_inferred")
    val got = GraphOps.domainViolations(ts, et, Seq("born" -> "Person"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("robot", "born", "Person"), ("untyped", "born", "Person")))
  }

  test("factIntervals: per-page dedup, min/max capture, distinct page count") {
    val ts = Seq(
      ("s", 0, "rel", "o", 0, "u1"),
      ("s", 0, "rel", "o", 0, "u1"), // same-page duplicate collapses
      ("s", 0, "rel", "o", 0, "u2"),
      ("s", 0, "rel", "q", 0, "u2"),
      ("s", 0, "other", "o", 0, "u1") // unselected predicate
    ).toDF("s", "sKind", "p", "o", "oKind", "srcUrl")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"srcUrl")
    val pages = Seq(
      ("u1", new java.sql.Timestamp(1000L)),
      ("u2", new java.sql.Timestamp(5000L))
    ).toDF("url", "warc_ts")
    val got = GraphOps.factIntervals(ts, pages, Seq("rel")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      ("s", "rel", "o") -> ((1000L, 5000L, 2L)),
      ("s", "rel", "q") -> ((5000L, 5000L, 1L))
    ))
  }

  test("danglingRefs: IRI objects never seen as subject, with ref counts") {
    val got = GraphOps.danglingRefs(triples).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fixture: objects a,b,c all appear as subjects; only b is referenced
    // twice from a; no node-object is dangling except none — extend with a
    // dangling ref below
    assert(got.isEmpty)
    val ts = triples.union(Seq(("a", 0.toByte, "p5", "ghost", 0.toByte))
      .toDF("s", "sKind", "p", "o", "oKind"))
    val got2 = GraphOps.danglingRefs(ts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("ghost" -> 1L))
  }

  /** Straight-line reference of the path-pair semantics: distinct entity
    * edges, hub-capped mids, per-pair path + distinct-mid counts.
    */
  private def refPathPairs(
      edges: Seq[(String, String, String)], maxMid: Int, minPaths: Int
  ): Map[(String, String), (Long, Long)] = {
    val e = edges.distinct.filter { case (s, _, o) => s != o }
    val ind = e.groupBy(_._3).map { case (m, es) => m -> es.size }
    val outd = e.groupBy(_._1).map { case (m, es) => m -> es.size }
    val mids = (ind.keySet & outd.keySet)
      .filter(m => ind(m) <= maxMid && outd(m) <= maxMid)
    val paths = for {
      (_, p1, m) <- e if mids(m)
      (m2, p2, _) <- e if m2 == m
    } yield ((p1, p2), m)
    paths.groupBy(_._1)
      .map { case (pp, ms) => pp -> ((ms.size.toLong, ms.map(_._2).distinct.size.toLong)) }
      .filter(_._2._1 >= minPaths)
  }

  test("predPathPairs: matches reference; hub cap excludes busy mids") {
    val edges = Seq(
      ("a", "p1", "b"), ("a", "p9", "b"), ("a", "p2", "c"),
      ("b", "p1", "c"), ("c", "p1", "a"), ("_:x", "p4", "a"))
    for ((maxMid, minPaths) <- Seq((64, 2), (64, 1), (2, 1), (1, 1))) {
      val got = GraphOps.predPathPairs(triples, maxMid.toLong, minPaths.toLong)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == refPathPairs(edges, maxMid, minPaths),
        s"maxMid=$maxMid minPaths=$minPaths")
    }
    // defaults: only (p1,p1) reaches 3 paths through 3 distinct mids
    val def0 = GraphOps.predPathPairs(triples).collect()
    assert(def0.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq(("p1", "p1", 3L, 3L)))
  }

  test("skolemize: per-document genid, cross-document distinctness, " +
    "non-blank positions untouched") {
    val ts = Seq(
      ("_:x", 1, "p", "a", 0, Option.empty[String], Option.empty[String], "http://d1"),
      ("_:x", 1, "q", "lit", 2, Option.empty[String], Option.empty[String], "http://d1"), // same doc+label
      ("_:x", 1, "p", "a", 0, Option.empty[String], Option.empty[String], "http://d2"),   // other doc, same label
      ("a", 0, "p", "_:x", 1, Option.empty[String], Option.empty[String], "http://d1"),   // blank OBJECT, same doc+label
      ("a", 0, "r", "hi", 3, Option[String]("en"), Option.empty[String], "http://d1")
    ).toDF("s", "sKind", "p", "o", "oKind", "oLang", "oDt", "srcUrl")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"oLang", $"oDt", $"srcUrl")
    val got = GraphOps.skolemize(ts, "graft.invalid").collect()
    val bySrc = got.map(r => (r.getString(7), r.getString(2), r.getString(0),
      r.getByte(1), r.getString(3), r.getByte(4)))
    val skD1 = bySrc.collect { case ("http://d1", "p", s, _, _, _) => s }.head
    val skD2 = bySrc.collect { case ("http://d2", "p", s, _, _, _) => s }.head
    val skQ = bySrc.collect { case (_, "q", s, _, _, _) => s }.head
    val skObj = bySrc.collect { case (_, "p", "a", _, o, _) => o }.head
    assert(skD1.startsWith("https://graft.invalid/.well-known/genid/"))
    assert(skD1 == skQ, "same (doc, label) must map to one Skolem IRI")
    assert(skD1 == skObj, "subject and object occurrences must agree")
    assert(skD1 != skD2, "same label in different documents must differ")
    assert(got.forall(_.getByte(1) == 0) && got.forall(r => r.getByte(4) != 1),
      "blank kinds must rewrite to IRI")
    // non-blank terms byte-identical
    assert(bySrc.exists { case (_, "r", s, _, o, k) => s == "a" && o == "hi" && k == 3; case _ => false })
  }

  test("voidStats: five counts match hand enumeration; no Expand in plan") {
    val ts = Seq(
      ("a", 0, "p1", "b", 0, Option.empty[String], Option.empty[String], "u"),
      ("a", 0, "p1", "b", 0, Option.empty[String], Option.empty[String], "u"), // duplicate triple still counts
      ("a", 0, "p2", "lit", 2, Option.empty[String], Option.empty[String], "u"),
      ("b", 0, "p2", "lit", 3, Option[String]("en"), Option.empty[String], "u"), // same lexical, other kind
      ("_:z", 1, "p3", "7", 4, Option.empty[String], Option[String]("xsd:int"), "u")
    ).toDF("s", "sKind", "p", "o", "oKind", "oLang", "oDt", "srcUrl")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p", $"o",
        $"oKind".cast("byte").as("oKind"), $"oLang", $"oDt", $"srcUrl")
    val df = GraphOps.voidStats(ts)
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 3L, 3L, 1L, 3L)),
      s"got ${r.toSeq}") // subjects a,b,_:z; preds p1,p2,p3; node objs {b}; lits 3 distinct
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"count_distinct Expand in plan:\n$plan")
  }

  test("predPathPairs plan: no window, no cartesian, algebraic rollups") {
    val plan = GraphOps.predPathPairs(triples).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("Expand"), s"count_distinct expand in plan:\n$plan")
  }

  /** Exact radius-`rounds` balls (incl. self) over the undirected edge set. */
  private def refBalls(edges: Seq[(String, String)], rounds: Int): Map[String, Set[String]] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    nodes.map { n =>
      var ball = Set(n)
      for (_ <- 1 to rounds) ball = ball ++ ball.flatMap(v => und.getOrElse(v, Set.empty[String]))
      n -> ball
    }.toMap
  }

  /** (v_zero, harm_num, regs_md5, ball_est) from an exact member set via the
    * SAME hash/register/fold formulas GraphOps.hyperAnf documents.
    */
  private def refAnfRow(ball: Set[String]): (Int, String, String, Double) = {
    val m = graft.sketch.Sketch.HllM
    val regs = new Array[Int](m)
    ball.foreach { k =>
      val (j, r) = graft.sketch.Sketch.hllRegisterOf(k)
      if (r > regs(j)) regs(j) = r
    }
    val vZero = regs.count(_ == 0)
    val harmNum = regs.foldLeft(java.math.BigInteger.ZERO)((acc, rho) =>
      acc.add(java.math.BigInteger.ONE.shiftLeft(57 - rho)))
    val harm = regs.foldLeft(0.0)((acc, rho) => acc + 1.0 / (1L << rho).toDouble)
    val est = graft.sketch.Sketch.HllAlpha * (m.toDouble * m.toDouble) / harm
    val dump = regs.zipWithIndex.collect { case (r, j) if r > 0 => s"$j:$r" }.mkString(",")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dump.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (vZero, harmNum.toString, md5, est)
  }

  private def edgeDf(edges: Seq[(String, String)]) =
    edges.toDF("s", "o")
      .select($"s", F.lit(0).cast("byte").as("sKind"), F.lit("p").as("p"),
        $"o", F.lit(0).cast("byte").as("oKind"),
        F.lit(null).cast("string").as("oLang"), F.lit(null).cast("string").as("oDt"))

  test("hyperAnf: registers equal a rebuild from exact balls at every radius") {
    // two components + a cycle so balls differ per node and per radius:
    // chain s-a-b-c with shortcut s-b, triangle x-y-z, literal edge ignored
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "b"),
      ("x", "y"), ("y", "z"), ("z", "x"))
    val ts = edgeDf(edges)
    for (rounds <- 0 to 3) {
      val balls = refBalls(edges, rounds)
      val got = GraphOps.hyperAnf(ts, rounds).collect()
        .map(r => r.getString(0) ->
          ((r.getInt(1), r.getString(2), r.getString(3), r.getDouble(4)))).toMap
      assert(got.keySet == balls.keySet, s"rounds=$rounds node sets differ")
      for ((n, ball) <- balls) {
        assert(got(n) == refAnfRow(ball), s"rounds=$rounds node=$n ball=$ball")
      }
    }
    // radius 0 sanity: exactly one register set
    val r0 = GraphOps.hyperAnf(ts, 0).collect()
    assert(r0.forall(_.getInt(1) == graft.sketch.Sketch.HllM - 1))
  }

  test("hyperAnf: linear-counting-corrected estimate tracks exact ball size " +
    "on a 300-leaf star") {
    val m = graft.sketch.Sketch.HllM
    val edges = (1 to 300).map(i => ("hub", s"leaf$i"))
    val got = GraphOps.hyperAnf(edgeDf(edges), 2).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(4)))).toMap
    // every node's radius-2 ball is the whole star (301 nodes)
    for ((n, (vZero, rawEst)) <- got) {
      val est =
        if (vZero > 0 && rawEst < 2.5 * m) m * math.log(m.toDouble / vZero)
        else rawEst
      assert(math.abs(est - 301.0) / 301.0 < 0.15,
        s"node=$n corrected=$est raw=$rawEst vZero=$vZero")
    }
    // all sketches converged to the same registers -> same digest
    val digests = GraphOps.hyperAnf(edgeDf(edges), 2).collect()
      .map(_.getString(3)).toSet
    assert(digests.size == 1)
  }

  test("anfCurve: per-radius integer stats equal a rebuild from exact balls; " +
    "curve saturates at the component diameter") {
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "b"),
      ("x", "y"), ("y", "z"), ("z", "x"))
    val rounds = 3
    val modP = java.math.BigInteger.valueOf(2147483647L)
    def expectedRow(t: Int): (Long, Long, Long, Long) = {
      val balls = refBalls(edges, t)
      var vZero = 0L; var rhoSum = 0L; var massMod = 0L
      for ((_, ball) <- balls) {
        val regs = new Array[Int](graft.sketch.Sketch.HllM)
        ball.foreach { k =>
          val (j, r) = graft.sketch.Sketch.hllRegisterOf(k)
          if (r > regs(j)) regs(j) = r
        }
        vZero += regs.count(_ == 0).toLong
        rhoSum += regs.filter(_ > 0).map(_.toLong).sum
        val mass = regs.foldLeft(java.math.BigInteger.ZERO)((acc, rho) =>
          acc.add(java.math.BigInteger.ONE.shiftLeft(57 - rho)))
        massMod += mass.mod(modP).longValue
      }
      (balls.size.toLong, vZero, rhoSum, massMod)
    }
    val got = GraphOps.anfCurve(edgeDf(edges), rounds).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == (0 to rounds).toSet)
    for (t <- 0 to rounds) assert(got(t) == expectedRow(t), s"t=$t")
    // diameters: chain component saturates at t=2 (s-b shortcut), triangle
    // at t=1 — so the curve must still move 1->2 and freeze 2->3
    assert(got(1) != got(2), "curve frozen before the chain diameter")
    assert(got(2) == got(3), "curve must saturate at the graph diameter")
  }

  test("hyperAnf round plan: algebraic partial aggregation before the " +
    "shuffle, no window, no cartesian") {
    // plan one un-checkpointed round directly (the driver loop truncates
    // lineage per round)
    val edges0 = Seq(("s", "a"), ("a", "b"))
    val dir = edgeDf(edges0).select($"s".as("src"), $"o".as("dst"))
    val edges = dir.union(dir.select($"dst", $"src")).distinct()
    val initUdf = F.udf((n: String) => {
      val a = new Array[Byte](graft.sketch.Sketch.HllM)
      val (j, rho) = graft.sketch.Sketch.hllRegisterOf(n)
      a(j) = rho.toByte
      a
    })
    val state = edges.select($"src".as("node")).distinct()
      .withColumn("regs", initUdf($"node"))
    val df = GraphOps.anfRound(state, edges)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
    // the register merge must be a two-phase (partial -> final) object hash
    // aggregation: map-side combine collapses a hub's incoming sketches to
    // one array per task BEFORE the exchange
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
    val partialIdx = plan.indexOf("ObjectHashAggregate")
    assert(plan.indexOf("ObjectHashAggregate", partialIdx + 1) > 0,
      s"single-phase aggregate (no partial):\n$plan")
  }

  test("clusteringCoefficients: exact ppm on a hand-checked graph") {
    // undirected distinct edges: a-b, a-c, b-c (triangle) plus c-d (tail)
    val t = Seq(
      ("a", 0, "p1", "b", 0),
      ("a", 0, "p2", "c", 0),
      ("b", 0, "p1", "c", 0),
      ("c", 0, "p1", "d", 0),
      ("b", 0, "p9", "a", 0) // reverse duplicate of a-b: must collapse
    ).toDF("s", "sKind", "p", "o", "oKind")
      .select($"s", $"sKind".cast("byte").as("sKind"), $"p",
        $"o", $"oKind".cast("byte").as("oKind"))
    val got = GraphOps.clusteringCoefficients(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // a: deg 2, 1 tri -> 2e6/2 = 1000000; b: deg 2, 1 tri -> 1000000;
    // c: deg 3, 1 tri -> 2000000/6 = 333333; d: deg 1 -> 0
    assert(got == Map(
      "a" -> ((2L, 1L, 1000000L)),
      "b" -> ((2L, 1L, 1000000L)),
      "c" -> ((3L, 1L, 333333L)),
      "d" -> ((1L, 0L, 0L))
    ))
  }

  test("randomWalks: matches a straight-line reference walker; sinks end " +
    "early; degree cap keeps the smallest tails") {
    // encoded-id edge fixture: 0 -> {1,2,3}, 1 -> {2}, 2 -> {0}, 3 sink;
    // plus a hub 4 -> {0..9} to exercise the maxDeg cap (cap 4 keeps 0,1,2,3)
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 0L)) ++
      (0L to 9L).map(d => (4L, d)))
      .toDF("h_id", "t_id")
      .withColumn("r_id", F.lit(0L))
    val seed = 17L
    val len = 3
    val maxDeg = 4
    val got = GraphOps.randomWalks(edges, seed, len, maxDeg)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // straight-line reference walker over the same capped sorted adjacency
    val adj: Map[Long, Vector[Long]] = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (2L, 0L)).++((0L to 9L).map(d => (4L, d)))
      .groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).distinct.sorted.take(maxDeg).toVector }
    val expected = scala.collection.mutable.Set[(Long, Int, Long)]()
    adj.keys.foreach { start =>
      var cur = start
      expected += ((start, 0, cur))
      var t = 1
      var alive = true
      while (t <= len && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val m = graft.extract.Synth.mix64(
              seed ^ (cur * 1000003L + start * 7919L + t))
            cur = nbrs(java.lang.Long.remainderUnsigned(m, nbrs.size.toLong).toInt)
            expected += ((start, t, cur))
          case None => alive = false
        }
        t += 1
      }
    }
    assert(got == expected.toSet)
    // walks genuinely end early at the sink (node 3 has no out-edges, and
    // some walk must reach it from 0 or 4 at some step < len with positive
    // probability under this seed — assert structurally instead: every
    // (start, t) with a node that has out-edges must have a t+1 row)
    got.filter(_._2 < len).foreach { case (s, t, n) =>
      if (adj.contains(n))
        assert(got.exists(r => r._1 == s && r._2 == t + 1),
          s"walk from $s stalled at live node $n step $t")
      else
        assert(!got.exists(r => r._1 == s && r._2 == t + 1),
          s"walk from $s continued past sink $n step $t")
    }
    // the hub's step-1 targets stay within the capped smallest tails {0,1,2,3}
    got.filter(r => r._1 == 4L && r._2 == 1).foreach { case (_, _, n) =>
      assert(n <= 3L, s"hub walk escaped the degree cap: $n")
    }
    // plan: the degree cap is the bounded partial aggregation, never a
    // per-node window; no cartesian anywhere in the step joins
    val plan = GraphOps.randomWalks(edges, seed, len, maxDeg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }

  test("link prediction: filtered ranks never exceed raw ranks; hits " +
    "monotone; filtered >= raw on every hits tier") {
    val enc = Seq((0L, 0L, 1L), (1L, 0L, 2L), (2L, 0L, 3L), (3L, 1L, 0L),
      (4L, 1L, 2L), (0L, 1L, 4L), (5L, 0L, 0L), (2L, 1L, 5L))
      .toDF("h_id", "r_id", "t_id")
    def byRel(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("r_id") ->
        (r.getAs[Long]("n_triples"), r.getAs[Long]("hits1"),
          r.getAs[Long]("hits3"), r.getAs[Long]("hits10"),
          r.getAs[Long]("rank_sum"))).toMap
    val raw = byRel(GraphOps.linkPredictionEval(
      enc, dim = 4, entSeed = 101L, relSeed = 202L, candSeed = 31L, numCands = 16))
    val flt = byRel(GraphOps.linkPredictionEvalFiltered(
      enc, dim = 4, entSeed = 101L, relSeed = 202L, candSeed = 31L, numCands = 16))
    assert(raw.keySet == flt.keySet)
    raw.keySet.foreach { rel =>
      val (n, h1, h3, h10, rs) = raw(rel)
      val (nf, f1, f3, f10, rsf) = flt(rel)
      assert(n == nf)
      assert(h1 <= h3 && h3 <= h10 && h10 <= n, s"raw hits not monotone for $rel")
      assert(f1 <= f3 && f3 <= f10 && f10 <= n, s"filtered hits not monotone for $rel")
      // filtering removes counted competitors -> ranks can only improve
      assert(rsf <= rs, s"filtered rank_sum worse than raw for $rel")
      assert(f1 >= h1 && f3 >= h3 && f10 >= h10, s"filtered hits below raw for $rel")
    }
  }
}
