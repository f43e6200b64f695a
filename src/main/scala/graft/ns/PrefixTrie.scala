package graft.ns

import scala.collection.mutable

/** Immutable, array-packed character trie mapping namespace prefixes to values.
  *
  * This is the broadcast replacement for the reference's in-process
  * `NamespaceTrie` (chilon_rs `src/trie.rs`, `src/ns_trie.rs:27`). Semantics of
  * `longestPrefix` / `find` mirror `src/trie.rs:240-296` exactly, including the
  * `must_be_terminal` edge cases:
  *
  *   - `longestPrefix(s, mustBeTerminal)`: walk as far as the trie matches `s`;
  *     if the stopping node is terminal (or terminality is not required) return it,
  *     otherwise fall back to the last terminal node passed on the way down.
  *     The *stopping node itself* is only eligible when the walk consumed either
  *     the whole query or the whole path to it.
  *   - `find(s, mustBeTerminal)`: exact-match variant (`must_match_fully`).
  *
  * Packed layout: one flat node table with contiguous, char-sorted child ranges so
  * lookups are a binary search per character and the whole structure is a handful
  * of primitive arrays — cheap to serialize into a broadcast and allocation-free
  * to query (the hot path of the engine, cf. SURVEY.md P4).
  *
  * @param valueIdx  per node: index into `values`, or -1 when not terminal
  */
final class PrefixTrie[V] private (
    private val childStart: Array[Int],
    private val childCount: Array[Int],
    private val childChar: Array[Char],
    private val childNode: Array[Int],
    private val valueIdx: Array[Int],
    private val values: Array[AnyRef]
) extends Serializable {

  def size: Int = values.length

  @inline private def childOf(node: Int, c: Char): Int = {
    var lo = childStart(node)
    var hi = lo + childCount(node) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = childChar(mid)
      if (mc == c) return childNode(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Longest registered prefix of `s`. Returns (prefix, value) or None.
    * Mirrors reference `longest_prefix` (`src/trie.rs:249-296`).
    */
  def longestPrefix(s: String, mustBeTerminal: Boolean): Option[(String, V)] =
    lookup(s, mustBeTerminal, mustMatchFully = false)

  /** Exact-match lookup (`src/trie.rs:240-246`). */
  def find(s: String, mustBeTerminal: Boolean): Option[(String, V)] =
    lookup(s, mustBeTerminal, mustMatchFully = true)

  def containsKey(s: String): Boolean = find(s, mustBeTerminal = true).isDefined

  private def lookup(
      s: String,
      mustBeTerminal: Boolean,
      mustMatchFully: Boolean
  ): Option[(String, V)] = {
    var node = 0
    var i = 0
    var lastTermDepth = -1
    var lastTermNode = -1
    val n = s.length
    while (i < n) {
      // record the deepest terminal strictly above the stopping point
      if (valueIdx(node) >= 0) { lastTermDepth = i; lastTermNode = node }
      val next = childOf(node, s.charAt(i))
      if (next < 0) {
        // ran out of path before consuming the query
        if (mustMatchFully) return None
        if (valueIdx(node) < 0 && mustBeTerminal)
          return lastTerm(s, lastTermDepth, lastTermNode)
        return result(s, i, node)
      }
      node = next
      i += 1
    }
    // consumed whole query
    if (valueIdx(node) < 0 && mustBeTerminal) {
      if (mustMatchFully) None else lastTerm(s, lastTermDepth, lastTermNode)
    } else result(s, n, node)
  }

  private def lastTerm(s: String, depth: Int, node: Int): Option[(String, V)] =
    if (node < 0) None else result(s, depth, node)

  private def result(s: String, depth: Int, node: Int): Option[(String, V)] = {
    val vi = valueIdx(node)
    val v = if (vi >= 0) values(vi).asInstanceOf[V] else null.asInstanceOf[V]
    Some((s.substring(0, depth), v))
  }

  /** Value of the longest *terminal* prefix, null-free convenience for UDFs. */
  def resolve(s: String): Option[(String, V)] = {
    val r = longestPrefix(s, mustBeTerminal = true)
    // reference `insert_resource` treats an empty-string match as a miss
    // (src/prefixes.rs:195-196)
    r.filter { case (p, v) => p.nonEmpty && v != null }
  }

  /** All (prefix, value) terminal entries in lexicographic order. */
  def entries: Vector[(String, V)] = {
    val buf = Vector.newBuilder[(String, V)]
    def rec(node: Int, acc: StringBuilder): Unit = {
      if (valueIdx(node) >= 0)
        buf += ((acc.toString, values(valueIdx(node)).asInstanceOf[V]))
      var i = childStart(node)
      val end = childStart(node) + childCount(node)
      while (i < end) {
        acc.append(childChar(i))
        rec(childNode(i), acc)
        acc.setLength(acc.length - 1)
        i += 1
      }
    }
    rec(0, new StringBuilder)
    buf.result()
  }
}

object PrefixTrie {

  /** Build from (prefix -> value) pairs; later duplicates overwrite earlier. */
  def apply[V](kvs: Iterable[(String, V)]): PrefixTrie[V] = {
    val m = new MutablePrefixTrie[V]
    kvs.foreach { case (k, v) => m.insert(k, v) }
    m.pack
  }

  def empty[V]: PrefixTrie[V] = apply[V](Nil)

  private[ns] def packed[V](
      childStart: Array[Int], childCount: Array[Int], childChar: Array[Char],
      childNode: Array[Int], valueIdx: Array[Int], values: Array[AnyRef]
  ): PrefixTrie[V] =
    new PrefixTrie[V](childStart, childCount, childChar, childNode, valueIdx, values)
}

/** Driver-side construction trie: O(|key|) incremental insert plus the same
  * `longestPrefix` semantics as the packed [[PrefixTrie]], so registry builds
  * are linear in total key length instead of quadratic (the r2 shape rebuilt
  * the packed trie after every accepted insert to run the subsumption check —
  * fine at 296 prefixes, a real stall at a 10k+ community map plus per-round
  * inference inserts). `pack` emits the immutable broadcastable form once at
  * the end. Not thread-safe; never leaves the driver.
  */
final class MutablePrefixTrie[V] {
  private final class MNode {
    val children = new java.util.TreeMap[Character, MNode]()
    var value: AnyRef = _
    var terminal = false
  }
  private val root = new MNode
  private var count = 0

  def size: Int = count

  def insert(k: String, v: V): Unit = {
    var n = root
    var i = 0
    while (i < k.length) {
      n = n.children.computeIfAbsent(k.charAt(i), _ => new MNode)
      i += 1
    }
    if (!n.terminal) count += 1
    n.terminal = true
    n.value = v.asInstanceOf[AnyRef]
  }

  /** Same contract as [[PrefixTrie.longestPrefix]] (property-tested equal). */
  def longestPrefix(s: String, mustBeTerminal: Boolean): Option[(String, V)] = {
    var node = root
    var i = 0
    var lastTermDepth = -1
    val n = s.length
    var lastTermNode: MNode = null
    while (i < n) {
      if (node.terminal) { lastTermDepth = i; lastTermNode = node }
      val next = node.children.get(s.charAt(i))
      if (next == null) {
        if (!node.terminal && mustBeTerminal)
          return if (lastTermNode == null) None
                 else Some((s.substring(0, lastTermDepth), lastTermNode.value.asInstanceOf[V]))
        return Some((s.substring(0, i), if (node.terminal) node.value.asInstanceOf[V] else null.asInstanceOf[V]))
      }
      node = next
      i += 1
    }
    if (!node.terminal && mustBeTerminal) {
      if (lastTermNode == null) None
      else Some((s.substring(0, lastTermDepth), lastTermNode.value.asInstanceOf[V]))
    } else Some((s, if (node.terminal) node.value.asInstanceOf[V] else null.asInstanceOf[V]))
  }

  /** BFS-pack into the immutable array form (children contiguous, sorted). */
  def pack: PrefixTrie[V] = {
    val nodes = mutable.ArrayBuffer[MNode](root)
    val queue = mutable.Queue[MNode](root)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      n.children.values.forEach { c => nodes += c; queue.enqueue(c) }
    }
    val idOf = new java.util.IdentityHashMap[MNode, Integer]()
    nodes.zipWithIndex.foreach { case (n, i) => idOf.put(n, i) }

    val nNodes = nodes.length
    val childStart = new Array[Int](nNodes)
    val childCount = new Array[Int](nNodes)
    val valueIdx = Array.fill(nNodes)(-1)
    val cc = mutable.ArrayBuffer[Char]()
    val cn = mutable.ArrayBuffer[Int]()
    val vals = mutable.ArrayBuffer[AnyRef]()
    var i = 0
    while (i < nNodes) {
      val n = nodes(i)
      childStart(i) = cc.length
      childCount(i) = n.children.size
      n.children.forEach { (ch, child) => cc += ch; cn += idOf.get(child) }
      if (n.terminal) { valueIdx(i) = vals.length; vals += n.value }
      i += 1
    }
    PrefixTrie.packed[V](childStart, childCount, cc.toArray, cn.toArray, valueIdx, vals.toArray)
  }
}
