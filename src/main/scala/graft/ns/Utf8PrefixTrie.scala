package graft.ns

import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Byte-packed longest-prefix trie over UTF-8 keys, walked directly on a
  * Spark `UTF8String` with zero per-call allocation — the executor-side form
  * of [[PrefixTrie]] used by the codegen'd [[ResolveNs]] expression.
  *
  * Correctness: keys are inserted as their UTF-8 byte sequences; because
  * UTF-8 is prefix-free per code point, a terminal byte-node always falls on
  * a character boundary, so byte-wise longest-terminal-prefix equals the
  * char-wise result of `PrefixTrie.resolve` for every valid UTF-8 input
  * (property-tested against it in ResolveNsExprSpec).
  *
  * Matches reference semantics `longest_prefix(iri, must_be_terminal=true)`
  * with empty-prefix misses (chilon_rs `src/trie.rs:249-296`,
  * `src/prefixes.rs:195-196`).
  */
final class Utf8PrefixTrie[V] private (
    private val childStart: Array[Int],
    private val childCount: Array[Int],
    private val childByte: Array[Byte],
    private val childNode: Array[Int],
    private val valueIdx: Array[Int],
    private val values: Array[AnyRef],
    private val prefixes: Array[String]
) extends Serializable {

  @inline private def childOf(node: Int, b: Byte): Int = {
    var lo = childStart(node)
    var hi = lo + childCount(node) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mb = childByte(mid)
      if (mb == b) return childNode(mid)
      else if ((mb & 0xff) < (b & 0xff)) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Longest terminal prefix with value; empty prefix counts as a miss.
    * Returns the value index, or -1. Allocation-free.
    */
  def resolveIdx(s: UTF8String): Int = {
    if (s == null) return -1
    var node = 0
    var best = -1
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (i > 0 && valueIdx(node) >= 0) best = valueIdx(node)
      val next = childOf(node, s.getByte(i))
      if (next < 0) {
        return if (valueIdx(node) >= 0 && i > 0) valueIdx(node) else best
      }
      node = next
      i += 1
    }
    if (valueIdx(node) >= 0 && n > 0) valueIdx(node) else best
  }

  def valueCount: Int = values.length
  def valueAt(idx: Int): V = values(idx).asInstanceOf[V]
  def prefixAt(idx: Int): String = prefixes(idx)

  def resolve(s: UTF8String): Option[(String, V)] = {
    val i = resolveIdx(s)
    if (i < 0) None else Some((prefixes(i), valueAt(i)))
  }
}

object Utf8PrefixTrie {

  def apply[V](kvs: Iterable[(String, V)]): Utf8PrefixTrie[V] = {
    final class MNode {
      val children = new java.util.TreeMap[Integer, MNode]() // unsigned byte key
      var value: AnyRef = _
      var prefix: String = _
      var terminal = false
    }
    val root = new MNode
    kvs.foreach { case (k, v) =>
      val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var n = root
      var i = 0
      while (i < bytes.length) {
        n = n.children.computeIfAbsent(bytes(i) & 0xff, _ => new MNode)
        i += 1
      }
      n.terminal = true
      n.value = v.asInstanceOf[AnyRef]
      n.prefix = k
    }
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
    val cb = mutable.ArrayBuffer[Byte]()
    val cn = mutable.ArrayBuffer[Int]()
    val vals = mutable.ArrayBuffer[AnyRef]()
    val prefs = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < nNodes) {
      val n = nodes(i)
      childStart(i) = cb.length
      childCount(i) = n.children.size
      n.children.forEach { (b, child) => cb += b.toByte; cn += idOf.get(child) }
      if (n.terminal) { valueIdx(i) = vals.length; vals += n.value; prefs += n.prefix }
      i += 1
    }
    new Utf8PrefixTrie[V](childStart, childCount, cb.toArray, cn.toArray,
      valueIdx, vals.toArray, prefs.toArray)
  }
}
