package graft

import graft.ns.PrefixTrie
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference trie tests (chilon_rs `src/trie.rs:396-796`),
  * specifically the longest-prefix / find variants at `:664-772`.
  */
class PrefixTrieSpec extends AnyFunSuite {

  private val words = PrefixTrie(Seq(
    "this is words" -> 1,
    "this is more" -> 2,
    "this is more words" -> 3
  ))

  test("longest_prefix terminal-required picks deepest terminal (trie.rs:664-679)") {
    val r = words.longestPrefix("this is more wo", mustBeTerminal = true)
    assert(r.contains(("this is more", 2)))
  }

  test("longest_prefix non-terminal returns the walk frontier (trie.rs:681-694)") {
    val r = words.longestPrefix("this is more wo", mustBeTerminal = false)
    assert(r.map(_._1).contains("this is more wo"))
  }

  test("longest_prefix terminal-required fails when no terminal passed (trie.rs:696-703)") {
    assert(words.longestPrefix("this is", mustBeTerminal = true).isEmpty)
  }

  test("longest_prefix non-terminal on partial query returns query frontier") {
    val r = words.longestPrefix("this is", mustBeTerminal = false)
    assert(r.map(_._1).contains("this is"))
  }

  test("find exact terminal (trie.rs:714-733)") {
    assert(words.find("this is more", mustBeTerminal = true).contains(("this is more", 2)))
    assert(words.find("this is more words", mustBeTerminal = true).contains(("this is more words", 3)))
  }

  test("find requires full match") {
    assert(words.find("this is more wo", mustBeTerminal = true).isEmpty)
    assert(words.find("this is mo", mustBeTerminal = true).isEmpty)
  }

  test("find non-terminal interior node succeeds when terminality not required") {
    assert(words.find("this is", mustBeTerminal = false).map(_._1).contains("this is"))
  }

  test("contains_key (trie.rs:653-662)") {
    assert(words.containsKey("this is words"))
    assert(!words.containsKey("this is"))
    assert(!words.containsKey("absent"))
  }

  test("empty trie") {
    val t = PrefixTrie.empty[Int]
    assert(t.longestPrefix("anything", mustBeTerminal = true).isEmpty)
    assert(t.find("", mustBeTerminal = false).map(_._1).contains(""))
  }

  test("single char and unicode keys") {
    val t = PrefixTrie(Seq("a" -> 10, "日本語/" -> 11))
    assert(t.longestPrefix("abc", mustBeTerminal = true).contains(("a", 10)))
    assert(t.longestPrefix("日本語/x", mustBeTerminal = true).contains(("日本語/", 11)))
  }

  test("resolve treats empty-prefix match as miss (prefixes.rs:195-196)") {
    val t = PrefixTrie(Seq("" -> 0, "http://x/" -> 1))
    assert(t.resolve("zzz").isEmpty)
    assert(t.resolve("http://x/y").contains(("http://x/", 1)))
  }

  test("entries round-trips lexicographically") {
    assert(words.entries.map(_._1) == Vector("this is more", "this is more words", "this is words"))
  }

  test("overlapping namespaces pick the longest") {
    val t = PrefixTrie(Seq(
      "http://dbpedia.org/" -> "a",
      "http://dbpedia.org/resource/" -> "b",
      "http://dbpedia.org/resource/Category:" -> "c"
    ))
    assert(t.resolve("http://dbpedia.org/resource/Category:X").map(_._2).contains("c"))
    assert(t.resolve("http://dbpedia.org/resource/X").map(_._2).contains("b"))
    assert(t.resolve("http://dbpedia.org/ontology/X").map(_._2).contains("a"))
    assert(t.resolve("http://example.org/").isEmpty)
  }

  test("longestPrefix agrees with a naive linear scan on random inputs (property)") {
    val alphabet = "ab/#:"
    def randString(seed: org.scalacheck.rng.Seed, len: Int): String = {
      var s = seed
      (0 until len).map { _ =>
        val (v, s2) = s.long; s = s2
        alphabet(((v % alphabet.length + alphabet.length) % alphabet.length).toInt)
      }.mkString
    }
    (1 to 200).foreach { trial =>
      var seed = org.scalacheck.rng.Seed(trial.toLong)
      def nextInt(bound: Int): Int = {
        val (v, s2) = seed.long; seed = s2
        ((v % bound + bound) % bound).toInt
      }
      val keys = (0 until (1 + nextInt(8))).map(_ => randString(seed, 1 + nextInt(6))).distinct
      val trie = PrefixTrie(keys.map(k => k -> k))
      (0 until 10).foreach { _ =>
        val q = randString(seed, nextInt(9))
        val got = trie.longestPrefix(q, mustBeTerminal = true).map(_._1)
        val want = keys.filter(q.startsWith).sortBy(-_.length).headOption
        assert(got == want, s"trial=$trial keys=$keys q='$q' got=$got want=$want")
      }
    }
  }

  test("MutablePrefixTrie.longestPrefix agrees with the packed trie (property)") {
    val alphabet = "ab/#:"
    def randString(seed0: org.scalacheck.rng.Seed, len: Int): (String, org.scalacheck.rng.Seed) = {
      var s = seed0
      val str = (0 until len).map { _ =>
        val (v, s2) = s.long; s = s2
        alphabet(((v % alphabet.length + alphabet.length) % alphabet.length).toInt)
      }.mkString
      (str, s)
    }
    (1 to 200).foreach { trial =>
      var seed = org.scalacheck.rng.Seed(trial.toLong + 7777)
      def nextInt(bound: Int): Int = {
        val (v, s2) = seed.long; seed = s2
        ((v % bound + bound) % bound).toInt
      }
      def nextString(len: Int): String = { val (s, s2) = randString(seed, len); seed = s2; s }
      val mut = new graft.ns.MutablePrefixTrie[String]
      val keys = (0 until (1 + nextInt(8))).map(_ => nextString(1 + nextInt(6)))
      keys.foreach(k => mut.insert(k, k))
      val packedIncr = mut.pack
      val packedBatch = PrefixTrie(keys.map(k => k -> k))
      assert(packedIncr.entries == packedBatch.entries, s"trial=$trial keys=$keys")
      (0 until 10).foreach { _ =>
        val q = nextString(nextInt(9))
        Seq(true, false).foreach { mbt =>
          assert(mut.longestPrefix(q, mbt) == packedBatch.longestPrefix(q, mbt),
            s"trial=$trial keys=$keys q='$q' mbt=$mbt")
        }
      }
    }
  }

  test("serializable (broadcast requirement)") {
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(words)
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val t2 = in.readObject().asInstanceOf[PrefixTrie[Int]]
    assert(t2.longestPrefix("this is more wo", mustBeTerminal = true).contains(("this is more", 2)))
  }
}
