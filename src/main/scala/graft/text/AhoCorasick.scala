package graft.text

import scala.collection.mutable

/** Aho-Corasick multi-pattern string automaton.
  *
  * Built once on the driver from the vocabulary dictionaries and
  * broadcast to executors (the Spark idiom for the reference's
  * per-worker automaton build, reference BioentityTagger.py:33-104 /
  * main.py:486-496). Reports every occurrence of every added word
  * (like pyahocorasick's `Automaton.iter`), including overlaps.
  *
  * Flat-array representation: child maps during build, frozen into
  * parallel arrays for cache-friendly scans and cheap Java
  * serialization (one object graph, no per-node boxing).
  */
final class AhoCorasick[V] private (
    // per-state transition tables: sorted char keys + target states
    private val transChars: Array[Array[Char]],
    private val transTargets: Array[Array[Int]],
    private val fail: Array[Int],
    // per-state payload: index into values of the word ending here (-1 none)
    private val valueIdx: Array[Int],
    // chain of suffix words: next state whose word is a proper suffix (-1 none)
    private val outputLink: Array[Int],
    private val wordLen: Array[Int],
    val values: Array[V],
) extends Serializable {

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val chars = transChars(s)
      val i = java.util.Arrays.binarySearch(chars, c)
      if (i >= 0) return transTargets(s)(i)
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  /** Scan `text`, invoking `f(endExclusive, wordLength, value)` for every
    * match. Overlapping and nested matches all reported. */
  def scan(text: CharSequence)(f: (Int, Int, V) => Unit): Unit = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      var o = s
      while (o != -1) {
        val vi = valueIdx(o)
        if (vi >= 0) f(i + 1, wordLen(o), values(vi))
        o = outputLink(o)
      }
      i += 1
    }
  }

  /** True iff any pattern occurs in `text` — returns on the FIRST hit
    * instead of completing the scan (existence checks — semi/anti
    * dictionary joins — only need one). */
  def exists(text: CharSequence): Boolean = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      s = step(s, text.charAt(i))
      var o = s
      while (o != -1) {
        if (valueIdx(o) >= 0) return true
        o = outputLink(o)
      }
      i += 1
    }
    false
  }

  def nStates: Int = fail.length
}

object AhoCorasick {

  final class Builder[V] {
    private val children = mutable.ArrayBuffer(mutable.SortedMap.empty[Char, Int])
    private val valueOf = mutable.HashMap.empty[Int, V]
    private val lenOf = mutable.HashMap.empty[Int, Int]

    /** Add `word` → `value`. If the word exists, `merge` combines values. */
    def add(word: String, value: V, merge: (V, V) => V = (a: V, _: V) => a): Unit = {
      if (word.isEmpty) return
      var s = 0
      word.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.SortedMap.empty[Char, Int]
          children.length - 1
        })
      }
      valueOf(s) = valueOf.get(s).map(old => merge(old, value)).getOrElse(value)
      lenOf(s) = word.length
    }

    def get(word: String): Option[V] = {
      var s = 0
      word.foreach { c =>
        children(s).get(c) match {
          case Some(t) => s = t
          case None => return None
        }
      }
      valueOf.get(s)
    }

    def build(): AhoCorasick[V] = {
      val n = children.length
      val fail = new Array[Int](n)
      val outputLink = Array.fill(n)(-1)
      val valueIdx = Array.fill(n)(-1)
      val wordLen = new Array[Int](n)
      val valuesBuf = mutable.ArrayBuffer.empty[V]
      valueOf.foreach { case (s, v) =>
        valueIdx(s) = valuesBuf.length
        valuesBuf += v
        wordLen(s) = lenOf(s)
      }
      // BFS failure links
      val queue = mutable.Queue.empty[Int]
      children(0).foreach { case (_, t) => fail(t) = 0; queue.enqueue(t) }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        outputLink(s) =
          if (valueIdx(fail(s)) >= 0) fail(s) else outputLink(fail(s))
        children(s).foreach { case (c, t) =>
          var f = fail(s)
          var target = 0
          var found = false
          while (!found) {
            children(f).get(c) match {
              case Some(x) => target = x; found = true
              case None =>
                if (f == 0) { target = 0; found = true } else f = fail(f)
            }
          }
          fail(t) = target
          queue.enqueue(t)
        }
      }
      val transChars = new Array[Array[Char]](n)
      val transTargets = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val m = children(i)
        transChars(i) = m.keysIterator.toArray
        transTargets(i) = m.valuesIterator.toArray
        i += 1
      }
      new AhoCorasick[V](transChars, transTargets, fail, valueIdx,
        outputLink, wordLen, valuesBuf.toArray[Any].asInstanceOf[Array[V]])
    }
  }

  def builder[V]: Builder[V] = new Builder[V]
}
