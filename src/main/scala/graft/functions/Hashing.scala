package graft.functions

/** Small, dependency-free 64-bit hashing kernels for sketch operators
  * (MinHash, SimHash). Public-domain constructions: FNV-1a for byte
  * streams, SplitMix64 as the per-permutation mixer.
  *
  * These run inside JIT-compiled mapPartitions kernels: an interpreted
  * Catalyst higher-order-function lambda costs ~9 µs per element (measured
  * at sf0.1 — 17M evaluations = 150 s single-task); the same loop in Scala
  * is ~20 ns. Sketch inner loops are exactly the "(d) mapPartitions as a
  * last resort" case — everything around them stays declarative.
  */
object Hashing {

  /** FNV-1a over the UTF-8 bytes of a string. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SplitMix64 finalizer — decorrelates related inputs. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic per-permutation seeds. */
  def seeds(n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = mix64(0x51_7c_c1_b7_27_22_0a95L + i.toLong); i += 1 }
    out
  }

  /** Distinct word-bigram shingle hashes of a whitespace-tokenized text.
    * Tokenizes with limit -1 (trailing empty tokens KEPT) so the kernel
    * agrees with Spark SQL `split` and DuckDB `string_split` on inputs
    * with trailing separators — Java's 1-arg split would silently drop
    * them and diverge from every oracle. */
  def shingleHashes(text: String): Array[Long] = {
    val w = text.split(" ", -1)
    if (w.length < 2) return Array(fnv1a64(text))
    val set = new java.util.HashSet[Long](w.length * 2)
    var i = 0
    while (i < w.length - 1) {
      set.add(fnv1a64(w(i) + " " + w(i + 1)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** MinHash signature: sig(p) = min over shingles of mix64(h ^ seed(p)). */
  def minhashSignature(hs: Array[Long], seed: Array[Long]): Array[Long] = {
    val sig = new Array[Long](seed.length)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < seed.length) {
        val v = mix64(h ^ seed(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Order-sensitive fold of a signature slice into one band hash. */
  def bandHash(sig: Array[Long], from: Int, len: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = from
    while (i < from + len) { h = mix64(h ^ sig(i)); i += 1 }
    h
  }

  /** 64-bit SimHash over token hashes with per-token weights = 1. */
  def simhash64(tokenHashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) out |= (1L << k); k += 1 }
    out
  }
}
