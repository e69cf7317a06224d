package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the graft native hash expressions
  * (graft.plans.NativeExprs). Called from whole-stage-generated code via
  * the Scala static forwarders, so the per-token / per-shingle loops run
  * as compiled JVM code instead of interpreted Catalyst higher-order
  * folds — the ~80 ms/doc front-end cost the round-2 bench flagged.
  *
  * Every kernel is bit-for-bit equivalent to the Column-function spec in
  * [[hashing]] / [[vectors]] (md5 hex domain, left-fold double sums), so
  * the DuckDB oracles are unchanged.
  */
object NativeHashOps {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(bytes)
  }

  private val HEX = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HEX((b(i) >> 4) & 0xF)
      out(2 * i + 1) = HEX(b(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Hashing-trick feature buckets (the t15/t35 contract): for every
    * element, the integer value of the first 7 hex chars of its md5
    * (28 bits — b0..b2 plus b3's high nibble) mod `dim`, i.e. exactly
    * `conv(substring(md5(f), 1, 7), 16, 10) % dim` fused into one
    * compiled call per row — one md5 per feature, no hex-string or
    * base-conversion allocations.
    */
  def md5Buckets(arr: ArrayData, dim: Int): ArrayData = {
    // the function is in the session catalog for arbitrary SQL use, so
    // guard here (shared by interpreted and codegen paths): a hostile
    // dim must fail typed, a null element must stay null, not NPE
    if (dim <= 0) throw new IllegalArgumentException(
      s"graft_md5_buckets: dim must be > 0, got $dim")
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = md5(arr.getUTF8String(i).getBytes)
        val v = ((b(0) & 0xffL) << 20) | ((b(1) & 0xffL) << 12) |
          ((b(2) & 0xffL) << 4) | ((b(3) & 0xffL) >>> 4)
        out(i) = v % dim
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash bit string: per token one md5; bit j of the digest (MSB-first)
    * votes for output bit j; output '1' when ones*2 > n_tokens. Identical
    * to hashing.simhash's hex-nibble formulation (bit j = bit (7-j%8) of
    * digest byte j/8).
    */
  def simhash(tokens: ArrayData, bits: Int): UTF8String = {
    val n = tokens.numElements()
    val ones = new Array[Int](bits)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val d = md5(tokens.getUTF8String(t).getBytes)
        var j = 0
        while (j < bits) {
          ones(j) += (d(j >> 3) >> (7 - (j & 7))) & 1
          j += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      out(j) = if (2 * ones(j) > n) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** MinHash signature: one md5 per shingle; a = digest bytes 0-5 (= hex
    * chars 1-12), b = bytes 6-11 (hex 13-24) as unsigned 48-bit ints;
    * sig(i) = min over shingles of a + i*b (2-universal family, exact in
    * int64). Empty input yields Long.MaxValue sentinels (callers filter
    * empty shingle sets before signing).
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var t = 0
    while (t < n) {
      if (!shingles.isNullAt(t)) {
        val d = md5(shingles.getUTF8String(t).getBytes)
        val a = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
          ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
          ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
        val b = ((d(6) & 0xFFL) << 40) | ((d(7) & 0xFFL) << 32) |
          ((d(8) & 0xFFL) << 24) | ((d(9) & 0xFFL) << 16) |
          ((d(10) & 0xFFL) << 8) | (d(11) & 0xFFL)
        var i = 0
        var h = a // a + i*b, incrementally
        while (i < k) {
          if (h < sig(i)) sig(i) = h
          h += b
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Word n-shingles joined by single spaces, positional order; empty array
    * when fewer than n words (= text.wordShingles).
    */
  def wordShingles(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        parts(j) = words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (operators.Winnowing): hash every word
    * k-gram to the first 15 md5 hex digits as a 60-bit long, take each
    * length-`window` window's minimum with an O(n) monotonic deque
    * (vs the O(n*window) per-window slice fold the Column form pays),
    * return the DISTINCT selected hashes. Bit-equal to the SQL oracle:
    * the hash is the same md5-prefix integer, and which values are
    * minima is arithmetic, not implementation.
    */
  def winnowFps(words: ArrayData, k: Int, window: Int): ArrayData = {
    val m = words.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val n = m - k + 1
    val hashes = new Array[Long](n)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < k) {
        parts(j) = words.getUTF8String(i + j)
        j += 1
      }
      val d = md5(UTF8String.concatWs(SPACE, parts: _*).getBytes)
      // first 15 hex digits = 7 full bytes + the high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hashes(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    val selected = new java.util.LinkedHashSet[Long]()
    if (n <= window) {
      var mn = hashes(0)
      var t = 1
      while (t < n) { if (hashes(t) < mn) mn = hashes(t); t += 1 }
      selected.add(mn)
    } else {
      // monotonic deque of indices, front = current window minimum
      val deque = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var t = 0
      while (t < n) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(t)) tail -= 1
        deque(tail) = t
        tail += 1
        if (deque(head) <= t - window) head += 1
        if (t >= window - 1) selected.add(hashes(deque(head)))
        t += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct (first-occurrence order) character n-grams of an
    * already-normalized string, each md5-hex'd — the fused
    * text.charNgrams + per-gram md5 front-end of ngramJaccard.
    * Code-point based like Spark substr.
    */
  def md5CharNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](cpCount + 1)
    var ci = 0
    var cp = 0
    while (cp < cpCount) {
      offs(cp) = ci
      ci = str.offsetByCodePoints(ci, 1)
      cp += 1
    }
    offs(cpCount) = str.length
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= cpCount) {
      seen.add(str.substring(offs(i), offs(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var j = 0
    while (it.hasNext) {
      out(j) = hex(md5(it.next().getBytes(StandardCharsets.UTF_8)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** md5 hex of every element of a string array (null elements pass
    * through) — replaces interpreted transform(arr, md5).
    */
  def md5Array(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (arr.isNullAt(i)) null
        else hex(md5(arr.getUTF8String(i).getBytes))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming distance between equal-length ASCII bit strings. */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val len = math.min(ab.length, bb.length)
    var c = 0
    var i = 0
    while (i < len) {
      if (ab(i) != bb(i)) c += 1
      i += 1
    }
    c
  }

  /** Cosine over double arrays, left-fold sums in element order — the same
    * operation sequence as vectors.cosine (and the DuckDB list_reduce
    * oracles), so the doubles are bit-identical.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < a.numElements()) {
      val x = a.getDouble(i)
      na += x * x
      i += 1
    }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) {
      val x = b.getDouble(i)
      nb += x * x
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Inner product over double arrays, left-fold in element order (same
    * determinism contract as [[cosine]]: the DuckDB list_reduce oracle
    * replays the identical fold, so the doubles are bit-identical).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Shannon entropy over the [a-z] distribution of an ALREADY-NORMALIZED
    * string (caller strips everything outside a-z first, so bytes ==
    * chars). One O(len) counting pass replaces the 26 codegen'd
    * length-difference probes (len(s) - len(replace(s, ch))) the t20 /
    * Corpus -entropy band used to inline — that fused projection grew past
    * janino's 64 KB method cap and fell back to interpreted execution.
    *
    * Bit-equality contract with the previous formulation (and with the
    * DuckDB oracle's replay of it): counts are the same integers, the fold
    * runs in fixed a..z order, each term is (-p) * log(p) with p = cnt/n,
    * and the log is StrictMath.log — exactly what Spark's `log` codegen
    * calls — so the summed double is bit-identical.
    */
  def letterEntropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Int](26)
    var i = 0
    while (i < n) {
      val b = bytes(i) - 'a'
      if (b >= 0 && b < 26) counts(b) += 1
      i += 1
    }
    val nd = n.toDouble
    var h = 0.0
    var c = 0
    while (c < 26) {
      val cnt = counts(c)
      if (cnt > 0) {
        val p = cnt.toDouble / nd
        h += -p * StrictMath.log(p)
      }
      c += 1
    }
    h
  }
}
