package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing primitives.
  *
  * md5 hex strings are used as the hash domain because they are reproducible
  * across engines (the driver's DuckDB oracle computes the identical values),
  * unlike engine-specific hash() implementations. Hex strings compare
  * lexicographically the same everywhere, so min() over them is a valid
  * MinHash.
  */
object hashing {

  /** Hex content hash of any column (cast to string first). */
  def hashHex(c: Column): Column = md5(c.cast("string"))

  /** 48-bit int value of a 12-char hex slice [start, start+11] (1-based)
    * of a hex string — a left fold portable to the DuckDB oracle.
    */
  private def hexSliceToLong(hex: Column, start: Int): Column =
    aggregate(
      transform(sequence(lit(start), lit(start + 11)),
        j => hex.substr(j, lit(1))),
      lit(0L),
      (acc, c) => acc * 16 + (instr(lit("0123456789abcdef"), c) - 1))

  /** Per-shingle hash pairs for MinHash: each shingle is md5-hashed ONCE;
    * the 128-bit digest yields two 48-bit ints (a, b). Materialize this as
    * its own column before calling [[minhashFromPairs]] — as a named column
    * it is evaluated once, whereas inlining it under the k-wide signature
    * transform would re-hash every shingle k times (CollapseProject keeps
    * non-cheap higher-order expressions un-duplicated).
    */
  def minhashPairs(shingles: Column): Column =
    transform(shingles, s => {
      val h = md5(s)
      struct(hexSliceToLong(h, 1).as("a"), hexSliceToLong(h, 13).as("b"))
    })

  /** MinHash signature from [[minhashPairs]] output: the k simulated hash
    * functions are h_i(s) = a + i*b (2-universal family; exact in int64
    * since a,b < 2^48 and i < 2^15 keeps a+i*b < 2^63). Signature element
    * i = min over shingles. Returns array<long> of length k.
    */
  def minhashFromPairs(ab: Column, k: Int): Column = {
    require(k < (1 << 15))
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(ab,
        p => p.getField("a") + i * p.getField("b"))))
  }

  /** Convenience composition; prefer the two-step form in operators. */
  def minhash(shingles: Column, k: Int): Column =
    minhashFromPairs(minhashPairs(shingles), k)

  /** LSH band keys for a MinHash signature: `bands` keys, each hashing
    * `rows` consecutive signature entries. Key format "band:md5(...)" so
    * different bands never collide.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))))))

  /** SimHash over a token multiset, `bits` wide (max 64).
    * Each token hashes to md5 ONCE; a single aggregate pass accumulates the
    * per-bit 1-vote counts (zip_with over an int array), so the cost is
    * O(tokens) md5 calls + O(tokens*bits) cheap nibble ops. Bit j of the
    * simhash is 1 when the (+1/-1) vote sum is positive, i.e. when
    * 2*ones_j > n_tokens. Implemented over hex nibbles so it is
    * reproducible in SQL engines too.
    */
  def simhash(tokens: Column, bits: Int = 64): Column = {
    require(bits % 4 == 0 && bits <= 64)
    // bits of one md5 hex string as an int array (1/0 per bit position):
    // per nibble, the 4 bits come from literal integer shifts — no
    // floating-point pow/floor in the per-token hot path
    def bitsOf(h: Column): Column =
      flatten(transform(sequence(lit(0), lit(bits / 4 - 1)), ni => {
        val nib = locate_nibble(h, ni).cast("int")
        array(
          shiftright(nib, 3).bitwiseAND(lit(1)),
          shiftright(nib, 2).bitwiseAND(lit(1)),
          shiftright(nib, 1).bitwiseAND(lit(1)),
          nib.bitwiseAND(lit(1)))
      }))
    // one pass: hash each token once (lambda var, not re-evaluated per bit),
    // sum the bit vectors
    val ones = aggregate(
      transform(tokens, t => md5(t)),
      array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    val n = size(tokens)
    array_join(
      transform(ones, o => when(o * 2 > n, lit("1")).otherwise(lit("0"))),
      "")
  }

  /** Value 0-15 of the `idx`-th (0-based) hex nibble of a hex string. */
  private def locate_nibble(hex: Column, idx: Column): Column =
    instr(lit("0123456789abcdef"), hex.substr(idx + 1, lit(1))) - 1

  /** Hamming distance between two equal-length bit strings ("0101..."). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""), (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
}
