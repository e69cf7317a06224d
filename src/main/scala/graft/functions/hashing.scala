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

  /** MinHash signature over a set of shingles: k simulated hash functions
    * h_i(s) = md5(i || ":" || s), signature element i = min over shingles.
    * Returns array<string> of length k (nulls when the shingle set is empty).
    */
  def minhash(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band keys for a MinHash signature: `bands` keys, each hashing
    * `rows` consecutive signature entries. Key format "band:md5(...)" so
    * different bands never collide.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))))))

  /** SimHash over a token multiset, `bits` wide (max 64).
    * Each token hashes to md5; bit j of the simhash is 1 when the sum of
    * (+1/-1) votes from token-hash bit j is positive. Implemented over hex
    * nibbles so it is reproducible in SQL engines too.
    */
  def simhash(tokens: Column, bits: Int = 64): Column = {
    require(bits % 4 == 0 && bits <= 64)
    val nibbles = bits / 4
    // For each bit position j: vote_j = sum over tokens of (bit ? 1 : -1)
    val bitCols: Column = transform(sequence(lit(0), lit(bits - 1)), j => {
      val nibbleIdx = floor(j / 4).cast("int") // 0-based nibble in md5 hex
      val bitInNibble = j % 4 // 0 = most-significant bit of nibble
      val votes = aggregate(tokens, lit(0), (acc, t) => {
        val nib = locate_nibble(md5(t), nibbleIdx)
        val bit = floor(nib / pow(lit(2), lit(3) - bitInNibble)).cast("int") % 2
        acc + when(bit === 1, 1).otherwise(-1)
      })
      when(votes > 0, lit("1")).otherwise(lit("0"))
    })
    val _ = nibbles
    array_join(bitCols, "")
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
