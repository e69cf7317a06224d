package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over array columns (embeddings are array<float>).
  * Everything is expressed with zip_with/aggregate so it stays in codegen;
  * math is done in double precision regardless of the storage type.
  */
object vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Cheap locality bucket for LSH-style ANN: sign bits of the first `bits`
    * dimensions ("+-+-..."), usable as a coarse partition key.
    */
  def signBucket(a: Column, bits: Int): Column =
    array_join(
      transform(slice(a, 1, bits),
        x => when(x.cast("double") >= 0, lit("1")).otherwise(lit("0"))),
      "")
}
