package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction is a clearly-marked deterministic STUB
  * (the real codec libraries are not available in this environment), but
  * the Spark-side shapes — binary payloads, metadata structs, per-frame
  * explosion, partition behavior — are real and oracle-checked.
  *
  * All derived values go through the hex-string domain (`hex(payload)`)
  * so the DuckDB oracle can reproduce them without blob functions.
  */
object Multimodal {

  /** Value 0-15 of the first hex nibble of a hex string. */
  private def nibble(h: Column, idx: Int): Column =
    instr(lit("0123456789ABCDEF"), upper(h.substr(idx, 1))) - 1

  /** Metadata extraction: byte length + content hash of the payload. */
  def describe(df: DataFrame, payload: String = "payload"): DataFrame =
    df.withColumn("byte_len", length(col(payload)).cast("long"))
      .withColumn("content_hash", md5(hex(col(payload))))

  /** STUB decode: deterministic fake dimensions derived from the first
    * payload bytes — stands in for an image decode the way a real
    * implementation would return (width, height, channels). Replace with
    * a native decoder expression when codec libraries are available.
    */
  def decodeStub(df: DataFrame, payload: String = "payload"): DataFrame = {
    val h = hex(col(payload))
    df.withColumn("width", (lit(1) + nibble(h, 1) % 16 * lit(16)
      + nibble(h, 2)).cast("long"))
      .withColumn("height", (lit(1) + nibble(h, 3) % 16 * lit(16)
        + nibble(h, 4)).cast("long"))
  }

  /** Frame sampling: one row per `every`-th fixed-size chunk of the
    * payload (video frame / audio window analog). Chunk geometry comes
    * from the typed `meta` struct (n_chunks, chunk_bytes).
    */
  def sampleFrames(df: DataFrame, every: Int = 2,
                   payload: String = "payload"): DataFrame =
    df.select(col("*"),
      explode(sequence(lit(0), col("meta.n_chunks") - 1, lit(every)))
        .as("frame_idx"))
      .withColumn("frame_hash",
        md5(hex(expr(
          s"substring($payload, frame_idx * meta.chunk_bytes + 1, " +
            "meta.chunk_bytes)"))))

  /** STUB resize: target dimensions preserving the decode-stub's aspect
    * ratio (integer floor), plus a deterministic "resized content" hash
    * binding payload + geometry — the column-flow shape of a real resize
    * (new dims + new bytes) without the codec.
    */
  def resizeStub(df: DataFrame, maxSide: Int = 64,
                 payload: String = "payload"): DataFrame = {
    val scale = lit(maxSide) / greatest(col("width"), col("height"))
    val rw = when(col("width") >= col("height"), lit(maxSide))
      .otherwise(floor(col("width") * scale)).cast("long")
    val rh = when(col("height") > col("width"), lit(maxSide))
      .otherwise(floor(col("height") * scale)).cast("long")
    df.withColumn("resized_w", rw)
      .withColumn("resized_h", rh)
      .withColumn("resized_hash",
        md5(concat(hex(col(payload)), lit(":"), rw.cast("string"),
          lit("x"), rh.cast("string"))))
  }

  /** STUB feature extraction: a fixed-width embedding derived
    * deterministically from payload chunk hashes (one double in [0,1)
    * per md5-prefix nibble pair) — the real thing would be a model
    * forward pass; the Spark-side shape (binary -> fixed-length
    * array<double> column, batchable, codegen-friendly) is what the
    * similarity operators downstream consume.
    */
  def featuresStub(df: DataFrame, dim: Int = 4,
                   payload: String = "payload"): DataFrame = {
    val h = md5(hex(col(payload)))
    val feats = array((0 until dim).map { i =>
      (conv(h.substr(i * 4 + 1, 4), 16, 10).cast("double") / 65536.0)
    }: _*)
    df.withColumn("features", feats)
  }
}
