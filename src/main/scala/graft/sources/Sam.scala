package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SAM alignment source (the sequencing ecosystem's text interchange
  * format). Alignment rows are plain tab-separated lines — a splittable
  * text scan with '@' header lines dropped map-side, exactly the VCF/GTF
  * pattern. The 11 mandatory fields parse as native split/cast columns;
  * optional TAG:TYPE:VALUE fields stay as a joined string (the driver
  * gate cannot sort array columns). FLAG decoding and the CIGAR
  * reference-span walk are codegen'd bit/regex arithmetic, giving every
  * read the 1-based inclusive [pos, ref_end] interval the g2/g4/g5/g7
  * operators consume — reads-over-exons is then just pointsInIntervals.
  */
object Sam {

  /** SAM FLAG bits (spec §1.4) exposed as booleans. */
  def flagField(flag: Column, bit: Int): Column =
    flag.bitwiseAND(lit(bit)) =!= 0

  /** Reference bases consumed by a CIGAR: sum of M/D/N/=/X run lengths
    * (I/S/H/P consume the read or nothing, never the reference). Null
    * for '*' (unmapped).
    */
  def cigarRefLen(cigar: Column): Column =
    when(cigar === "*", lit(null).cast("long"))
      .otherwise(aggregate(
        regexp_extract_all(cigar, lit("(\\d+)([MIDNSHP=X])"), lit(0)),
        lit(0L),
        (acc, tok) => acc +
          when(substring(tok, -1, 1).isin("M", "D", "N", "=", "X"),
            regexp_extract(tok, "(\\d+)", 1).cast("long"))
            .otherwise(lit(0L))))

  /** samtools-flagstat over parsed reads: the 12 classic counters as
    * (metric, count) rows. ONE full-scan aggregate of conditional sums —
    * map-side partials collapse each partition to 12 longs, so the
    * shuffle ships 12 numbers per task regardless of input size — then a
    * 12-element explode on the single result row. Flag semantics per the
    * SAM spec §1.4 / samtools flagstat: mapped = !0x4; properly_paired
    * requires paired AND mapped; singleton = paired, mapped, mate
    * unmapped (0x8); mate_diff_chrom counts mate-mapped pairs whose RNEXT
    * names a different reference ('=' means same).
    */
  def flagstat(reads: DataFrame): DataFrame = {
    def b(bit: Int) = flagField(col("flag"), bit)
    val mapped = !b(4)
    val paired = b(1)
    val mateMapped = paired && mapped && !b(8)
    val metrics: Seq[(String, Column)] = Seq(
      "total" -> lit(true),
      "secondary" -> b(256),
      "supplementary" -> b(2048),
      "duplicates" -> b(1024),
      "mapped" -> mapped,
      "paired" -> paired,
      "read1" -> (paired && b(64)),
      "read2" -> (paired && b(128)),
      "properly_paired" -> (paired && b(2) && mapped),
      "with_itself_and_mate_mapped" -> mateMapped,
      "singletons" -> (paired && mapped && b(8)),
      "mate_diff_chrom" -> (mateMapped && col("rnext").isNotNull &&
        col("rnext") =!= "=" && col("rnext") =!= col("rname")))
    val sums = metrics.map { case (n, c) =>
      sum(when(c, 1L).otherwise(0L)).as(n)
    }
    reads.agg(sums.head, sums.tail: _*)
      .select(explode(array(metrics.map { case (n, _) =>
        struct(lit(n).as("metric"), col(n).as("n_reads"))
      }: _*)).as("_e"))
      .select(col("_e.metric"), col("_e.n_reads"))
  }

  /** samtools-stats "SN"-section summary over parsed reads: primary-read
    * counts, base totals, mean read length / MAPQ, and the mean absolute
    * insert size over proper pairs (leftmost mate only, so each template
    * counts once — the samtools convention). ONE conditional-sum
    * aggregate: every scan task ships eight longs/doubles, never reads.
    */
  def readStats(reads: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.DataFrame = {
    val primary = !col("is_secondary")
    val seqLen = when(primary && col("seq").isNotNull,
      length(col("seq")).cast("long"))
    val insert = when(primary && col("is_proper_pair") &&
      col("tlen").isNotNull && col("tlen") > 0, col("tlen"))
    reads.agg(
      sum(when(primary, 1L).otherwise(0L)).as("n_primary"),
      sum(when(primary && !col("is_unmapped") && col("pos").isNotNull,
        1L).otherwise(0L)).as("n_mapped"),
      sum(coalesce(seqLen, lit(0L))).as("total_bases"),
      round(avg(seqLen), 2).as("avg_read_len"),
      round(avg(when(primary && !col("is_unmapped"),
        col("mapq"))), 2).as("avg_mapq"),
      round(avg(insert), 2).as("avg_insert_size"))
  }

  /** `@SQ` reference-dictionary rows from the SAM header (the lines
    * [[read]] drops): (rname, length).
    */
  def sqHeaders(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(col("value").startsWith("@SQ"))
      .select(
        regexp_extract(col("value"), "\\tSN:([^\\t]+)", 1).as("rname"),
        regexp_extract(col("value"), "\\tLN:([0-9]+)", 1)
          .cast("long").as("length"))

  /** samtools idxstats: per reference-dictionary entry, the record
    * counts (rname, length, n_mapped, n_unmapped) plus the `*` row for
    * placeless unmapped reads. Counts follow samtools: every RECORD
    * counts (secondary/supplementary/duplicate included), `n_unmapped`
    * per reference covers mate-placed unmapped reads (0x4 set but RNAME
    * bound). References with no reads report zeros via the header left
    * join — one record-scale groupBy whose partials are two longs per
    * rname per task, plus the broadcast-sized header join.
    */
  def idxstats(spark: SparkSession, path: String): DataFrame = {
    val refs = sqHeaders(spark, path).unionByName(
      spark.range(1).select(lit("*").as("rname"), lit(0L).as("length")))
    val counts = read(spark, path)
      .groupBy(coalesce(col("rname"), lit("*")).as("rname"))
      .agg(sum(when(!col("is_unmapped"), 1L).otherwise(0L)).as("nm"),
        sum(when(col("is_unmapped"), 1L).otherwise(0L)).as("nu"))
    refs.join(counts, Seq("rname"), "left")
      .select(col("rname"), col("length"),
        coalesce(col("nm"), lit(0L)).as("n_mapped"),
        coalesce(col("nu"), lit(0L)).as("n_unmapped"))
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    val f = split(col("value"), "\t")
    raw
      .where(!col("value").startsWith("@") &&
        length(trim(col("value"))) > 0)
      .select(
        try_element_at(f, lit(1)).as("qname"),
        // digit-guarded casts (Casts.tryInt/tryLong): a downstream
        // join's inferred predicates can evaluate these BEFORE the '@'
        // header filter — a strict ANSI cast would throw on '@HD VN:1.6'
        Casts.tryInt(try_element_at(f, lit(2))).as("flag"),
        nullif(try_element_at(f, lit(3)), lit("*")).as("rname"),
        nullif(Casts.tryLong(try_element_at(f, lit(4))), lit(0L)).as("pos"),
        Casts.tryInt(try_element_at(f, lit(5))).as("mapq"),
        try_element_at(f, lit(6)).as("cigar"),
        nullif(try_element_at(f, lit(7)), lit("*")).as("rnext"),
        nullif(Casts.tryLong(try_element_at(f, lit(8))), lit(0L)).as("pnext"),
        Casts.tryLong(try_element_at(f, lit(9))).as("tlen"),
        nullif(try_element_at(f, lit(10)), lit("*")).as("seq"),
        nullif(try_element_at(f, lit(11)), lit("*")).as("qual"),
        nullif(array_join(slice(f, lit(12),
          greatest(size(f) - 11, lit(0))), ","), lit("")).as("tags"))
      .transform(decorate)
  }

  /** FLAG booleans + the CIGAR reference span over the 12 mandatory
    * parsed columns — shared by the SAM text and [[Bam]] binary sources
    * so both emit the identical row shape (and every downstream
    * operator works on either unchanged).
    */
  private[graft] def decorate(df: DataFrame): DataFrame = df
    .withColumn("is_paired", flagField(col("flag"), 1))
    .withColumn("is_proper_pair", flagField(col("flag"), 2))
    .withColumn("is_unmapped", flagField(col("flag"), 4))
    .withColumn("is_reverse", flagField(col("flag"), 16))
    .withColumn("is_first", flagField(col("flag"), 64))
    .withColumn("is_secondary", flagField(col("flag"), 256))
    .withColumn("is_dup", flagField(col("flag"), 1024))
    .withColumn("ref_end",
      when(col("pos").isNotNull,
        col("pos") + cigarRefLen(col("cigar")) - 1))
}
