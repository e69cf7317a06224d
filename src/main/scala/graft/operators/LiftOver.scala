package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-assembly coordinate lift-over (UCSC liftOver) as a relational
  * plan: points fall into chain alignment blocks through the SAME binned
  * equi-join the exon interval joins use (g2), the in-block remap is
  * plain arithmetic, and ambiguity (several chains covering one point)
  * resolves with the house windowless struct-max — best score wins,
  * deterministic (q_name, q_pos) tie arms.
  *
  * Coordinate contract: points carry 1-based positions (the VCF
  * convention every other operator here uses); chain blocks are 0-based
  * half-open on t, q starts in strand space (Chain.read). The output
  * `new_pos` is 1-based on the TARGET assembly's + strand — for a '-'
  * chain the strand-space coordinate reflects through
  * `q_size - 1 - q0`, exactly liftOver's behavior, with
  * `new_strand = '-'` recording the flip. Points covered by no block
  * (chain gaps, unaligned regions) are ABSENT from the output — the
  * radius-bounded inner-join contract documented on nearestInterval.
  */
object LiftOver {

  /** Lift each point to its best-chain target coordinate. `chains` is
    * the block table from [[graft.sources.Chain.read]]; all point
    * columns pass through.
    */
  def liftOver(points: DataFrame, chains: DataFrame,
               chromCol: String = "chrom", posCol: String = "pos",
               binSize: Long = 64L): DataFrame = {
    require(points.columns.contains(chromCol) &&
      points.columns.contains(posCol),
      s"points need ($chromCol, $posCol)")
    require(!points.columns.contains("start") &&
      !points.columns.contains("end"),
      "points must not carry start/end columns (interval-shaped input " +
        "would bind ambiguously in the block join)")
    val reserved = Seq("score", "q_name", "q_size", "q_strand",
      "bt_start", "bt_end", "qb_start", "new_chrom", "new_pos",
      "new_strand", "lift_score")
    val clash = points.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"points carry chain-block/output column names ${clash.mkString(",")}" +
        " — rename them before lifting (they would bind ambiguously)")
    // block table in the 1-based inclusive shape pointsInIntervals binds
    val blocks = chains.select(
      col("t_name").as(chromCol),
      (col("bt_start") + 1).as("start"),
      col("bt_end").as("end"),
      col("bt_start"), col("qb_start"), col("score"),
      col("q_name"), col("q_size"), col("q_strand"))
    val pts = points.withColumnRenamed(posCol, "pos")
    val joined = IntervalJoin.pointsInIntervals(pts, blocks,
      Seq(chromCol), binSize)
    // strand-space target coordinate, then reflect for '-' chains
    val q0 = col("qb_start") + (col("pos") - 1 - col("bt_start"))
    val mapped = joined.withColumn("_t", struct(
      col("score").as("score"),
      col("q_name").as("new_chrom"),
      (when(col("q_strand") === "-", col("q_size") - 1 - q0)
        .otherwise(q0) + 1).as("new_pos"),
      col("q_strand").as("new_strand")))
    val ptCols = pts.columns.toSeq
    mapped
      .groupBy(ptCols.map(col): _*)
      .agg(max(col("_t")).as("_b"))
      .select(ptCols.map(col) ++ Seq(
        col("_b.new_chrom").as("new_chrom"),
        col("_b.new_pos").as("new_pos"),
        col("_b.new_strand").as("new_strand"),
        col("_b.score").as("lift_score")): _*)
      .withColumnRenamed("pos", posCol)
  }
}
