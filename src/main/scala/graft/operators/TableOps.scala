package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level utilities.
  *
  * Reference: /root/reference/src/merge_tables.py (schema-aligned concat of
  * per-chromosome result tables), csv_to_vcf.py (projection of an
  * arbitrary CSV into VCF column shape), and get_reference_ENST.py
  * (reference-proteome transcript list with optional MANE-Select
  * canonicalization).
  */
object TableOps {

  /** get_reference_ENST.py: extract (chromosome, transcriptID) from an
    * Ensembl reference-proteome FASTA's descriptions — the stable id after
    * "transcript:" (version stripped), the chromosome from
    * "chromosome:<build>:<chr>:…" or, failing that, "GRCh<nn>:<chr>:…",
    * "-" when neither is present.
    *
    * With `onlyMane`, keep per gene only the MANE_Select transcript when
    * the gene has one, otherwise only the Ensembl_canonical transcript
    * (get_reference_ENST.py:45-64). `transcripts` carries the annotation:
    * (transcript_id, gene_id, attributes) where `attributes` is the raw
    * GTF attribute string (tags checked by containment, since `tag` is a
    * repeated attribute). The per-gene has-MANE rollup is an aggregation
    * over the transcript dimension (small next to the proteome scan) and
    * broadcasts back; no O(n²) per-row annotation-DB lookups like the
    * reference's Python loop.
    */
  def referenceEnst(proteins: DataFrame, transcripts: DataFrame = null,
                    onlyMane: Boolean = false): DataFrame = {
    val trId = regexp_extract(col("description"),
      "transcript:([^.\\s]+)", 1)
    val chrom = when(col("description").contains("chromosome:"),
      regexp_extract(col("description"), "chromosome:[^:]*:([^:]+):", 1))
      .when(col("description").contains("GRCh"),
        regexp_extract(col("description"), "GRCh[^:]*:([^:]+):", 1))
      .otherwise(lit("-"))
    val base = proteins
      .where(col("description").contains("transcript:"))
      .select(chrom.as("chromosome"), trId.as("transcriptID"))
    if (!onlyMane) base
    else {
      val tagged = transcripts.select(
        col("transcript_id").as("transcriptID"),
        col("gene_id"),
        col("attributes").contains("tag \"MANE_Select\"").as("is_mane"),
        col("attributes").contains("tag \"Ensembl_canonical\"")
          .as("is_canonical"))
      val geneHasMane = tagged.groupBy("gene_id")
        .agg(max(col("is_mane")).as("gene_has_mane"))
      val keep = tagged.join(broadcast(geneHasMane), Seq("gene_id"))
        .where(when(col("gene_has_mane"), col("is_mane"))
          .otherwise(col("is_canonical")))
        .select("transcriptID")
      base.join(broadcast(keep), Seq("transcriptID"))
        .select("chromosome", "transcriptID")
    }
  }

  /** Union tables by column name, filling columns missing on either side
    * with nulls — pd.concat semantics from merge_tables.py.
    */
  def unionTables(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Split the per-haplotype sample list out of a haplotype table
    * (haplo_extract_sample_names.py): the main table continues without
    * the wide `samples` string, the sideband table carries (id columns,
    * samples). Both are projections — no shuffle, column pruning reaches
    * the scan on each side.
    */
  def extractSampleNames(haplos: DataFrame,
                         idCols: Seq[String] = Seq("transcript",
                           "signature")): (DataFrame, DataFrame) =
    (haplos.drop("samples"),
      haplos.select(idCols.map(col) :+ col("samples"): _*))

  /** Project a table into VCF shape (csv_to_vcf.py): configurable source
    * columns, constant-dot QUAL/FILTER/INFO, sorted by (CHROM, POS).
    */
  def csvToVcf(df: DataFrame, chromCol: String = "chrom",
               posCol: String = "pos", idCol: String = "accession",
               refCol: String = "ref", altCol: String = "alt"): DataFrame =
    df.select(
      col(chromCol).as("CHROM"),
      col(posCol).cast("long").as("POS"),
      col(idCol).as("ID"),
      col(refCol).as("REF"),
      col(altCol).as("ALT"),
      lit(".").as("QUAL"),
      lit(".").as("FILTER"),
      lit(".").as("INFO"))
      .orderBy(col("CHROM"), col("POS"))

  /** ANALYZE-style one-pass column statistics — the CBO inputs (row
    * count, null count, min/max, NDV) an engine needs before costing
    * joins. Columns unpivot to narrow (column_name, value) rows
    * map-side, so ONE pass over the table feeds every column's partial
    * aggregate; NDV is the portable md5-register HyperLogLog (q15) —
    * 256 registers per column cross the shuffle, never the values, which
    * is what makes stats collection affordable on a 100 TB table (exact
    * distinct would shuffle every value of every column).
    *
    * Restricted to numeric columns: min/max are computed as doubles and
    * the HLL hashes the value's string rendering, which Spark and the
    * DuckDB oracle agree on for integers and shortest-round-trip
    * doubles (NOT for timestamps/decimals — cast those upstream).
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    // Enforce the documented numeric restriction: a string column would
    // silently count cast-failures as nulls and return null min/max —
    // plausible-looking wrong stats. Fail loudly instead.
    cols.foreach { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"tableStats: no column '$c'"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"tableStats: column '$c' is ${f.dataType.simpleString}, not " +
          "numeric — cast timestamps/decimals/strings upstream")
    }
    val exploded = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"),
        col(c).cast("double").as("_num"),
        col(c).cast("string").as("_str"))): _*)).as("_e"))
      .select(col("_e.column_name"), col("_e._num"), col("_e._str"))
    val base = exploded.groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("_num"))).as("null_count"),
        round(min(col("_num")), 6).as("min_val"),
        round(max(col("_num")), 6).as("max_val"))
    val ndv = Sketches.hllDistinct(
      exploded.where(col("_str").isNotNull),
      Seq("column_name"), "_str")
      .withColumnRenamed("hll_estimate", "ndv_est")
    base.join(ndv, Seq("column_name"), "left")
  }

  private def statsUnpivot(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "stats need at least one column")
    cols.foreach { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"stats: no column '$c'"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"stats: column '$c' is ${f.dataType.simpleString}, not numeric")
    }
    df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"),
        col(c).cast("double").as("_num"),
        col(c).cast("string").as("_str"))): _*)).as("_e"))
      .select(col("_e.column_name"), col("_e._num"), col("_e._str"))
  }

  /** Mergeable ANALYZE state (the incremental-maintenance form of
    * [[tableStats]]): instead of final numbers, one narrow frame per
    * batch holding each column's count/min/max row (idx null) plus its
    * 256 HLL register rows — every component is associative-commutative
    * (sum / min / max / register max), so
    * `statsFinalize(mergeStatsStates(state(A), state(B)))` equals
    * `statsFinalize(statsState(A ∪ B))` EXACTLY for counts and min/max
    * and register-for-register for NDV. A 100 TB table's stats update
    * with one pass over the NEW partition and a metadata-scale merge —
    * never a full rescan (the lakehouse incremental-ANALYZE contract).
    */
  def statsState(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exploded = statsUnpivot(df, cols)
    val counts = exploded.groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("_num"))).as("null_count"),
        min(col("_num")).as("min_val"),
        max(col("_num")).as("max_val"))
      .select(col("column_name"), lit(null).cast("int").as("idx"),
        lit(null).cast("int").as("r"), col("n_rows"), col("null_count"),
        col("min_val"), col("max_val"))
    val h = md5(col("_str"))
    val rest = conv(substring(h, 3, 6), 16, 10).cast("long")
    val regs = exploded.where(col("_str").isNotNull)
      .select(col("column_name"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("idx"),
        when(rest === 0, lit(25))
          .otherwise(lit(25) - length(bin(rest))).cast("int").as("_rho"))
      .groupBy(col("column_name"), col("idx"))
      .agg(max(col("_rho")).as("r"))
      .select(col("column_name"), col("idx"), col("r"),
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("long").as("null_count"),
        lit(null).cast("double").as("min_val"),
        lit(null).cast("double").as("max_val"))
    counts.unionByName(regs)
  }

  /** Merge two (or, folded, any number of) stats states: union + ONE
    * re-aggregation with the same associative functions. Register rows
    * max-merge; count rows sum; min/max fold. Output is again a state.
    */
  def mergeStatsStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("column_name"), col("idx"))
      .agg(max(col("r")).as("r"), sum(col("n_rows")).as("n_rows"),
        sum(col("null_count")).as("null_count"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))

  /** Finalize a stats state into [[tableStats]]-shaped output: counts,
    * rounded min/max, and the HLL NDV estimate read from the merged
    * registers (q15's bias-corrected formula, linear counting below
    * 2.5m).
    */
  def statsFinalize(state: DataFrame): DataFrame = {
    val m = 256
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val g = state.groupBy(col("column_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("null_count")).as("null_count"),
        round(min(col("min_val")), 6).as("min_val"),
        round(max(col("max_val")), 6).as("max_val"),
        count(col("r")).as("_cnt"),
        sum(pow(lit(2.0), -col("r"))).as("_sp"))
    val zeros = lit(m) - col("_cnt")
    val raw = alpha * lit(m.toDouble * m) /
      (col("_sp") + zeros.cast("double"))
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    g.select(col("column_name"), col("n_rows"), col("null_count"),
      col("min_val"), col("max_val"),
      when(col("_cnt") > 0, round(est, 4)).as("ndv_est"))
  }

  /** Snapshot diff — the reconciliation audit behind every migration
    * sign-off: keyed full-outer join of two table versions, each row
    * classified added / removed / changed (with the list of columns
    * that differ, null-safe) — unchanged rows drop so the output is
    * the delta, not the table. ONE key-shuffled full-outer join; the
    * per-column compare is codegen'd row-local arithmetic.
    */
  def tableDiff(before: DataFrame, after: DataFrame,
                keyCols: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "tableDiff needs key and compare columns")
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_b", lit(1))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_b_$c")) :+ col("_b"): _*)
    val a = after.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_a", lit(1))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_a_$c")) :+ col("_a"): _*)
    val diffs = compareCols.map(c =>
      when(!(col(s"_b_$c") <=> col(s"_a_$c")), lit(c)))
    val changedCols = array_join(array_sort(
      filter(array(diffs: _*), x => x.isNotNull)), ";")
    b.join(a, keyCols, "full_outer")
      .withColumn("status",
        when(col("_b").isNull, "added")
          .when(col("_a").isNull, "removed")
          .when(changedCols =!= "", "changed")
          .otherwise("unchanged"))
      .where(col("status") =!= "unchanged")
      .withColumn("changed_cols",
        when(col("status") === "changed", changedCols))
      .select(keyCols.map(col) :+ col("status") :+
        col("changed_cols"): _*)
  }

  /** MERGE-style changelog apply: fold an insert/update/delete change
    * stream into a snapshot — the missing piece between u3 (compact a
    * changelog to latest-per-key) and u4 (SCD2 history): u5 produces the
    * NEW SNAPSHOT. Per key, only the latest change (by `seqCol`, which
    * must be unique per key — a CDC LSN/offset) applies: 'I'/'U' replace
    * the row's `valueCols` (insert if absent), 'D' removes it; keys
    * without a change pass through untouched.
    *
    * Plan shape: the changelog compacts via u3's partial-aggregable
    * max(struct(seq, op, values)) — one row per changed key leaves each
    * map task — then ONE full-outer key join against the snapshot. No
    * window, no driver loop; both shuffles key on `key`, so AQE can
    * plan the join off the compaction's partitioning. At CDC scale the
    * changed-key side is a fraction of the snapshot and broadcasts.
    */
  /** Small-file compaction (the lakehouse OPTIMIZE maintenance op): a
    * path whose writers left thousands of tiny parquet files rewrites
    * into ~`targetBytes` files. The partition-count math uses the real
    * on-disk byte size, and the rewrite uses `coalesce` — a map-side
    * partition merge with NO shuffle (compaction must not pay a
    * redistribution of the whole table; if the input is pathologically
    * skewed, z2's range-partitioned writer is the reshuffling variant).
    * Returns the target file count.
    */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, in: String,
                   out: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(in)).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).coalesce(n)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Order-independent table fingerprint — the cross-cluster equality
    * primitive: "is the replica identical to the source?" answered
    * WITHOUT a sort or a row-by-row transfer. Each row serializes to a
    * portable string (nulls as a sentinel so (null) and ('') differ),
    * md5-hashes once, and three commutative folds of the digest cross
    * the shuffle per group: two independent 32-bit XOR folds and one
    * 32-bit sum, plus the row count. XOR is associative-commutative and
    * overflow-free at ANY row count; the sum fold breaks the XOR
    * blind spot (a row duplicated an even number of times XORs away —
    * the sum and count still move); identical fingerprints on both
    * clusters ⇒ identical row multisets up to md5 collision odds.
    * Scale: ONE scan, partial aggregation — bytes on the wire per
    * group are four longs, never rows. The sum stays exact below 2^31
    * rows per group; beyond that, add more group columns (the global
    * form on a 10^12-row table should group, then fold the small
    * result again). Column caveat: values hash via their STRING cast,
    * which engines agree on for integers, strings and dates — cast
    * timestamps/decimals/doubles to a canonical text form upstream.
    */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum: need at least one column")
    val row = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*)
    def slice32(h: org.apache.spark.sql.Column, start: Int) =
      conv(substring(h, start, 8), 16, 10).cast("long")
    val base = df.withColumn("_h", md5(row))
      .withColumn("_v1", slice32(col("_h"), 1))
      .withColumn("_v2", slice32(col("_h"), 9))
    val aggs = Seq(count(lit(1)).as("n_rows"),
      expr("bit_xor(_v1)").as("xor1"),
      expr("bit_xor(_v2)").as("xor2"),
      sum(col("_v1")).as("sum1"))
    if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Deequ-style declarative data-quality checks — the constraint
    * report a warehouse pipeline gates a publish on. Four constraint
    * classes, each ONE partial-aggregated pass (or one key join for
    * the FK class), all emitting the same (check, column, metric,
    * threshold, passed) row shape so the verdict is a tiny frame:
    *
    *  - `unique`: the column tuple is a primary key
    *    (count == countDistinct via one two-level agg — no expand);
    *  - `not_null`: per-column null fraction <= threshold;
    *  - `in_range`: numeric column within [lo, hi];
    *  - `fk`: every child key exists in the parent (LEFT ANTI count —
    *    the parent side aggregates to distinct keys first, so the
    *    join ships keys, not rows).
    *
    * Metrics are exact counts/fractions (round 6), not samples — at
    * 100 TB each class is a scan with map-side partials, which is what
    * a publish gate costs anyway.
    */
  def qualityChecks(df: DataFrame,
                    unique: Seq[Seq[String]] = Nil,
                    notNull: Seq[(String, Double)] = Nil,
                    inRange: Seq[(String, Double, Double)] = Nil,
                    fk: Seq[(String, DataFrame, String)] = Nil)
    : DataFrame = {
    // fully lazy: every check is a one-row aggregate frame and the
    // report is their union — no driver-side action inside the operator
    def row(check: String, column: String, metric: Column,
            threshold: Double, passed: Column): DataFrame => DataFrame =
      base => base.select(lit(check).as("check"),
        lit(column).as("column"), metric.as("metric"),
        lit(threshold).as("threshold"), passed.as("passed"))
    val uniq = unique.map { cols =>
      val dups = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("_c")).where(col("_c") > 1)
        .agg(coalesce(sum(col("_c")), lit(0L)).as("_m"))
      row("unique", cols.mkString(","), col("_m").cast("double"), 0.0,
        col("_m") === 0L)(dups)
    }
    val nn = notNull.map { case (c, maxFrac) =>
      val agg = df.agg(
        round(sum(when(col(c).isNull, 1L).otherwise(0L))
          / count(lit(1)), 6).as("_m"))
      row("not_null", c, col("_m"), maxFrac,
        col("_m") <= maxFrac)(agg)
    }
    val rng = inRange.map { case (c, lo, hi) =>
      val agg = df.agg(sum(when(col(c) < lo || col(c) > hi, 1L)
        .otherwise(0L)).as("_m"))
      row("in_range", c, col("_m").cast("double"), 0.0,
        col("_m") === 0L)(agg)
    }
    val fks = fk.map { case (childKey, parent, parentKey) =>
      val orphans = df.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("_m"))
      row("fk", childKey, col("_m").cast("double"), 0.0,
        col("_m") === 0L)(orphans)
    }
    (uniq ++ nn ++ rng ++ fks).reduce(_ unionByName _)
  }

  def applyChangelog(snapshot: DataFrame, changes: DataFrame, key: String,
                     opCol: String, seqCol: String,
                     valueCols: Seq[String]): DataFrame = {
    val latest = changes
      .groupBy(col(key))
      .agg(max(struct(col(seqCol) +: col(opCol).as("_op") +:
        valueCols.map(col): _*)).as("_m"))
      .select(col(key).as("_ck"), col("_m._op").as("_op"),
        struct(valueCols.map(c => col(s"_m.$c").as(c)): _*).as("_cv"))
    snapshot
      .join(latest, col(key) === col("_ck"), "full_outer")
      // D drops the key; a D for an absent key is a no-op (_ck non-null,
      // snapshot key null, filtered the same way)
      .where(col("_op").isNull || col("_op") =!= "D")
      .select(coalesce(col(key), col("_ck")).as(key) +:
        valueCols.map(c =>
          when(col("_op").isNotNull, col(s"_cv.$c"))
            .otherwise(col(c)).as(c)): _*)
  }
}
