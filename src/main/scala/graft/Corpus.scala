package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text
import graft.operators.Dedup

/** End-to-end training-corpus pipeline CLI — the LLM-data counterpart of
  * [[Prohap]]/[[Provar]]: one command takes a documents table through
  * clean -> filter -> redact -> dedup -> write, composing the same
  * operators the d/t gate queries check individually.
  *
  * {{{
  * runMain graft.Corpus -i /data/documents.parquet -o /out/corpus
  *   [-i_warc path]        start from a raw WARC crawl instead of -i:
  *                         html responses -> WET text extraction (w1/w2),
  *                         doc_id = md5(record_id), source = 'warc'
  *   [-dedup_url 1]        FIRST pass on crawls: canonicalize the url
  *                         column (t21 — case/ports/fragments/tracking/
  *                         param order) and keep the min-doc_id row per
  *                         canonical URL (d16); needs a url column
  *                         (-i_warc provides one)
  *   [-strip_boilerplate 1] drop nav-bar/nav-link/copyright lines (t25)
  *                         before any text metric sees them
  *   [-normalize 1]        strip control chars, collapse whitespace (t10)
  *   [-lang en]            keep docs whose language ID matches — the
  *                         profile n-gram scorer (t41; measured 0.943
  *                         on the labeled fixture) by default;
  *                         -lang_scorer stopword selects the legacy
  *                         stopword-hit scorer (t3; measured 0.547)
  *   [-min_quality 0.45]   heuristic quality floor in [0,1] (t2)
  *   [-gopher 1]           Gopher rule filter (t6)
  *   [-repetition .2,.18]  Gopher repetition caps: top-2-gram /
  *                         duplicated-3-gram char fractions (t14)
  *   [-entropy 2.0,4.1]    character-entropy band (t20): drop gibberish
  *                         below min and noise above optional max
  *   [-compress_band .1,.9] DEFLATE compression-ratio band (t38): drop
  *                         boilerplate below min, noise above optional
  *                         max — the signal n-gram stats can't fake
  *   [-min_bigram_logp -7] corpus-trained bigram-LM floor (t17): drop
  *                         word-salad docs with improbable transitions
  *   [-min_backoff_logp -8] self-trained stupid-backoff TRIGRAM floor
  *                         (t33): flags templated salad the pair model
  *                         passes
  *   [-ccnet_keep head,middle] CCNet per-language perplexity-tercile
  *                         selector (t32): keep only the listed buckets
  *                         (head = most fluent third per language)
  *   [-dedup_against p]    incremental admission against an EXISTING
  *                         corpus parquet (d21/e23): drop arriving docs
  *                         whose content hash it holds;
  *                         -dedup_against_mode bloom (default — FP-
  *                         bounded broadcast bit set, never joins the
  *                         corpus) | exact (hash-keyed verify join)
  *   [-dedup_paragraph 1]  Dolma-style exact paragraph dedup (d20):
  *                         remove later occurrences of corpus-duplicated
  *                         paragraphs, keep the globally-first; rows
  *                         never drop — texts shrink
  *   [-min_classifier_score 0.5]
  *                         learned quality filter (t15): keep docs whose
  *                         sigmoid(bias + w·φ(doc)) clears the floor;
  *                         needs -classifier_weights, a (bucket, weight)
  *                         parquet from an offline logistic fit
  *   [-classifier_weights p] [-classifier_dim 65536] [-classifier_bias 0]
  *   [-min_dsir_logw 0]    DSIR importance filter (t35): keep docs whose
  *                         hashed-n-gram importance log-weight vs the
  *                         -dsir_target sample clears the floor
  *   [-dsir_target p] [-dsir_dim 65536]
  *   [-pii 1]              redact emails/phones/IPv4 in place (t8)
  *   [-decontaminate p]    drop docs sharing any 8-word gram with the
  *                         benchmark/eval parquet at path p (t5)
  *   [-max_dup_ratio 0.5]  drop docs above this duplicated-gram cap (t12)
  *   [-cut_spans 1]        REMOVE corpus-duplicated word-8-gram spans,
  *                         keep-first-occurrence (d13 find + d14 cut);
  *                         output text becomes word-normalized
  *   [-dedup near]         exact | near | near_winnow | none
  *                         (d1 / d2+d6+d10 / d17+d6+d10 / skip) —
  *                         near_winnow clusters on LOCAL overlap
  *                         (shared winnowing fingerprints, containment
  *                         score vs -jaccard), catching shared-passage
  *                         duplicates whole-doc resemblance misses
  *   [-jaccard 0.8]        near-dup verification threshold
  *   [-chunk 64,48]        slide size-token windows every stride tokens
  *                         over each doc (t13); output is per-chunk
  *   [-pack 1000[,col]]    pack docs into ~budget-token chunks per shard
  *                         column, default source (t7); adds tokens +
  *                         chunk_idx. Mutually exclusive with -chunk.
  *   [-vocab p[,maxLen]]   count tokens for -pack/-chunk budgets with the
  *                         real greedy longest-match tokenizer (t16) over
  *                         the (token) vocab parquet at p, instead of the
  *                         bpeTokenCount regex proxy; maxLen defaults 8
  *   [-train_vocab n,p]    learn n BPE merges from the surviving corpus
  *                         (t18) and write the chars+merges vocab parquet
  *                         to p — feed it back as -vocab next run
  *   [-embed_out 64,p]     write the surviving corpus's feature-hashing
  *                         embeddings (t39) as a sparse long-form
  *                         sidecar parquet at p
  *   [-train_merges n,p]   write the ORDERED merge table itself
  *                         (rank, s1, s2, merged, pair_count) to p —
  *                         feed it back as -encode_bpe next run
  *   [-encode_bpe p]       BPE-encode each doc's text with the trained
  *                         merge parquet at p (t23): adds tokens +
  *                         n_tokens columns; merges bake into the plan
  *                         as literals (vocab-sized driver read), so the
  *                         encode is zero-join zero-shuffle codegen
  *   [-format parquet]     parquet | jsonl output
  *   [-partition_by cols]  hive-partitioned output directories (comma
  *                         list, e.g. source or source,lang)
  *   [-zorder c1,c2[,n]]   z-ordered layout (z2): write n files (def 8)
  *                         range-partitioned + sorted on the Morton
  *                         interleave of two numeric columns, so scans
  *                         filtering on either column prune files
  *   [-drop_code 1|keep_only] route code files out of a prose corpus
  *                         (or keep only them) via t29's structural
  *                         metrics — before language ID sees them
  *   [-fim salt]           fill-in-the-middle transform (t30): re-render
  *                         each doc <PRE>p<SUF>s<MID>m at deterministic
  *                         md5 cuts; a per-epoch salt redraws
  *   [-mix f[,salt]]       corpus mixing to target source shares (t27):
  *                         needs -mix_weights src=w[,src=w...] (integral
  *                         relative shares; -mix_default for unlisted
  *                         sources, def 1); keeps rate_s = min(1,
  *                         f·N·(w_s/Σw)/n_s) of each source with the
  *                         deterministic md5 draw
  *   [-split f[,salt]]     leakage-free train/test assignment (t28):
  *                         near-dup clusters draw their split as a
  *                         UNIT (no test doc has a near-copy in
  *                         train); adds cluster + split columns
  *   [-epoch_shuffle s[,n]] deterministic training-order shuffle (t24):
  *                         rank every doc by md5(salt s || doc_id) with
  *                         exact global ranks (two-phase, no global
  *                         sort) and write n files (def 8) range-split
  *                         on rank — reading files in order IS the
  *                         epoch order; a new salt redraws it
  *   [-single_file 1]      coalesce output to one part
  *   [-threads n] [-master url] [-shuffle_partitions n]
  * }}}
  *
  * Prints one JSON line of per-stage surviving-row counts (`"report"`).
  * Each enabled stage costs one extra narrow count() scan over its
  * localCheckpointed frame — accounting, not plan cost; the transform
  * chain itself stays one lazy plan. Near-dedup keeps the best-quality
  * member per duplicate cluster (ties: lowest doc_id), exactly d10's
  * resolution policy.
  */
object Corpus {

  private case class Stage(name: String, df: DataFrame)

  /** Adds a `_lang_pred` column with the t41 profile n-gram language ID,
    * preserving every input column. STAGED selects on purpose (same
    * shape as the t41 gate query): the gram list must be a bound
    * attribute before the 7 score folds reference it — HOF lambdas
    * re-evaluate closed-over non-attribute expressions once per array
    * element, and an inline formulation duplicates the gram subtree
    * into every score column.
    */
  private def withLangPred(d: DataFrame): DataFrame = {
    val keep = d.columns.toSeq
    val langs = text.langSeeds.map(_._1)
    d.select(keep.map(col) :+ text.langGrams(col("text")).as("_gs"): _*)
      .select(keep.map(col) ++ text.langNgramScores(col("_gs"))
        .map { case (l, c) => c.as(s"_s_$l") }: _*)
      .select(keep.map(col) :+ text.langNgramPick(
        langs.map(l => l -> col(s"_s_$l"))).as("_lang_pred"): _*)
  }

  def run(spark: SparkSession, opts: Map[String, String]): DataFrame = {
    require(!(opts.contains("i") && opts.contains("i_warc")),
      "-i and -i_warc are mutually exclusive inputs")
    // -i_warc: start from a raw crawl instead of a documents parquet —
    // WARC records -> html responses -> WET-style text extraction (w2),
    // doc_id derived from the WARC record id (md5 -> long, stable across
    // re-runs), source fixed to 'warc' so -pack's default shard works
    var df = opts.get("i_warc") match {
      case Some(warcPath) =>
        import graft.sources.Warc
        Warc.read(spark, warcPath)
          .where(col("warc_type") === "response" &&
            regexp_extract(col("payload"),
              "(?mi)^Content-Type: ?([^\r\n]*)", 1).contains("html"))
          .select(
            conv(substring(md5(col("record_id")), 1, 15), 16, 10)
              .cast("long").as("doc_id"),
            col("target_uri").as("url"),
            Warc.httpStatus(col("payload")).as("http_status"),
            Warc.extractText(Warc.httpBody(col("payload"))).as("text"),
            lit("warc").as("source"))
      case None =>
        spark.read.parquet(opts.getOrElse("i",
          sys.error("missing -i <documents parquet> or -i_warc <crawl>")))
    }
    require(df.columns.contains("doc_id") && df.columns.contains("text"),
      "input needs doc_id and text columns")
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def record(name: String): Unit =
      if (opts.getOrElse("report", "1") == "1") {
        df = df.localCheckpoint()
        stages += name -> df.count()
      }
    record("input")

    if (opts.getOrElse("dedup_url", "0") == "1") {
      // crawl-side URL dedup (t21+d16): the cheapest pass, so it runs
      // before any content stage touches text — one hash groupBy on the
      // canonical URL, min-id row kept
      require(df.columns.contains("url"),
        "-dedup_url needs a url column (use -i_warc or provide one)")
      val keep = Dedup.urlDedup(df, "doc_id", "url")
        .select(col("canonical_id").as("doc_id"))
      df = df.join(keep, Seq("doc_id"), "left_semi")
      record("dedup_url")
    }
    if (opts.getOrElse("strip_boilerplate", "0") == "1") {
      // line-level boilerplate removal (t25) ahead of the quality/lang
      // metrics — nav bars and footers would otherwise vote in them
      df = df.withColumn("text",
        text.stripBoilerplate(col("text")).getField("clean_text"))
      record("strip_boilerplate")
    }
    if (opts.getOrElse("normalize", "0") == "1") {
      df = df.withColumn("text", trim(regexp_replace(
        regexp_replace(col("text"), lit("[\\x00-\\x1f]"), lit(" ")),
        lit(" +"), lit(" "))))
      record("normalize")
    }
    opts.get("lang").foreach { want =>
      // default scorer is t41's profile n-gram ID (0.943 measured vs
      // the stopword scorer's 0.547 on the labeled fixture);
      // -lang_scorer stopword keeps the legacy t3 behavior
      df =
        if (opts.getOrElse("lang_scorer", "ngram") == "stopword")
          df.where(text.langId(col("text")) === want)
        else {
          val cols = df.columns.toSeq
          withLangPred(df).where(col("_lang_pred") === want)
            .select(cols.map(col): _*)
        }
      record(s"lang=$want")
    }
    opts.get("min_quality").map(_.toDouble).foreach { q =>
      df = df.where(text.qualityScore(col("text")) >= q)
      record(s"quality>=$q")
    }
    if (opts.getOrElse("gopher", "0") == "1") {
      df = df.where(text.gopherMetrics(col("text")).getField("keep"))
      record("gopher")
    }
    opts.get("repetition").foreach { spec =>
      // Gopher's repetition rules (t14): drop docs whose most frequent
      // 2-gram or duplicated 3-grams cover too many characters
      val parts = spec.split(",").map(_.trim.toDouble)
      require(parts.length == 2,
        s"-repetition wants top2max,dup3max — got '$spec'")
      df = df.where(text.topNgramCharFrac(col("text"), 2) < parts(0) &&
        text.dupNgramCharFrac(col("text"), 3) < parts(1))
      record(s"repetition<$spec")
    }
    opts.get("entropy").foreach { spec =>
      // character-entropy band (t20): drop gibberish (low H: repeated
      // chars, padding) and compression-bomb-like noise (H near the
      // 26-letter maximum). Zero-shuffle column arithmetic.
      val parts = spec.split(",").map(_.trim.toDouble)
      require(parts.length == 1 || parts.length == 2,
        s"-entropy wants min[,max] — got '$spec'")
      graft.plans.GraftFunctions.register(spark)
      // one native counting pass per row (bit-identical to the 26
      // length-difference probes the band used to inline — that fused
      // form grew the whole-stage method past janino's 64 KB cap and
      // the stage silently ran interpreted)
      val sNorm = regexp_replace(lower(col("text")), "[^a-z]", "")
      val h = call_function("graft_letter_entropy", sNorm)
      df = df.where(length(sNorm) > 0 && h >= parts(0) &&
        (if (parts.length == 2) h <= parts(1) else lit(true)))
      record(s"entropy=$spec")
    }
    opts.get("compress_band").foreach { spec =>
      // DEFLATE compression-ratio band (t38): drop boilerplate/templated
      // docs below min (they compress to almost nothing) and optional
      // noise above max; real java.util.zip codec work per row,
      // executor-side, zero shuffles
      val parts = spec.split(",").map(_.trim.toDouble)
      require(parts.length == 1 || parts.length == 2,
        s"-compress_band wants min[,max] — got '$spec'")
      graft.plans.GraftFunctions.register(spark)
      // bytes over BYTES: deflate_len counts UTF-8 octets, so the
      // denominator must too — length() counts chars and undercounts
      // multi-byte text ~2-3x, inflating the ratio past 1.0
      val ratio = call_function("graft_deflate_len", col("text"))
        .cast("double") / greatest(octet_length(col("text")), lit(1))
      df = df.where(length(col("text")) > 0 && ratio >= parts(0) &&
        (if (parts.length == 2) ratio <= parts(1) else lit(true)))
      record(s"compress_band=$spec")
    }
    opts.get("drop_code").foreach { v =>
      // code-vs-prose routing (t29): route code files out of a prose
      // corpus (or keep ONLY them with -drop_code keep_only) before
      // language ID sees them — zero-shuffle structural metrics
      require(v == "1" || v == "keep_only",
        s"-drop_code wants 1 | keep_only — got '$v'")
      val isCode = text.codeMetrics(col("text")).getField("is_code")
      df = df.where(if (v == "keep_only") isCode else !isCode)
      record(s"drop_code=$v")
    }

    opts.get("min_bigram_logp").map(_.toDouble).foreach { floor =>
      // corpus-trained bigram-LM filter (t17): drop docs whose mean
      // transition log-probability under the surviving corpus's own
      // model falls below the floor (word salad with a plausible
      // unigram mix). Docs too short to form a bigram are kept.
      val scores = operators.LanguageModel.bigramScores(df, "doc_id",
        "text")
        .where(col("avg_logp") < floor).select("doc_id")
      df = df.join(scores, Seq("doc_id"), "left_anti")
      record(s"bigram_logp>=$floor")
    }
    opts.get("min_backoff_logp").map(_.toDouble).foreach { floor =>
      // self-trained stupid-backoff trigram floor (t33): stricter than
      // the bigram floor — improbable word TRIPLES flag templated salad
      // the pair model scores as fine. Docs too short for a trigram
      // are kept, as in -min_bigram_logp.
      val scores = operators.LanguageModel
        .stupidBackoffScores(df, df, "doc_id", "text")
        .where(col("avg_logp") < floor).select("doc_id")
      df = df.join(scores, Seq("doc_id"), "left_anti")
      record(s"backoff_logp>=$floor")
    }
    opts.get("ccnet_keep").foreach { keep =>
      // CCNet bucket selector (t32): per-language perplexity terciles
      // under the surviving corpus's own bigram model; keep only the
      // listed buckets. Docs too short to score can't be ranked and
      // drop with the unlisted buckets.
      val buckets = keep.split(",").map(_.trim).filter(_.nonEmpty).toSet
      require(buckets.nonEmpty &&
        buckets.subsetOf(Set("head", "middle", "tail")),
        s"-ccnet_keep wants a comma list from head,middle,tail — " +
          s"got '$keep'")
      // tercile grouping keys on language: use an explicit lang column
      // when present, else the t41 profile scorer (same upgrade as
      // -lang; -lang_scorer stopword applies here too)
      val docLang =
        if (df.columns.contains("lang")) df.select(col("doc_id"), col("lang"))
        else if (opts.getOrElse("lang_scorer", "ngram") == "stopword")
          df.select(col("doc_id"), text.langId(col("text")).as("lang"))
        else withLangPred(df)
          .select(col("doc_id"), col("_lang_pred").as("lang"))
      val scored = operators.LanguageModel
        .bigramScores(df, "doc_id", "text")
        .join(docLang, Seq("doc_id"))
        .select("doc_id", "lang", "avg_logp")
      val keepIds = operators.LanguageModel
        .perplexityBuckets(scored, "doc_id", "lang", "avg_logp")
        .where(col("bucket").isin(buckets.toSeq: _*))
        .select("doc_id")
      df = df.join(keepIds, Seq("doc_id"), "left_semi")
      record(s"ccnet=${buckets.toSeq.sorted.mkString("+")}")
    }
    opts.get("min_classifier_score").map(_.toDouble).foreach { floor =>
      // learned quality filter (t15): broadcast hashed-feature linear
      // model, scored as a shuffle-free per-row fold — the score join
      // below is doc-keyed only because the CLI keeps arbitrary input
      // columns; the score frame is the same rows, so AQE broadcasts it
      val wPath = opts.getOrElse("classifier_weights",
        sys.error("-min_classifier_score needs -classifier_weights " +
          "<(bucket, weight) parquet>"))
      val dim = opts.getOrElse("classifier_dim", "65536").toInt
      val bias = opts.getOrElse("classifier_bias", "0.0").toDouble
      val scores = operators.Classifier.score(df, "doc_id", "text",
        spark.read.parquet(wPath), dim, bias)
        .where(col("clf_score") >= floor).select("doc_id")
      df = df.join(scores, Seq("doc_id"), "left_semi")
      record(s"classifier>=$floor")
    }
    opts.get("min_dsir_logw").map(_.toDouble).foreach { floor =>
      // DSIR importance filter (t35): hashed unigram+bigram models fit
      // on the target sample vs the surviving corpus; keep docs whose
      // importance log-weight clears the floor (0 = "more target-like
      // than pool-like"). The log-ratio table broadcasts; scoring is a
      // per-row fold, so the corpus scan never shuffles for the score.
      val tPath = opts.getOrElse("dsir_target",
        sys.error("-min_dsir_logw needs -dsir_target <parquet with a " +
          "text column>"))
      val dim = opts.getOrElse("dsir_dim", "65536").toInt
      val target = spark.read.parquet(tPath)
      require(target.columns.contains("text"),
        s"-dsir_target $tPath has no text column")
      val scores = operators.Dsir.importanceScores(target, df,
        "doc_id", "text", dim)
        .where(col("dsir_logw") >= floor).select("doc_id")
      df = df.join(scores, Seq("doc_id"), "left_semi")
      record(s"dsir>=$floor")
    }
    if (opts.getOrElse("pii", "0") == "1") {
      df = df.withColumn("text",
        text.redactPii(col("text")).getField("redacted"))
      record("pii")
    }
    opts.get("decontaminate").foreach { benchPath =>
      // eval-set leak check (t5): any doc sharing a distinct word-8-gram
      // with a benchmark doc is dropped. The benchmark side collapses to
      // a distinct gram set (eval sets are tiny next to the corpus), so
      // the join is id-only rows against an AQE-broadcast gram table.
      val bench = spark.read.parquet(benchPath)
      require(bench.columns.contains("text"),
        s"-decontaminate parquet at $benchPath needs a text column")
      val hits = Dedup.contamination(df, bench, "doc_id", "text")
        .select("doc_id")
      df = df.join(hits, Seq("doc_id"), "left_anti")
      record("decontaminate")
    }
    opts.get("max_dup_ratio").map(_.toDouble).foreach { r =>
      // corpus-wide duplicated-content filter (t12): drop docs whose
      // word-8-gram duplication fraction exceeds the cap; docs too short
      // to form a gram carry ratio 0 and are kept
      val ratios = Dedup.duplicationRatio(df, "doc_id", "text")
        .select(col("doc_id"), col("dup_ratio"))
      df = df.join(ratios, Seq("doc_id"), "left")
        .where(coalesce(col("dup_ratio"), lit(0.0)) <= r)
        .drop("dup_ratio")
      record(s"dup_ratio<=$r")
    }
    opts.get("dedup_against").foreach { corpusPath =>
      // incremental exact-dedup admission against an EXISTING corpus
      // (d21/e23): drop arriving docs whose content hash the corpus at
      // `corpusPath` already holds. mode=bloom (default) admits on the
      // broadcast bit set alone — the 100 TB hot path, FP-bounded,
      // never joins the corpus; mode=exact verifies candidates with
      // one hash-keyed join (zero FPs, corpus-join priced).
      val mode = opts.getOrElse("dedup_against_mode", "bloom")
      val corpus = spark.read.parquet(corpusPath)
      require(corpus.columns.contains("text"),
        s"-dedup_against parquet at $corpusPath needs a text column")
      val dropIds = mode match {
        case "bloom" =>
          val bitSet = operators.BloomJoin.buildBits(
            corpus.select(md5(col("text")).as("h")).distinct(), "h",
            65536, 3)
          Dedup.bloomAdmit(df, bitSet, "doc_id", "text")
            .where(col("bloom_hit")).select("doc_id")
        case "exact" =>
          Dedup.bloomDedup(df, corpus, "doc_id", "text")
            .where(col("is_dup")).select("doc_id")
        case other =>
          sys.error(s"unknown -dedup_against_mode: $other")
      }
      df = df.join(dropIds, Seq("doc_id"), "left_anti")
      record(s"dedup_against=$mode")
    }
    if (opts.getOrElse("dedup_paragraph", "0") == "1") {
      // Dolma-style exact paragraph dedup (d20): later occurrences of a
      // corpus-duplicated paragraph are removed, the globally-first
      // survives; rows never drop — texts shrink (possibly to empty)
      val ded = Dedup.paragraphDedup(df, "doc_id", "text")
        .select(col("doc_id"), col("text_dedup"))
      df = df.join(ded, Seq("doc_id"))
        .withColumn("text", col("text_dedup")).drop("text_dedup")
      record("dedup_paragraph")
    }
    if (opts.getOrElse("cut_spans", "0") == "1") {
      // substring-level dedup (d14): later occurrences of duplicated
      // 8-gram runs are cut from the text; every doc survives (possibly
      // emptied), so this never drops rows — only shrinks them
      val cut = Dedup.cutDuplicateSpans(df, "doc_id", "text")
        .select(col("doc_id"), col("text_cut"))
      df = df.join(cut, Seq("doc_id"))
        .withColumn("text", col("text_cut")).drop("text_cut")
      record("cut_spans")
    }

    opts.getOrElse("dedup", "near") match {
      case "none" =>
      case "exact" =>
        // keep the canonical (min-id) doc of each identical-content group
        val keep = Dedup.exact(df, "doc_id", "text")
          .select(col("canonical_id").as("doc_id"))
        df = df.join(keep, Seq("doc_id"), "left_semi")
        record("dedup=exact")
      case mode @ ("near" | "near_winnow") =>
        val thr = opts.getOrElse("jaccard", "0.8").toDouble
        // near = whole-document resemblance (minhash Jaccard);
        // near_winnow = LOCAL overlap (d17: shared winnowing
        // fingerprints, containment-normalized) — catches the
        // quote-inside-article / shared-passage duplicates minhash
        // misses; same cluster+resolve tail either way
        val pairs =
          if (mode == "near")
            Dedup.minhashLsh(df, "doc_id", "text",
              jaccardThreshold = thr)
          else
            graft.operators.Winnowing.winnowPairs(df, "doc_id", "text")
              .where(col("score") >= thr)
              .select(col("id1"), col("id2"))
        val clusters = Dedup.duplicateClusters(pairs)
        // d10's resolution: best quality per cluster, ties -> lowest id.
        // row_number over (q desc, id asc) works for ANY orderable id type
        // (a -col("id") trick would null-cast string ids and drop every
        // cluster member); clusters are capped-small so the per-cluster
        // window never skews a partition.
        val quality = df.select(col("doc_id").as("id"),
          text.qualityScore(col("text")).as("q"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster"))
          .orderBy(col("q").desc, col("id").asc)
        val losers = clusters.join(quality, Seq("id"))
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") > 1)
          .select(col("id").as("doc_id"))
        df = df.join(losers, Seq("doc_id"), "left_anti")
        record(s"dedup=$mode@$thr")
      case other => sys.error(s"unknown -dedup mode: $other")
    }

    opts.get("fim").foreach { salt =>
      // fill-in-the-middle transform (t30): PSM re-render of each doc's
      // words at deterministic md5-drawn cuts — runs AFTER the filter
      // stages (metrics should see natural text); a per-epoch salt
      // redraws the cuts
      df = df.withColumn("text",
        text.fimSplit(col("text"), col("doc_id"), salt))
      record(s"fim@$salt")
    }

    // -mix frac[,salt] + -mix_weights src=w,... [+ -mix_default n]:
    // corpus mixing to target source proportions (t27) — integral
    // weights, deterministic md5 draw; over-weighted small sources cap
    // at rate 1 (documented shortfall)
    opts.get("mix").foreach { spec =>
      val parts = spec.split(",").map(_.trim)
      require(parts.length == 1 || parts.length == 2,
        s"-mix wants targetFrac[,salt] — got '$spec'")
      val salt = if (parts.length == 2) parts(1) else ""
      val weights = opts.getOrElse("mix_weights", sys.error(
        "-mix needs -mix_weights src=w[,src=w...]"))
        .split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=").map(_.trim)
          k -> v.toLong
        }.toMap
      val dflt = opts.getOrElse("mix_default", "1").toLong
      df = operators.Sampling.mixSample(df, "source", "doc_id",
        weights, dflt, parts(0).toDouble, salt).drop("mix_rate")
      record(s"mix@${parts(0)}")
    }

    // -split frac[,salt]: leakage-free train/test assignment (t28) —
    // near-dup clusters draw their split as a unit, so no test doc has
    // a near-copy in train; adds cluster + split columns
    opts.get("split").foreach { spec =>
      val parts = spec.split(",").map(_.trim)
      require(parts.length == 1 || parts.length == 2,
        s"-split wants testFrac[,salt] — got '$spec'")
      val salt = if (parts.length == 2) parts(1) else ""
      val asg = operators.Sampling.leakageFreeSplit(df, "doc_id",
        "text", parts(0).toDouble, salt)
        .select(col("id").as("doc_id"), col("cluster"), col("split"))
      df = df.join(asg, Seq("doc_id"))
      record(s"split@${parts(0)}")
    }

    opts.get("encode_bpe").foreach { p =>
      // t23: encode with a trained merge table. The merge list is
      // vocab-sized (a broadcast-dim-scale driver read) and bakes into
      // the expression as literals — the per-doc encode then runs as
      // zero-join zero-shuffle whole-stage codegen.
      val m = spark.read.parquet(p)
      require(Seq("rank", "s1", "s2").forall(m.columns.contains),
        s"-encode_bpe parquet at $p needs (rank, s1, s2) columns " +
          "(write one with -train_merges)")
      val merges = m.orderBy("rank").collect()
        .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"))).toSeq
      df = df.withColumn("tokens", text.bpeEncode(col("text"), merges))
        .withColumn("n_tokens", size(col("tokens")).cast("long"))
      record(s"encode_bpe=${merges.length}")
    }

    // training-example shaping (the pipeline's LAST stage — after dedup,
    // so budgets count surviving text only). The two shapers target
    // opposite doc-length regimes, so exactly one may run:
    //   -chunk size,stride  slide fixed token windows over OVER-budget
    //                       docs (t13); rows become per-chunk
    //   -pack budget[,col]  assign short docs to ~budget-token chunks
    //                       per shard (t7 prefix-sum greedy); rows keep
    //                       doc granularity + (tokens, chunk_idx)
    require(!(opts.contains("chunk") && opts.contains("pack")),
      "-chunk and -pack are mutually exclusive (chunk splits long docs, " +
        "pack groups short ones — run two passes to do both)")
    // token counter for the budget stages: the bpe regex proxy by
    // default, or the real greedy longest-match tokenizer (t16) when a
    // vocab parquet is supplied. The vocab collapses to one broadcast
    // map row, so either counter is shuffle-free per-row work.
    val vocabCounter: Option[(DataFrame, Int)] = opts.get("vocab").map {
      spec =>
        val parts = spec.split(",").map(_.trim)
        val v = spark.read.parquet(parts(0))
        require(v.columns.contains("token"),
          s"-vocab parquet at ${parts(0)} needs a token column")
        val maxLen = if (parts.length > 1) parts(1).toInt else 8
        val vmapRow = v.agg(map_from_entries(collect_list(
          struct(col("token"), lit(1)))).as("_vocab_map"))
        (vmapRow, maxLen)
    }
    def withTokenCount(frame: DataFrame, from: String,
                       as: String): DataFrame = vocabCounter match {
      case Some((vmapRow, maxLen)) =>
        frame.crossJoin(broadcast(vmapRow))
          .withColumn(as,
            text.vocabTokenCount(col(from), col("_vocab_map"), maxLen)
              .cast("long"))
          .drop("_vocab_map")
      case None =>
        frame.withColumn(as, text.bpeTokenCount(col(from)).cast("long"))
    }
    opts.get("chunk").foreach { spec =>
      val parts = spec.split(",").map(_.trim)
      require(parts.length == 2,
        s"-chunk wants size,stride — got '$spec'")
      val (sz, stride) = (parts(0).toInt, parts(1).toInt)
      df = operators.Packing.chunkOverlap(df, "text", sz, stride)
        .drop("text")
      // windows stay word-aligned (that is t13's contract); the vocab
      // counter re-budgets each window so downstream token accounting
      // uses real-tokenizer counts
      if (vocabCounter.isDefined)
        df = withTokenCount(df, "chunk_text", "chunk_vocab_tokens")
      record(s"chunk=$sz,$stride")
    }
    opts.get("pack").foreach { spec =>
      val parts = spec.split(",").map(_.trim)
      val budget = parts(0).toLong
      val shard = if (parts.length > 1) parts(1) else "source"
      require(df.columns.contains(shard),
        s"-pack shard column '$shard' not in input (pass -pack " +
          s"$budget,<col>); sharding is what keeps packing parallel — " +
          "a global pack would serialize the corpus into one task")
      df = operators.Packing.packSequences(
        withTokenCount(df, "text", "tokens"),
        shard, "doc_id", "tokens", budget)
      record(s"pack=$budget/$shard")
    }

    // -train_vocab n,path: learn n BPE merges from the SURVIVING corpus
    // (post-filter/dedup, so boilerplate doesn't vote) and write the
    // chars+merges vocabulary parquet for a next run's -vocab / t16
    // -embed_out dim,path: write the surviving corpus's feature-hashing
    // embeddings (t39) as a sparse long-form sidecar table — the
    // model-free representation the similarity family consumes when no
    // trained encoder exists
    opts.get("embed_out").foreach { spec =>
      val parts = spec.split(",", 2).map(_.trim)
      require(parts.length == 2,
        s"-embed_out wants dim,outPath — got '$spec'")
      operators.Similarity.hashedEmbedding(df, "doc_id", "text",
        parts(0).toInt)
        .write.mode("overwrite").parquet(parts(1))
    }

    opts.get("train_vocab").foreach { spec =>
      val parts = spec.split(",", 2).map(_.trim)
      require(parts.length == 2,
        s"-train_vocab wants merges,outPath — got '$spec'")
      operators.Tokenizer.bpeVocab(df, "text", parts(0).toInt)
        .coalesce(1).write.mode("overwrite").parquet(parts(1))
    }

    // -train_merges n,path: the ordered merge table for -encode_bpe —
    // train (t18) and encode (t23) share the replace-twice contract, so
    // a corpus encoded with its own merges reproduces training's word
    // segmentations exactly
    opts.get("train_merges").foreach { spec =>
      val parts = spec.split(",", 2).map(_.trim)
      require(parts.length == 2,
        s"-train_merges wants merges,outPath — got '$spec'")
      operators.Tokenizer.bpeTrain(df, "text", parts(0).toInt)
        .coalesce(1).write.mode("overwrite").parquet(parts(1))
    }

    opts.get("o").foreach { out =>
      // -zorder c1,c2[,files]: lay the output on a Morton curve over two
      // numeric columns (z2) so downstream scans filtering on EITHER
      // column prune files by parquet min/max stats. Layout options are
      // one-of: hive dirs, z-curve, or single file.
      require(Seq(opts.contains("zorder"), opts.contains("partition_by"),
        opts.contains("epoch_shuffle"),
        opts.getOrElse("single_file", "0") == "1").count(identity) <= 1,
        "-zorder, -partition_by, -epoch_shuffle and -single_file are " +
          "mutually exclusive layout choices")
      val shaped = opts.get("epoch_shuffle") match {
        case Some(spec) =>
          // t24's exact-rank shuffle + a range split on the rank: file
          // order == epoch order, deterministic per salt (retry/re-run
          // stable, unlike rand()); files are near-equal by construction
          // because ranks are dense 0..n-1
          val parts = spec.split(",").map(_.trim)
          require(parts.length == 1 || parts.length == 2,
            s"-epoch_shuffle wants salt[,files] — got '$spec'")
          val files = if (parts.length == 2) parts(1).toInt else 8
          operators.Sampling.shuffleRank(df, "doc_id", parts(0))
            .repartitionByRange(files, col("shuffle_rank"))
            .sortWithinPartitions("shuffle_rank")
        case None => opts.get("zorder") match {
          case Some(spec) =>
            val parts = spec.split(",").map(_.trim)
            require(parts.length == 2 || parts.length == 3,
              s"-zorder wants c1,c2[,files] — got '$spec'")
            val files = if (parts.length == 3) parts(2).toInt else 8
            graft.functions.zorder.zOrdered(df, parts(0), parts(1),
              numFiles = files)
          case None =>
            if (opts.getOrElse("single_file", "0") == "1") df.coalesce(1)
            else df
        }
      }
      // hive-style layout: one directory per partition value — at scale
      // this is what makes downstream per-source/per-lang reads prune
      // to a subtree instead of scanning the corpus
      val writer = opts.get("partition_by") match {
        case Some(cols) =>
          shaped.write.mode("overwrite")
            .partitionBy(cols.split(",").map(_.trim): _*)
        case None => shaped.write.mode("overwrite")
      }
      opts.getOrElse("format", "parquet") match {
        case "parquet" => writer.parquet(out)
        case "jsonl" => writer.json(out)
        case other => sys.error(s"unknown -format: $other")
      }
    }
    if (stages.nonEmpty) {
      val report = stages.map { case (n, c) => s"\"$n\":$c" }
        .mkString("{", ",", "}")
      println(s"""{"tool":"corpus","report":$report}""")
    }
    df
  }

  def main(args: Array[String]): Unit = {
    val opts = ProHapCli.parseArgs(args)
    val spark = ProHapCli.session(opts, "graft-corpus")
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts) finally spark.stop()
  }
}
