package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source — the container format web crawls (Common
  * Crawl et al.) arrive in, i.e. the first stage of every web-scale
  * training-data pipeline.
  *
  * Spark-first design: a WARC file is a concatenation of records, each
  * `WARC/1.0\r\n<headers>\r\n\r\n<payload>\r\n\r\n`. Reading with
  * `lineSep = "\r\n\r\nWARC/1.0\r\n"` makes the scan SPLITTABLE — an HDFS
  * block boundary lands mid-record and the reader scans forward to the
  * next separator, exactly like plain line splitting — so one 1 GB WARC
  * parallelizes across tasks and a crawl's ~64k files across executors,
  * with no whole-file buffering. Header fields and the Content-Length
  * payload trim are native codegen'd expressions.
  *
  * Honesty note: a payload that itself contains the byte sequence
  * `\r\n\r\nWARC/1.0\r\n` would split early (the same caveat every
  * boundary-scan WARC reader carries); the affected record surfaces with
  * `truncated = true` rather than silently, because its body comes up
  * short of Content-Length. Gzipped crawls (`.warc.gz`) decompress
  * through Hadoop's codec before the same splitter; compressed files
  * parallelize per-file rather than per-block.
  */
object Warc {

  private val Boundary = "\r\n\r\nWARC/1.0\r\n"

  private def header(block: Column, name: String): Column =
    nullif(regexp_extract(block, s"(?m)^$name: ?([^\r\n]*)", 1), lit(""))

  /** One row per WARC record: header fields, Content-Length-trimmed
    * payload, and a `truncated` flag when the stored body is shorter
    * than Content-Length declares (truncated capture or split collision).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Boundary).text(path)
    // only the file's first record keeps its "WARC/1.0\r\n" prefix — the
    // separator consumes it for every later record. Header lookups run
    // against the whole record but (?m)^ + first-match means the WARC
    // header block always wins over same-named HTTP payload headers.
    raw
      .where(length(trim(col("value"))) > 0)
      .select(regexp_replace(col("value"), "^WARC/1\\.0\r\n", "").as("rec"))
      .withColumn("hdr", substring_index(col("rec"), "\r\n\r\n", 1))
      .withColumn("body", when(instr(col("rec"), "\r\n\r\n") > 0,
        col("rec").substr(length(col("hdr")) + 5, length(col("rec"))))
        .otherwise(lit("")))
      .withColumn("content_length",
        // digit-guarded (sources.Casts): a malformed Content-Length in a
        // crawl must yield null, not an ANSI cast failure — and pushed-
        // down inferred predicates can evaluate this anywhere
        Casts.tryLong(header(col("rec"), "Content-Length")))
      .select(
        header(col("rec"), "WARC-Type").as("warc_type"),
        header(col("rec"), "WARC-Record-ID").as("record_id"),
        header(col("rec"), "WARC-Date").as("warc_date"),
        header(col("rec"), "WARC-Target-URI").as("target_uri"),
        header(col("rec"), "Content-Type").as("content_type"),
        col("content_length"),
        when(col("content_length").isNotNull,
          col("body").substr(lit(1), col("content_length")))
          .otherwise(col("body")).as("payload"),
        (col("content_length").isNotNull &&
          length(col("body")) < col("content_length")).as("truncated"))
  }

  /** HTTP status line code of a response payload (null for non-HTTP). */
  def httpStatus(payload: Column): Column =
    nullif(regexp_extract(payload, "^HTTP/1\\.[01] (\\d{3})", 1), lit(""))
      .cast("int")

  /** The entity body of an HTTP response payload (after its header
    * block); empty when the payload has no header/body split.
    */
  def httpBody(payload: Column): Column =
    when(instr(payload, "\r\n\r\n") > 0,
      payload.substr(
        length(substring_index(payload, "\r\n\r\n", 1)) + 5,
        length(payload)))
      .otherwise(lit(""))

  /** WET-style text extraction from an HTML body: drop script/style
    * blocks, strip tags, decode the common entities (&amp; LAST, so
    * double-escaped text stays escaped exactly once), collapse
    * whitespace. Pure regexp/replace columns — no UDF, and every regex
    * stays inside the RE2 subset so a SQL oracle can replay it.
    */
  /** Outlink hrefs from an HTML body — the web-graph edge extractor
    * (feeds the d11 PageRank / d16 URL-dedup path): every `<a ... href>`
    * value, quote style normalized (double/single/unquoted), fragment-
    * only links dropped (same-page anchors are not edges). Stays in the
    * RE2 subset (non-greedy attribute skip, character classes match
    * newlines) so the SQL oracle replays it; no HTML parser dependency —
    * the crawl-scale tradeoff every WET-style extractor makes.
    */
  def extractLinks(htmlBody: Column): Column =
    filter(
      transform(
        regexp_extract_all(htmlBody,
          lit("(?is)<a\\s[^>]*?href\\s*=\\s*('[^']*'|\"[^\"]*\"|[^\\s>]+)"),
          lit(1)),
        l => regexp_replace(l, "^['\"]|['\"]$", "")),
      l => length(l) > 0 && !l.startsWith("#"))

  /** Resolve an extracted href against its page's base URI — the step
    * between [[extractLinks]] and any graph/frontier consumer (relative
    * links are most links on most sites; an unresolved edge list
    * under-counts every intra-site edge). RFC 3986's common cases,
    * CASE-expressible so the SQL oracle replays it: scheme-qualified
    * hrefs pass through, `//host/...` adopts the base scheme, `/path`
    * roots at the base authority, anything else joins the base
    * directory; fragments strip first (same-page anchors are not
    * edges). Dot-segment normalization (`..`) is deliberately omitted —
    * crawl canonicalization (t21) owns URL normalization.
    */
  def resolveHref(base: Column, href: Column): Column = {
    val h = regexp_replace(href, "#.*$", "")
    val root = regexp_extract(base, "^(https?://[^/?#]+)", 1)
    val scheme = regexp_extract(base, "^(https?):", 1)
    val path = regexp_extract(base, "^https?://[^/?#]+([^?#]*)", 1)
    val dir = regexp_replace(
      when(path === "", lit("/")).otherwise(path), "[^/]*$", "")
    when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"), concat(root, h))
      .otherwise(concat(root, dir, h))
  }

  def extractText(htmlBody: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(htmlBody, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        replace(c, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
