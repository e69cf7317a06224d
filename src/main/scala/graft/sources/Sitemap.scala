package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sitemaps.org sitemap source — the crawl-frontier SEED feed that
  * complements discovered links (w3/w6/w7): sites publish the URLs they
  * WANT crawled, with freshness hints a scheduler prioritizes on.
  * Parsed with anchored regexes over whole files (one row per file;
  * the spec caps a sitemap at 50 MB, so a file is a row, and a 100 TB
  * crawl's million sitemaps parallelize per file — no XML library, no
  * UDF): one `<url>` block explode, per-field extraction, entity
  * decoding on `<loc>` (the &amp;-in-query case), missing optional
  * fields null. `<priority>` casts via the digit-guarded path so a
  * malformed value nulls instead of failing the scan.
  */
object Sitemap {

  /** One row per `<url>` block: (sitemap_uri, loc, lastmod, changefreq,
    * priority), block order preserved per file via `url_idx`.
    */
  def parse(sitemaps: DataFrame, uriCol: String = "uri",
            bodyCol: String = "body"): DataFrame = {
    val blocks = sitemaps
      .select(col(uriCol).as("sitemap_uri"),
        posexplode(regexp_extract_all(col(bodyCol),
          lit("(?s)<url>(.*?)</url>"), lit(1)))
          .as(Seq("url_idx", "_b")))
    def field(tag: String) =
      nullif(regexp_extract(col("_b"), s"(?s)<$tag>(.*?)</$tag>", 1), lit(""))
    val loc = trim(field("loc"))
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(loc,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&apos;", "'"),
      "&amp;", "&")
    blocks.select(
      col("sitemap_uri"), col("url_idx").cast("long").as("url_idx"),
      decoded.as("loc"),
      Casts.tryDate(field("lastmod")).as("lastmod"),
      field("changefreq").as("changefreq"),
      Casts.tryDouble(field("priority")).as("priority"))
      .where(col("loc").isNotNull)
  }

  /** Read sitemap XML files (one parsed row set per file). */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("uri"), col("value").as("body")))
}
