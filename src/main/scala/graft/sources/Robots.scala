package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + the longest-match URL exclusion check — the
  * crawl-politeness stage between link extraction (w3) and fetch
  * scheduling. Grammar per the robots exclusion standard (RFC 9309
  * subset): `User-agent:` opens a stanza, `Allow:`/`Disallow:` rules
  * belong to the most recent stanza, `#` starts a comment, matching is
  * by path PREFIX, the longest matching rule wins and an Allow beats a
  * Disallow of equal length. Deliberate simplifications (documented,
  * shared by the oracle): no `*`/`$` wildcards inside rule paths, and a
  * rule line between two consecutive `User-agent` lines binds to the
  * nearest one only.
  *
  * Scale: parsing is a per-file explode + one (uri)-keyed window (a
  * robots file is KBs — the window partition is per-host metadata, not
  * corpus data); the rule table is broadcast to the URL side, so the
  * URL scan never shuffles.
  */
object Robots {

  /** Parse (uri, body) robots.txt documents into one rule row per
    * (host, agent, rule, path). Stanza association is a running count
    * of `User-agent` lines (rules with group g bind to agent line #g);
    * comments and blank lines drop; empty-path rules (a no-op
    * "Disallow:" meaning allow-all) drop.
    */
  def rules(robots: DataFrame, uriCol: String = "uri",
            bodyCol: String = "body"): DataFrame = {
    val lines = robots
      .select(col(uriCol).as("uri"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("_i", "_l")))
      .select(col("uri"), col("_i"),
        trim(regexp_replace(col("_l"), "#.*$", "")).as("_l"))
      .where(length(col("_l")) > 0)
    val isUa = lower(col("_l")).startsWith("user-agent:")
    val w = Window.partitionBy(col("uri")).orderBy(col("_i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = lines
      .withColumn("_ua", isUa)
      .withColumn("_grp",
        sum(when(col("_ua"), 1).otherwise(0)).over(w))
    val agents = tagged.where(col("_ua"))
      .select(col("uri"), col("_grp"),
        trim(regexp_extract(col("_l"), "(?i)^user-agent:(.*)$", 1))
          .as("agent"))
    val ruleRows = tagged
      .where(!col("_ua") &&
        (lower(col("_l")).startsWith("allow:") ||
          lower(col("_l")).startsWith("disallow:")))
      .select(col("uri"), col("_grp"),
        when(lower(col("_l")).startsWith("allow:"), "allow")
          .otherwise("disallow").as("rule"),
        trim(regexp_extract(col("_l"), "(?i)^(dis)?allow:(.*)$", 2))
          .as("path"))
      .where(length(col("path")) > 0)
    ruleRows.join(agents, Seq("uri", "_grp"))
      .select(
        regexp_extract(col("uri"), "^[a-z]+://([^/]+)", 1).as("host"),
        col("agent"), col("rule"), col("path"))
  }

  /** Check every URL against the rules for `agent`: the agent-specific
    * stanza takes precedence over `*` PER HOST (a host with an
    * agent-specific stanza contributes only those rules — RFC 9309
    * group selection); within the applicable rules the longest matching
    * path prefix decides, Allow winning length ties; no matching rule
    * (or an unknown host) means allowed. One broadcast join — the URL
    * side never shuffles.
    */
  def check(urls: DataFrame, ruleTable: DataFrame, agent: String,
            urlCol: String = "url"): DataFrame = {
    val specific = ruleTable.where(col("agent") === agent)
    val wildcard = ruleTable.where(col("agent") === "*")
      .join(specific.select("host").distinct(), Seq("host"), "left_anti")
    val applicable = specific.unionByName(wildcard)
      .select(col("host").as("_rhost"), col("rule"), col("path"))
    val parsed = urls
      .withColumn("_host",
        regexp_extract(col(urlCol), "^[a-z]+://([^/]+)", 1))
      .withColumn("_path", coalesce(
        nullif(regexp_extract(col(urlCol), "^[a-z]+://[^/]+(/.*)$", 1),
          lit("")), lit("/")))
    val best = parsed
      .join(broadcast(applicable),
        col("_host") === col("_rhost") &&
          col("_path").startsWith(col("path")), "left")
      .groupBy(col(urlCol))
      .agg(max(when(col("path").isNotNull,
        struct(length(col("path")).as("len"),
          (col("rule") === "allow").as("is_allow"),
          col("path").as("path")))).as("_best"))
    best.select(col(urlCol),
      coalesce(col("_best.is_allow"), lit(true)).as("allowed"),
      col("_best.path").as("matched_path"))
  }
}
