package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-domain curation — the RefinedWeb/Gopher-style stage a crawl
  * pipeline runs BEFORE anything content-based: URL-host extraction,
  * per-domain quotas (no single host may dominate the corpus), and
  * URL-level exact dedup (the same page fetched twice is the cheapest
  * duplicate to kill — no text ever needs to be compared).
  *
  * Everything here is a thin composition over codegen'd built-ins
  * (`parse_url`, `xxhash64` via [[Sampling.hashScore]], the
  * [[graft.functions.topk_by]] bounded-heap aggregate) — no UDFs, no
  * text shuffles: every shuffle in this file carries hosts, keys and
  * ids only. */
object Domains {

  /** Normalized host of a URL: `parse_url(url, 'HOST')` (which excludes
    * any `:port`), lowercased, one leading `www.` stripped — the
    * grouping key crawl pipelines quota and report on. Null/unparseable
    * URLs yield null. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Canonical URL identity for exact dedup: normalized host + path with
    * trailing slashes stripped + `?query` if present. Scheme and
    * fragment drop out (neither changes the fetched document); path
    * CASE is preserved (paths are case-sensitive, hosts are not). */
  def normalizedUrl(url: Column): Column = {
    val path = regexp_replace(
      coalesce(parse_url(url, lit("PATH")), lit("")), "/+$", "")
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    concat(urlHost(url), path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Docs per normalized host, the pre-flight census a quota decision
    * reads (and the skew report: one host holding 40% of a crawl is the
    * expected shape, not an anomaly). One map-side-combined aggregate. */
  def domainCounts(df: DataFrame, urlCol: String): DataFrame =
    df.groupBy(urlHost(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("docs"))

  /** Keep at most `maxPerDomain` documents per normalized host, selected
    * deterministically by seeded hash score (smallest
    * [[Sampling.hashScore]] wins, ties by id ascending) — reproducible
    * across runs, layouts and engines, like every sampler here.
    *
    * Scale shape: per-domain selection is the
    * [[graft.functions.topk_by]] bounded-heap AGGREGATE, not a
    * `row_number()` window — at most `maxPerDomain` (score, id) entries
    * per (host, task) cross the shuffle, and a mega-host (the 40%-host
    * above) costs its share of heap merges instead of one task sorting
    * its every row. The kept-id set then left-semi-joins the corpus
    * (ids only); document text never shuffles. `idCol` must be
    * integral (the heap carries ids as longs). */
  def domainQuotaSample(df: DataFrame, urlCol: String, idCol: String,
                        maxPerDomain: Int, seed: Long): DataFrame = {
    require(maxPerDomain > 0,
      s"maxPerDomain must be positive, got $maxPerDomain")
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"domainQuotaSample requires an integral id column; '$idCol' is $t")
    }
    val kept = df
      .groupBy(urlHost(col(urlCol)).as("__host"))
      .agg(graft.functions.topk_by(
        -Sampling.hashScore(col(idCol), seed),
        col(idCol).cast("long"), maxPerDomain).as("__top"))
      .select(explode(col("__top.id")).as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Suffix-aware host blocklist — the RefinedWeb/Gopher step that runs
    * before any content is even read: drop every document whose
    * normalized host equals a blocked domain OR is a subdomain of one
    * (blocking `example.com` also blocks `cdn.example.com`; matches are
    * on dot boundaries only, so `notexample.com` survives). A blocklist
    * containing a bare TLD blocks that whole TLD — that is the caller's
    * list meaning, not a bug.
    *
    * Scale shape: each host explodes into its dot-suffix chain
    * (`a.b.c` → `a.b.c`, `b.c`, `c` — ids+suffixes only, ~4 short rows
    * per doc), which equi-joins the broadcast blocklist; matched ids
    * anti-join the corpus. The equi-join form is deliberate: the
    * no-explode alternative is a broadcast NESTED-LOOP `ends_with` join —
    * O(corpus × |blocklist|) comparisons, hopeless at a real blocklist's
    * 10⁵+ entries, while the suffix chain is O(corpus × host depth)
    * hashed probes regardless of list size. `blocked` must have a
    * `domain` column (matched case-insensitively). */
  def filterBlockedHosts(df: DataFrame, urlCol: String, idCol: String,
                         blocked: DataFrame): DataFrame = {
    val parts = split(urlHost(col(urlCol)), "\\.")
    val suffixes = transform(
      sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
    val hit = df
      .select(col(idCol), explode(suffixes).as("domain"))
      .join(broadcast(blocked.select(lower(col("domain")).as("domain"))),
        Seq("domain"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(hit, Seq(idCol), "left_anti")
  }

  /** Per-domain TOKEN budget (the mass-based sibling of
    * [[domainQuotaSample]] — crawl quotas are usually stated in
    * bytes/tokens, not documents): within each normalized host, walk the
    * docs in seeded-hash order (ties by id) and keep every doc whose
    * INCLUSIVE running `massCol` total still fits `budgetPerDomain` —
    * docs kept or dropped whole, the [[Packing.selectToTokenBudget]]
    * rule applied per host.
    *
    * Scale shape: one running-sum window PARTITIONED BY host — parallel
    * across hosts, running aggregation (no whole-group buffering), and
    * the global single-reducer trap doesn't apply because the partition
    * key is the host. The residual skew is a mega-host sorting on one
    * task; if one host is a large fraction of the corpus, cap it by DOC
    * count first ([[domainQuotaSample]], heap-based, skew-immune) and
    * budget the remainder. Null hosts drop (no place in any quota). */
  def domainTokenQuota(df: DataFrame, urlCol: String, idCol: String,
                       massCol: Column, budgetPerDomain: Long,
                       seed: Long): DataFrame = {
    require(budgetPerDomain >= 0,
      s"budgetPerDomain must be >= 0, got $budgetPerDomain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__host"))
      .orderBy(col("__score").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__host", urlHost(col(urlCol)))
      .filter(col("__host").isNotNull)
      .withColumn("__score", Sampling.hashScore(col(idCol), seed))
      .withColumn("__run", sum(massCol.cast("long")).over(w))
      .filter(col("__run") <= budgetPerDomain)
      .drop("__host", "__score", "__run")
  }

  /** URL-level exact dedup: keep the smallest-id document per
    * [[normalizedUrl]] key (keep-earliest, the [[Dedup.exact]]
    * convention). One ids+keys aggregate (map-side-combined `min`) and
    * one semi-join — the document body is never read by the decision,
    * which is the whole point of deduplicating on URL identity first. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(normalizedUrl(col(urlCol)).as("__ukey"), col(idCol))
      .groupBy("__ukey").agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
