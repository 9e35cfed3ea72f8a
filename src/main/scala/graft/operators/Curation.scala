package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: reproducible
  * sampling/splitting and sequence packing.
  *
  * Everything here is deterministic by CONTENT, not by RNG: the sampling
  * bucket is derived from a salted md5 of the text, so a subset is stable
  * across runs, cluster sizes, and partitionings — re-running the
  * pipeline on a grown corpus keeps every previously-selected document
  * selected (the property RNG-based `sample()` cannot give), and the
  * same expression is computable by any SQL engine for auditing.
  */
object Curation {

  /** Deterministic bucket in [0, 10000): first 8 hex digits of the
    * salted content md5, as an integer, mod 10⁴. Map-only, codegen'd.
    */
  def hashBucket(text: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), text)), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Reproducible `fraction`-sample: keep rows whose content bucket
    * falls below fraction·10⁴. No RNG, no shuffle — a map-side filter
    * that pushes to the scan.
    */
  def hashSample(docs: DataFrame, fraction: Double, salt: String = "graft",
      textCol: String = "text"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1]: $fraction")
    docs.filter(
      hashBucket(col(textCol), salt) < math.round(fraction * 10000).toInt)
  }

  /** Deterministic train/val/test assignment from the same bucket:
    * buckets [0, testPct·100) → "test", the next valPct·100 → "val",
    * the rest → "train". Disjoint and exhaustive by construction.
    */
  def splitLabel(text: Column, salt: String = "graft",
      valPct: Int = 10, testPct: Int = 10): Column = {
    val b = hashBucket(text, salt)
    when(b < testPct * 100, "test")
      .when(b < (testPct + valPct) * 100, "val")
      .otherwise("train")
  }

  /** Data-mixing sample: per-source keep fractions over the same
    * content-hash bucket — the deterministic form of the "mixture
    * weights" step that upsamples high-quality sources and downsamples
    * bulk crawl. Same stability guarantees as [[hashSample]]: growing a
    * source's fraction keeps its previously-selected docs selected.
    */
  def mixtureSample(docs: DataFrame, fractions: Map[String, Double],
      defaultFraction: Double, salt: String = "graft",
      textCol: String = "text", sourceCol: String = "source"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction in [0,1]: $f"))
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * 10000).toInt)) {
      case (acc, (src, f)) =>
        when(col(sourceCol) === src, math.round(f * 10000).toInt).otherwise(acc)
    }
    docs.filter(hashBucket(col(textCol), salt) < threshold)
  }

  /** 60-bit content rank key: first 15 hex digits of the salted md5 as a
    * long — a content-stable total order (with an id tiebreak) for quota
    * selection, computable by any SQL engine for auditing.
    */
  def hashRank(text: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), text)), 1, 15), 16, 10).cast("long")

  /** Per-source quota cap: keep at most `maxPerSource` docs of each
    * source, selected by content-hash order (doc id breaks rank-key
    * ties) — the "at most N pages per domain" cap crawl pipelines apply
    * so one giant domain can't dominate the mix, deterministic rather
    * than first-crawled-wins.
    *
    * Scale shape: selection runs as a typed bounded smallest-k
    * `Aggregator` ([[graft.functions.MinKAggregator]]), so map-side
    * partials cap per-source shuffle bytes at k and a viral domain with
    * 10⁹ pages costs the same shuffle as one with 10³ — the
    * `row_number()` window twin (the q77 oracle) would funnel every row
    * of the hot source through one task. Winners rejoin the corpus by an
    * id equi-semi-join (winner count is |sources|·k — far past broadcast
    * range when sources are web domains).
    */
  def sourceCap(docs: DataFrame, maxPerSource: Int, salt: String = "graft",
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(maxPerSource > 0, s"maxPerSource must be positive: $maxPerSource")
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = graft.functions.MinKAggregator(maxPerSource).toColumn
    val winners = docs
      .select(col(sourceCol).as("src"),
        hashRank(col(textCol), salt).as("rk"),
        graft.util.Ids.longId(idCol).as("id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("kept"))
      .flatMap { case (_, kept) => kept.map(_._2) }
      .toDF("id")
    docs.join(winners, graft.util.Ids.longId(idCol) === winners("id"),
      "left_semi")
  }

  /** Corpus minus a blocklist, with Bloom-filter pre-pruning: a Bloom
    * filter built over the blocklist texts is broadcast and applied
    * map-side, so only the tiny might-match fraction reaches the exact
    * anti-join that removes Bloom false positives — rows the filter
    * clears never shuffle at all. Output is EXACTLY the plain anti-join
    * (the oracle keeps that formulation); the Bloom pass is purely a
    * physical optimization, the shape of Spark's own runtime filters.
    *
    * Spark's BloomFilter uses fixed hash seeds and order-independent
    * insertion (bitwise OR), so the filter — and the pruned plan — are
    * deterministic for a given blocklist.
    *
    * The corpus IS scanned twice (suspects branch + clean branch) — a
    * deliberate trade: at scale, two map-only pruned scans of columnar
    * storage beat one scan that shuffles the entire corpus through the
    * anti-join, which is what the single-plan formulation costs once the
    * blocklist outgrows the broadcast threshold.
    *
    * NOT lazy in the blocklist: the Bloom build (and, when auto-sizing,
    * the sizing count) runs at construction time. The blocklist is
    * persisted across the count, the build, and the verify anti-join,
    * and released after the caller's first action — an expensive
    * blocklist lineage executes once, not three times.
    */
  def blocklistFilter(docs: DataFrame, blocklist: DataFrame,
      textCol: String = "text", expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    // auto-sizing makes the operator EAGER in the blocklist (the count
    // and the bloomFilter build both run at construction time, before
    // any caller action); the blocklist would otherwise execute its
    // lineage three times — count, bloom build, verify anti-join — so
    // persist it across all three and release after the caller's first
    // action (skipped when the caller already persisted it).
    val shouldCache = expectedItems <= 0 &&
      blocklist.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val bl =
      if (shouldCache)
        blocklist.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else blocklist
    val bloom = sizedBloom(bl, textCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightMatch = udf((t: String) => t != null && bc.value.mightContain(t))
    val suspects = docs.filter(mightMatch(col(textCol)))
      .join(bl.select(col(textCol)).distinct(), Seq(textCol),
        "left_anti")
    val out = docs.filter(!mightMatch(col(textCol))).unionByName(suspects)
    if (shouldCache) graft.util.CacheRelease.afterFirstAction(out, Seq(bl))
    else out
  }

  /** Bloom filter sized to the blocklist: when the caller does not pass
    * `expectedItems` (<= 0), it is derived from `blocklist.count()` — one
    * cheap action on the SMALL side of the operator. A fixed default
    * would silently under-size the filter for a big blocklist (fpp → 1:
    * every corpus row becomes a "suspect" and the plan degrades to the
    * full anti-join PLUS the double scan, strictly worse than the plain
    * formulation).
    */
  private[operators] def sizedBloom(blocklist: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double) = {
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(blocklist.count(), 1L)
    blocklist.stat.bloomFilter(textCol, items, fpp)
  }

  /** Sequence packing: assign docs to fixed-token context bins by a
    * running token sum — bin = floor(tokens-before-this-doc / ctx), the
    * streaming first-fit a packer would apply reading docs in id order.
    * Emits one row per (source, shard, bin) with doc/token counts.
    *
    * Scale shape: the running sum is a window per (source, shard), and
    * `nShards` (content-hash derived, deterministic) bounds each window
    * partition to ~|source|/nShards docs — size nShards so a partition
    * fits a task; a per-source-only window would funnel a 100 TB
    * source's docs through one task.
    */
  def packBins(docs: DataFrame, ctxTokens: Int = 512, nShards: Int = 8,
      salt: String = "graft", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nTok = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val w = Window.partitionBy("source", "shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col("source"),
        (hashBucket(col(textCol), salt) % nShards).as("shard"),
        nTok.as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) /
          ctxTokens.toDouble).cast("long"))
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"))
  }

  /** Concat-then-split sequence packing: the GPT-style training layout
    * where a shard's token stream is concatenated in doc_id order and
    * cut into fixed `seqLen` windows, so documents may straddle two (or
    * more) sequences. Emits one row per (sequence, document) span with
    * the span's offset inside the sequence, the doc-relative position id
    * of its first token (what a reset-at-doc-boundary position encoding
    * needs to resume a straddling doc), and the span token count.
    *
    * Scale shape: identical to [[packBins]] — the only window is the
    * per-shard running sum keyed by the deterministic content-hash
    * shard, so parallelism is nShards and no global ordering exists
    * (size nShards to the cluster, not 8, at 100 TB). The explode
    * fan-out per doc is at most ceil(n_toks/seqLen)+1 spans — linear in
    * input tokens.
    */
  def packSequences(docs: DataFrame, seqLen: Int = 512, nShards: Int = 8,
      salt: String = "graft", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val nTok = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(seqLen.toLong)
    docs
      .select(col(idCol),
        (hashBucket(col(textCol), salt) % nShards).as("shard"),
        nTok.as("n_toks"))
      .withColumn("g_start", coalesce(sum("n_toks").over(w), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        floor(col("g_start") / L).cast("long"),
        floor((col("g_start") + col("n_toks") - lit(1L)) / L).cast("long"))))
      .select(col("shard"), col("seq_id"), col(idCol),
        (greatest(col("g_start"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_off"),
        (greatest(col("g_start"), col("seq_id") * L) - col("g_start"))
          .as("pos_start"),
        (least(col("g_start") + col("n_toks"), (col("seq_id") + 1) * L) -
          greatest(col("g_start"), col("seq_id") * L)).as("span_toks"))
  }

  // ------------------------------------------------------------- PII scrub

  /** Regexes shared by the operator and its SQL oracle. Deliberately
    * restricted to syntax with identical semantics in Java regex and
    * RE2-family engines (`\d`, `\b`, explicit classes, bounded
    * quantifiers — no lookaround, no \p{...} shorthands); order matters:
    * emails before phone-ish digit runs, IPs before phones, so a match
    * is never half-consumed by a later pattern.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+\\d[\\d().-]{7,}\\d" -> "<PHONE>")

  /** PII redaction (the C4/RefinedWeb-style scrub): emails, IPv4s and
    * international-format phone numbers replaced by typed placeholder
    * tokens, with per-kind match counts. Pure `regexp_replace`/
    * `regexp_count` Column chain — codegen'd, map-only, pushes nothing
    * to a UDF — so the 100 TB shape is a plain projected scan.
    *
    * Each kind is COUNTED on the text after the previous kinds were
    * replaced (not on the original), so the counts always reconcile
    * with the placeholders present in `redacted` — counting on the
    * original would report an <IP> inside an already-redacted email
    * (`a@1.2.3.4.com`) that the output provably does not contain.
    */
  def redactPii(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", keep: Seq[String] = Nil): DataFrame = {
    // stages(i) = text with patterns 0..i-1 replaced; stages.last = all
    val stages = PiiPatterns.scanLeft(col(textCol)) {
      case (c, (re, tag)) => regexp_replace(c, re, tag)
    }
    val counts = PiiPatterns.zip(stages.init).map { case ((re, tag), pre) =>
      regexp_count(pre, lit(re)).cast("long")
        .as(s"n_${tag.stripPrefix("<").stripSuffix(">").toLowerCase}")
    }
    // keep: passthrough columns (e.g. source/lang) so a pipeline caller
    // stays map-only instead of re-joining them on id afterwards
    docs.select(
      (col(idCol) +: keep.map(col)) ++ counts :+ stages.last.as("redacted"): _*)
  }

  /** Winsorization (percentile clipping) per group: values below the
    * `lo` quantile or above the `hi` quantile of their group are
    * clipped to those bounds — the standard outlier treatment before
    * training on heavy-tailed numeric features. Exact percentiles via
    * one partial-aggregated pass per group (groups are the unit of
    * clipping, so the percentile state is per-group, never global),
    * broadcast back and applied map-side with greatest/least.
    *
    * Rows whose group key is NULL form their own group (the join back
    * is null-safe, `<=>`), clipped to the NULL group's own percentiles
    * — never silently dropped. A group whose values are all NULL gets
    * NULL bounds and so a NULL winsorized value, like any NULL input.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad quantiles [$lo, $hi]")
    val bounds = df.groupBy(col(groupCol).as("__grp"))
      .agg(
        expr(s"percentile($valueCol, $lo)").as("__lo"),
        expr(s"percentile($valueCol, $hi)").as("__hi"))
    df.join(broadcast(bounds), col(groupCol) <=> col("__grp"))
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__grp", "__lo", "__hi")
  }

  /** Canonical form of an absolute URL, for URL-keyed dedup and
    * per-domain statistics (the CommonCrawl-pipeline staple: the same
    * page is fetched as `HTTP://Example.com:80/a/?utm_source=x#top` and
    * `http://example.com/a` and must dedup together):
    *
    *   - scheme and host lowercased (only them — paths are
    *     case-sensitive per RFC 3986);
    *   - default ports stripped (`:80` for http, `:443` for https);
    *   - fragment dropped;
    *   - `utm_*` tracking parameters dropped (with their separators
    *     repaired — a lone `?utm_only=1` disappears entirely);
    *   - trailing slashes stripped.
    *
    * Pure codegen'd Column chain (map-only; pushes through any plan).
    * Every regex avoids capture-group REPLACEMENTS, the one syntax
    * where Java regex (`$1`) and RE2 (`\1`) engines disagree — so the
    * identical patterns run in a DuckDB/Trino audit twin verbatim
    * (the q91 oracle does exactly that). Expects absolute URLs; a
    * schemeless string passes through with its first segment
    * host-lowered, deterministically.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val tail = regexp_replace(rest, "^[^/?#]*", "")
    val noFrag = regexp_replace(tail, "#.*", "")
    // utm_* stripping is anchored to a parameter boundary so a `utm_`
    // inside a path segment (`/utm_page?a=1`), a value (`?a=utm_x`), or
    // a suffixed name (`?xutm_a=1`) is never touched: first every
    // `&utm_...` param goes (global), which leaves at most one utm param
    // in FIRST position; `?utm_...&` then collapses to `?`, and a lone
    // `?utm_...` disappears. RE2 has no lookbehind, so boundary-keeping
    // fixed replacements (`?`) do the job lookbehind would — still zero
    // capture-group replacements, still verbatim-portable.
    val noUtmAmp = regexp_replace(noFrag, "&utm_[^&]*", "")
    val noUtmFirst = regexp_replace(noUtmAmp, "\\?utm_[^&]*&", "?")
    val noUtm = regexp_replace(noUtmFirst, "\\?utm_[^&]*$", "")
    val noSlash = regexp_replace(noUtm, "/+$", "")
    when(scheme === "", concat(host, noSlash))
      .otherwise(concat(scheme, lit("://"), host, noSlash))
  }

  /** Registrable domain from a URL — the per-site aggregation key for
    * crawl caps and domain statistics (RefinedWeb/C4 both cap or score
    * per registered domain, not per full host, so `a.blog.example.com`
    * and `b.blog.example.com` share a budget). Public-suffix-list-lite:
    * host = the [[normalizeUrl]] authority minus any port and a leading
    * `www.`, domain = its last two dot-labels (the two-label heuristic
    * trades the PSL's multi-label suffixes — `co.uk` — for a
    * dependency-free closed form; both engines replay it exactly, and
    * the cap-key CONSISTENCY, not TLD perfection, is what the operator
    * contracts). Bare hosts (no dot) pass through whole.
    */
  def registrableDomain(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    when(host.rlike("\\."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .otherwise(host)
  }

  /** Temperature-scaled mixture weights (the multilingual-sampling rule
    * from mBERT/mT5: sample source g with probability ∝ p_g^α, α < 1
    * up-weighting the tail): per group, its doc count, its sampling
    * weight in parts-per-million, and the docs-per-epoch an integer
    * `budget` buys it.
    *
    * Shape: ONE partial-aggregated count by group (|groups| rows —
    * sources/languages, not documents), then a broadcast-sized
    * normalization. The weights are exact integers cross-engine: since
    * p_g^α / Σp^α == c_g^α / Σc^α, each group's score is
    * `floor(sqrt(c_g)·1e6)` — `sqrt` and the multiply are both
    * correctly-rounded IEEE ops, so every engine computes the identical
    * BIGINT — and the normalizer is an integer sum (order-free), making
    * `weight_ppm` reproducible anywhere, unlike a float normalization
    * whose summation order is engine-private. α is fixed at 1/2 for
    * that reason: general `pow` carries no correct-rounding guarantee
    * (Java's Math.pow(x, 0.5) may differ from sqrt(x) in the last ulp),
    * so a generic-α variant could not be audited by an external engine.
    * The 1e6 fixed-point keeps `1000000·score` inside BIGINT up to
    * ~8e13 docs per group; weight resolution (~1e-6 relative) is far
    * below the ppm output granularity.
    */
  def temperatureWeights(docs: DataFrame, budget: Long = 10000L,
      groupCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("score",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e6)).cast("long"))
    val totals = counts.agg(sum(col("score")).as("total_score"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col(groupCol),
        col("n_docs"),
        expr("(1000000 * score) DIV total_score").as("weight_ppm"))
      .withColumn("target_docs", expr(s"($budget * weight_ppm) DIV 1000000"))
  }

  /** Deterministic stratified sample: the `n` smallest id-hash-ranked
    * rows of EVERY stratum (exact per-stratum sample sizes — the
    * eval-set / per-language quota construction `sample()` can't give).
    * The rank key is the first 15 hex digits of `md5(id)` as an integer
    * (60 bits — any SQL engine can audit the selection), so membership
    * is stable under corpus growth and re-partitioning, like every
    * sampler here.
    *
    * 100 TB shape: a `row_number` window would funnel each stratum
    * through one task (a hot language = one straggler). Instead the
    * k-bounded [[graft.functions.MinKAggregator]] rides a regular
    * partial aggregation: every map task keeps at most `n` (rank, id)
    * pairs per stratum, so shuffle bytes are `strata x n`, independent
    * of corpus size.
    */
  def stratifiedSample(docs: DataFrame, n: Int, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(strataCol).as("stratum"),
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long").as("rk"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.MinKAggregator(n).toColumn.name("mink"))
      .flatMap { case (stratum, picked) =>
        picked.iterator.zipWithIndex.map { case ((_, id), i) =>
          (stratum, id, (i + 1).toLong)
        }
      }
      .toDF(strataCol, idCol, "rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    * per group, keep the `k` items with the largest key u^(1/w), where
    * u is a deterministic LCG variate of the item id and w the item's
    * weight — heavier items survive proportionally more often, and the
    * whole draw is reproducible AND engine-portable (integer LCG +
    * `pow`, both expressible in ANSI SQL), so the DuckDB oracle replays
    * the identical draw (q122). State per group is bounded at `k` by
    * [[graft.functions.TopKAggregator]] — no window: a billion-row
    * group ships at most `k` pairs per map task.
    */
  def weightedSample(docs: DataFrame, k: Int, groupCol: String = "lang",
      weightCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val u = ((col(idCol).cast("long") * lit(48271L) + lit(11L)) %
      lit(2147483647L)).cast("double") / lit(2147483647.0)
    // zero/negative weight -> key 0 (the u^(1/w) limit as w -> 0+ for
    // u < 1): an empty document is the least-likely draw, not an ANSI
    // DIVIDE_BY_ZERO task failure (round-14 fuzz, empty fuzz docs).
    // The q122 oracle mirrors with the same CASE.
    val w = col(weightCol).cast("double")
    val key = when(w > 0d, pow(u, lit(1.0) / w)).otherwise(lit(0.0))
    docs
      .select(col(groupCol).as("grp"), col(idCol).cast("long").as("id"),
        key.as("key"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.TopKAggregator(k).toColumn.name("kept"))
      .flatMap { case (grp, kept) =>
        kept.iterator.zipWithIndex.map { case ((id, _), i) =>
          (grp, id, (i + 1).toLong)
        }
      }
      .toDF(groupCol, idCol, "rank")
  }

  /** Per-group adaptive quality threshold: keep rows whose `valueCol` is
    * at or above the group's `q`-quantile (exact, linear interpolation —
    * Spark `percentile` == DuckDB `quantile_cont`). The per-language
    * "keep the top X% by quality" curation rule, with the threshold
    * derived from each group's own distribution instead of one global
    * constant that over-prunes low-resource languages.
    *
    * 100 TB shape: a `percent_rank` window would sort every group's
    * rows through that group's partitions (skew-prone when one language
    * dominates). This is instead a partial-agg'd percentile per group
    * plus a BROADCAST join of |groups| threshold rows back onto the
    * corpus — map-only after one bounded agg. NULL group keys pass
    * through UNKEPT (no bounds row can match them) by explicit filter,
    * not by silent join-drop (the winsorize ADVICE lesson).
    */
  def quantileKeep(df: DataFrame, valueCol: String, groupCol: String,
      q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1): $q")
    val thr = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $q)").as("thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(valueCol) >= col("thr"))
  }

  /** Nucleus (top-p) source truncation: rank sources by total weight and
    * keep the smallest prefix whose cumulative weight covers at least
    * `p` permille of the total — head-truncation of a domain/source
    * distribution (drop the long tail of scraped domains that together
    * contribute <(1-p) of the tokens). Entirely integer arithmetic
    * (permille threshold with ceil division), so any SQL engine replays
    * the identical cut.
    *
    * 100 TB shape: the window runs over the AGGREGATED per-source rows
    * — |sources| is bounded by contract (domains, registries), the
    * corpus itself is touched by one partial-agg'd groupBy only.
    */
  def topPSources(docs: DataFrame, pPermille: Int,
      groupCol: String = "source", weightCol: String = "n_chars"): DataFrame = {
    require(pPermille > 0 && pPermille <= 1000,
      s"pPermille must be in (0,1000]: $pPermille")
    val w = Window.orderBy(col("weight").desc, col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val weights = docs.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("long").as("weight"))
    val total = weights.agg(sum(col("weight")).cast("long").as("total"))
    weights
      .crossJoin(broadcast(total))
      .withColumn("cum_weight", sum(col("weight")).over(w).cast("long"))
      // keep while the PREVIOUS cumulative weight is still short of
      // ceil(p/1000 * total): the source that crosses the line is kept,
      // everything after it is cut
      .filter(col("cum_weight") - col("weight") <
        expr(s"(total * $pPermille + 999) DIV 1000"))
      .select(col(groupCol), col("weight"), col("cum_weight"))
  }
}
