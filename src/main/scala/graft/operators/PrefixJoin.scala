package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ids

/** Longest-prefix-match join — the rule-matching primitive behind
  * robots.txt path rules, URL-pattern blocklists and route tables,
  * which Spark has no native operator for. The naive formulations are
  * both scale-killers: `item.path LIKE rule.prefix || '%'` plans a
  * BroadcastNestedLoopJoin (every item × every rule), and a driver-side
  * trie doesn't distribute.
  *
  * The scalable shape: fan each path out into its '/'-boundary prefix
  * set — BOUNDED by the path's segment depth (a dozen rows, not a
  * corpus factor) — and equi-join rules on the exact prefix, then keep
  * the longest match per item with one partial-aggregated `max_by`.
  * Every step is shuffle-by-key relational: the rule table can be any
  * size (broadcast or shuffled as the optimizer chooses), a hot rule
  * ("/index.html" matching a billion pages) partial-aggregates map-side
  * because `max_by` is a decomposable aggregate, and no window or
  * nested loop appears at any scale.
  *
  * Boundary semantics: a rule `/a/b` matches `/a/b` and `/a/b/c` but
  * NOT `/a/bc` — prefixes are generated at segment boundaries only,
  * which is exactly the match robots.txt-style path rules intend.
  * Ties are impossible (two distinct matching prefixes of one path
  * differ in segment count, hence in length).
  */
object PrefixJoin {

  /** Match each item's `pathCol` against `rules(ruleCol)`; output one
    * row per item: `(doc_id, path, matched_prefix, match_len)` with
    * `('' , 0)` for unmatched items. Rules must be non-empty strings
    * (an empty rule would match everything; fail loudly instead).
    */
  def longestPrefixMatch(items: DataFrame, rules: DataFrame,
      pathCol: String = "path", idCol: String = "doc_id",
      ruleCol: String = "prefix"): DataFrame = {
    val badRules = rules.filter(col(ruleCol).isNull || col(ruleCol) === "")
      .limit(1).count()
    require(badRules == 0, "empty or null rule prefix would match everything")

    val parts = items.select(
      Ids.longId(idCol).as("id"), col(pathCol).as("path"),
      split(col(pathCol), "/").as("seg"))
    // '/'-boundary prefixes: for /a/b/c (seg = ['', a, b, c]) emit
    // /a, /a/b, /a/b/c — join-ready exact keys, depth-bounded fan-out.
    // Slashless paths (size(seg)=1, e.g. '' or 'abc') have NO boundary
    // prefixes: guard before the sequence, which would otherwise
    // descend [2,1] and fabricate a whole-path row the empty-range
    // oracle semantics (range(2, len+1)) never emit.
    val prefixes = parts.filter(size(col("seg")) >= 2)
      .select(col("id"), col("path"),
      explode(expr(
        "transform(sequence(2, size(seg)), i -> array_join(slice(seg, 1, i), '/'))"))
        .as("prefix"))
    val matched = prefixes
      .join(rules.select(col(ruleCol).as("prefix")), Seq("prefix"))
      .groupBy("id")
      .agg(max_by(col("prefix"), length(col("prefix"))).as("matched_prefix"))
    items.select(Ids.longId(idCol).as("id"), col(pathCol).as("path"))
      .join(matched, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("path"),
        coalesce(col("matched_prefix"), lit("")).as("matched_prefix"),
        coalesce(length(col("matched_prefix")), lit(0))
          .cast("long").as("match_len"))
  }
}
