package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance self-join (record linkage / fuzzy dedup) via the
  * deletion-neighborhood blocking of SymSpell (Garbe 2012) — itself the
  * FastSS scheme of Bocek et al. 2007, "Fast Similarity Search in Large
  * Dictionaries".
  *
  * The exactness guarantee is the FastSS theorem: if
  * `levenshtein(s, t) <= k` then deleting at most `k` characters from
  * each of `s` and `t` can reach a COMMON string (walk the alignment:
  * a substitution deletes one char on both sides, an insertion deletes
  * from `t`, a deletion deletes from `s`). So every true pair shares at
  * least one deletion-variant key, and an equi-join on those keys
  * followed by an exact `levenshtein` verify returns EXACTLY the pairs
  * within distance `k` — blocking changes the cost, never the answer.
  * (The reference's own near-dup stages use the same candidates-then-
  * verify shape; see `operators/Dedup.scala` for the Jaccard variant.)
  *
  * 100 TB shape: each string emits `O(C(L, k))` keys (`L` = string
  * length — 19 keys for the fixture's 18-char names at k=1), so the key
  * table is linear in the input and the join is bucket-local — there is
  * no N² stage anywhere. Bucket sizes are bounded by how many strings
  * collapse onto one variant (alphabet x positions, not corpus size);
  * a pathological hot key is AQE-splittable since both sides carry only
  * `(key, id, string)`. The N² formulation survives only in the DuckDB
  * oracle, which grades the result at sf0.01.
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting at most `k` characters,
    * deduplicated (includes `s` itself — the 0-deletion variant).
    */
  private[operators] def deletionVariants(s: String, k: Int): Set[String] = {
    var frontier = Set(s)
    var all = frontier
    var round = 0
    while (round < k) {
      frontier = frontier.flatMap { v =>
        (0 until v.length).iterator
          .map(i => v.substring(0, i) + v.substring(i + 1)).toSet
      }
      all = all ++ frontier
      round += 1
    }
    all
  }

  /** All `(id1, id2, dist)` pairs with `levenshtein <= maxDist`,
    * `id1 < id2`, over `df(idCol, strCol)`. Exact (see object doc).
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val spark = df.sparkSession
    import spark.implicits._

    val keyed = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        deletionVariants(if (s == null) "" else s, maxDist)
          .iterator.map(v => (v, id, s))
      }
      .toDF("key", "id", "s")

    keyed.as("a")
      .join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("a.s").as("s1"),
        col("b.id").as("id2"), col("b.s").as("s2"))
      // a true pair shares several variant keys — dedup BEFORE the
      // verify so each candidate pays one levenshtein, not one per key
      .distinct()
      .filter(levenshtein(col("s1"), col("s2")) <= maxDist)
      .select(col("id1"), col("id2"),
        levenshtein(col("s1"), col("s2")).cast("long").as("dist"))
  }
}
