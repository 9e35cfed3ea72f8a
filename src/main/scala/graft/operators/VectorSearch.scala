package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per SURVEY's north star:
  *   - brute-force cosine top-k: exact baseline — a broadcast join of the
  *     (small) query set against the corpus, dot products via codegen'd
  *     higher-order functions (`zip_with`/`aggregate`), ranked per query
  *     with a window. One pass over the corpus, no shuffle of the corpus
  *     itself: at 100 TB the scan dominates and parallelizes linearly;
  *   - LSH-bucketed (random hyperplane / SRP): probe only the corpus rows
  *     whose signature matches the query bucket — signature is map-only,
  *     the probe is an equi-join on the bucket key.
  */
object VectorSearch {

  /** sum(a[i]*b[i]) as a column expression. NOTE: Spark's higher-order
    * functions are interpreted, not whole-stage codegen'd — use
    * [[cosineArrays]] inside typed maps on hot paths.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Primitive-array cosine with the SAME IEEE semantics as the Column
    * formulation (per-element float→double widening, left-to-right
    * accumulation, dot/(sqrt·sqrt)) — bit-identical results on equal-
    * length non-degenerate vectors. Ragged lengths and zero norms yield
    * NaN (the Column path yields NULL there); callers drop those rows
    * via [[finiteRoundedCosine]].
    */
  def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    if (a == null || b == null || a.length != b.length) return Double.NaN
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  /** `round(x, 6)` with HALF_UP on the double's exact decimal value —
    * the ONE rounding convention every cross-engine score in the vector
    * family uses (DuckDB's `round(x, 6)` matches it), so rankings over
    * rounded scores compare identically across engines.
    */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Cosine rounded like `round(col, 6)` (HALF_UP on the double's decimal
    * value); None for degenerate inputs (zero-norm, ragged, null) —
    * mirroring the Column path, where the NULL result dropped the row.
    */
  def finiteRoundedCosine(a: Array[Float], b: Array[Float]): Option[Double] = {
    val c = cosineArrays(a, b)
    if (java.lang.Double.isFinite(c)) Some(round6(c)) else None
  }

  /** Total order for top-k ranking: higher score first, lower id breaks
    * ties — a deterministic total order, so two-phase selection is exactly
    * equivalent to a global sort.
    */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Exact distributed top-k per query over (query_id, neighbor_id, score)
    * rows, in two bounded phases: a per-partition k-sized heap per query
    * (map-side, no shuffle of the corpus), then a final per-query merge of
    * the ≤ k·numPartitions survivors. Replaces the naive
    * `Window.partitionBy(query_id)` plan, which funnels every scored
    * corpus row for a query through a single task — a full-corpus
    * single-reducer at 100 TB.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // heap head = current worst of the kept k, so push/pop is O(log k)
    val worstFirst: Ordering[(Long, Double)] =
      Ordering.fromLessThan((a, b) => better(a, b))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Long, Double)]
      .mapPartitions { rows =>
        val heaps = mutable.HashMap.empty[Long, mutable.PriorityQueue[(Long, Double)]]
        rows.foreach { case (q, id, s) =>
          val h = heaps.getOrElseUpdate(q,
            mutable.PriorityQueue.empty[(Long, Double)](worstFirst))
          if (h.size < k) h.enqueue((id, s))
          else if (better((id, s), h.head)) { h.dequeue(); h.enqueue((id, s)) }
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (id, s) => (q, id, s) }
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        it.map { case (_, id, s) => (id, s) }
          .toArray
          .sortWith(better)
          .take(k)
          .iterator
          .zipWithIndex
          .map { case ((id, s), i) => (q, id, s, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** All (query_id, neighbor_id, cos_sim) scores for a broadcast query
    * set: one broadcast of the queries, one pass over the corpus, scores
    * rounded to 6 dp (see [[finiteRoundedCosine]]). The shared scoring
    * stage of [[cosineTopK]] and the `TopKAggregator` UDAF query surface.
    */
  def cosineScores(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val queries = embeddings
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    embeddings
      .join(broadcast(queries), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col(vecCol), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .flatMap { case (q, n, v, qv) =>
        finiteRoundedCosine(v, qv).map(c => (q, n, c)) }
      .toDF("query_id", "neighbor_id", "cos_sim")
  }

  /** Exact top-k neighbours by cosine for each query id. Scores rounded
    * to 6 dp before ranking so rank order is reproducible across engines
    * (ties broken by vec_id). One broadcast of the query set, one pass
    * over the corpus, bounded two-phase top-k — no global window.
    */
  def cosineTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    topKPerQuery(cosineScores(embeddings, queryIds, idCol, vecCol), k)

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-cosine-similar corpus vectors with a DIFFERENT label —
    * the negatives closest to the decision boundary, which contrastive
    * and reranker training sample preferentially. Same broadcast
    * query-set + bounded two-phase top-k shape as [[cosineTopK]]; the
    * label inequality rides the broadcast join condition, so same-label
    * vectors (including the query itself) are never scored.
    */
  def hardNegatives(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val queries = embeddings
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        col(labelCol).as("qlabel"))
    val scored = embeddings
      .join(broadcast(queries), col(labelCol) =!= col("qlabel"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col(vecCol), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .flatMap { case (q, n, v, qv) =>
        finiteRoundedCosine(v, qv).map(c => (q, n, c)) }
      .toDF("query_id", "neighbor_id", "cos_sim")
    topKPerQuery(scored, k)
  }

  /** Deterministic random hyperplanes for signed-random-projection LSH. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** SRP signature of one vector for one hyperplane table: bit i = sign of
    * dot(vec, planes(i)), packed into a long (nBits <= 63). Primitive-loop
    * twin of the Column formulation
    * `when(dot(vec, planeCol) >= 0, 1L << i)` summed over planes — same
    * IEEE accumulation order (float→double widening, left-to-right), so
    * buckets are bit-identical; a null or plane-length-mismatched vector
    * sets no bits, mirroring null-propagation through the HOF dot. Spark's
    * higher-order functions are interpreted per element (~20x slower than
    * this loop, see [[dot]]'s note), and the signature pass touches every
    * corpus row × every plane — it must stay in a typed map.
    */
  def srpSignatureArray(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    if (vec == null) return 0L
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      if (vec.length == p.length) {
        var d = 0.0
        var j = 0
        while (j < p.length) { d += vec(j).toDouble * p(j); j += 1 }
        // NaN sets the bit: Spark SQL orders NaN above all doubles, so
        // the Column twin's `when(dot >= 0, ...)` is TRUE for NaN —
        // JVM `>=` alone would silently flip such rows' buckets
        if (d >= 0 || java.lang.Double.isNaN(d)) sig |= (1L << i)
      }
      i += 1
    }
    sig
  }

  /** Approximate top-k: rank only within the query's SRP bucket(s),
    * unioned over `tables` independent hyperplane tables (candidates
    * dedup'd on ids BEFORE the vectors join back, so extra tables never
    * shuffle the vectors twice — the [[graft.operators.Dedup.embeddingPairsLsh]]
    * shape). Per true neighbor at cosine c the hit probability is
    * 1-(1-p^nBits)^tables with p = 1-arccos(c)/π: more tables buy
    * recall, more bits buy selectivity. `tables = 1` reproduces the
    * classic single-table variant bit-identically. Falls back to fewer
    * than k results when the probed buckets are small — the standard
    * recall/cost trade.
    */
  def srpTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      nBits: Int = 8,
      dim: Int = 64,
      tables: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val allPlanes = Array.tabulate(tables)(t =>
      hyperplanes(nBits, dim, seed = 0x9e3779b9L + t))
    val vecs = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val signed = vecs
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, allPlanes.map(p => srpSignatureArray(v, p)).toSeq)
      }
      .toDF("id", "sigs")
      .select(col("id"), posexplode(col("sigs")).as(Seq("table", "bucket")))
    val queries = signed
      .filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("table"), col("bucket"))
    val cands = signed
      .join(broadcast(queries), Seq("table", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id")
      .distinct()
    val qvecs = vecs
      .filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val scored = cands
      .join(vecs, "id")
      .join(broadcast(qvecs), "query_id")
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("vec"), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .flatMap { case (q, n, v, qv) =>
        finiteRoundedCosine(v, qv).map(c => (q, n, c)) }
      .toDF("query_id", "neighbor_id", "cos_sim")
    topKPerQuery(scored, k)
  }
}
