package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the
  * coarse-quantizer scale path for embedding search: partition the corpus
  * into `nList` Voronoi cells around k-means centroids, then probe only
  * the `nProbe` cells nearest to each query.
  *
  * Scale shape: centroids are tiny (nList × dim doubles) and live on the
  * driver / in a broadcast; cell assignment is one map-only pass over the
  * corpus (typed mapPartitions, no shuffle); the probe is an equi-join on
  * the cell id against the broadcast query set; ranking reuses the
  * bounded two-phase top-k. Training iterates Lloyd steps distributedly
  * (aggregate per cell) with deterministic lowest-id initialization — no
  * RNG, so plans and results are reproducible across runs and retries.
  */
object Ivf {

  private def sqDist(a: Array[Float], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** The nProbe nearest cell ids — shared with [[Pq.ivfPqTopK]]. */
  private[operators] def probeCells(v: Array[Float],
      cents: Array[Array[Double]], nProbe: Int): Seq[Int] =
    probes(v, cents, nProbe)

  /** Nearest-centroid cell id — shared with [[Dedup.embeddingPairsKmeans]]. */
  private[operators] def nearestCell(v: Array[Float],
      cents: Array[Array[Double]]): Int = nearest(v, cents)

  private def nearest(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = sqDist(v, cents(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** `nProbe` nearest cell ids for a vector, by ascending distance. */
  private def probes(v: Array[Float], cents: Array[Array[Double]],
      nProbe: Int): Seq[Int] =
    cents.indices
      .map(i => (i, sqDist(v, cents(i))))
      .sortBy { case (i, d) => (d, i) }
      .take(nProbe)
      .map(_._1)

  /** Deterministic k-means: initialize from the `nList` lowest-id vectors,
    * then `iters` Lloyd rounds, each one distributed aggregate per cell.
    * Empty cells keep their previous centroid.
    */
  def trainCentroids(
      embeddings: DataFrame,
      nList: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]

    var cents = vecs.orderBy(col(idCol)).take(nList)
      .map(_._2.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val sums = vecs
        .map { case (_, v) => (nearest(v, bc.value), (v.map(_.toDouble), 1L)) }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
          val s = new Array[Double](a._1.length)
          var i = 0
          while (i < s.length) { s(i) = a._1(i) + b._1(i); i += 1 }
          (s, a._2 + b._2)
        }
        .collect()
        .toMap
      cents = cents.indices.map { c =>
        sums.get(c) match {
          case Some((s, n)) => s.map(_ / n)
          case None => cents(c)
        }
      }.toArray
      bc.unpersist()
      it += 1
    }
    cents
  }

  /** Approximate cosine top-k: rank only corpus rows in the query's
    * `nProbe` nearest cells. Same output schema as
    * [[VectorSearch.cosineTopK]]; recall rises with nProbe (== nList
    * recovers the exact search).
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 5,
      nList: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfTopKFrom(embeddings,
      trainCentroids(embeddings, nList, iters, idCol, vecCol),
      queryIds, k, nProbe, idCol, vecCol)

  /** The apply half of [[ivfTopK]] against a PRE-TRAINED centroid table
    * — the production shape (a quantizer is a versioned artifact applied
    * to new data, not retrained per query) and what makes the search
    * DuckDB-oracle-expressible when the centroids are the frozen
    * committed [[FrozenCentroids.coarse16]].
    */
  def ivfTopKFrom(
      embeddings: DataFrame,
      cents: Array[Array[Double]],
      queryIds: Seq[Long],
      k: Int = 5,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)

    val corpus = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearest(v, bc.value)) }
      .toDF("id", "vec", "cell")

    val queries = embeddings
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        probes(qv, bc.value, nProbe).map(c => (qid, qv, c))
      }
      .toDF("query_id", "qvec", "cell")

    val scored = corpus
      .join(broadcast(queries), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("vec"), col("qvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .flatMap { case (q, n, v, qv) =>
        VectorSearch.finiteRoundedCosine(v, qv).map(c => (q, n, c)) }
      .toDF("query_id", "neighbor_id", "cos_sim")
    VectorSearch.topKPerQuery(scored, k)
  }
}
