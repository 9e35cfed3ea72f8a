package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ / ADC) approximate nearest neighbour — the
  * memory-compression scale path for embedding search (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
  * split each d-dim vector into `m` contiguous subvectors, k-means each
  * subspace into `ksub` codes, and store every corpus vector as its `m`
  * code ids — a 64-dim float32 embedding becomes 8 small ints (32×
  * compression), and query scoring never touches the raw vectors again.
  *
  * Scoring is asymmetric distance computation (ADC): per query, ONE
  * `m × ksub` table of subspace dot products (and one of centroid
  * norms) is precomputed from the raw query vector; each candidate then
  * costs `m` table lookups instead of `d` multiplies. Because the
  * subspaces are disjoint coordinate slices, the reconstruction
  * decomposes exactly: dot(q, x̂) = Σⱼ dot(qⱼ, centⱼ[codeⱼ]) and
  * |x̂|² = Σⱼ |centⱼ[codeⱼ]|², so the ADC cosine is the TRUE cosine of
  * the reconstruction — the only approximation is quantization.
  *
  * Scale shape: codebooks are tiny (m·ksub·(d/m) doubles) and train in
  * one distributed Lloyd loop over ALL subspaces at once (keyed
  * (subspace, cell) — not m separate jobs); only the per-cell sums are
  * collected (bounded by m·ksub, same contract as
  * [[Ivf.trainCentroids]]). Encoding is map-only; scoring is a
  * broadcast of the (tiny) per-query tables against the (narrow) code
  * table; ranking reuses the bounded two-phase top-k. Deterministic
  * lowest-id initialization — no RNG anywhere.
  */
object Pq {

  /** cents(j)(c) = centroid c of subspace j (dsub doubles each). */
  final case class Codebooks(m: Int, dsub: Int,
      cents: Array[Array[Array[Double]]])

  private def sqDistSub(s: Array[Float], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < s.length) { val t = s(i) - c(i); d += t * t; i += 1 }
    d
  }

  private def nearestSub(s: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = sqDistSub(s, cents(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  private def slices(v: Array[Float], m: Int, dsub: Int): Array[Array[Float]] =
    Array.tabulate(m)(j => v.slice(j * dsub, (j + 1) * dsub))

  /** Deterministic per-subspace k-means, all subspaces in one Lloyd
    * loop: assignment is a flatMap emitting ((subspace, cell), slice),
    * aggregation one distributed reduceGroups — m·ksub cells total come
    * back to the driver, never vectors. Initialized from the `ksub`
    * lowest-id vectors' slices. Empty cells keep their centroid.
    */
  def trainCodebooks(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): Codebooks = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val dim = vecs.head()._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m

    var cents: Array[Array[Array[Double]]] = {
      val seed = vecs.orderBy(col(idCol)).take(ksub).map(_._2)
      Array.tabulate(m)(j =>
        seed.map(v => v.slice(j * dsub, (j + 1) * dsub).map(_.toDouble)))
    }
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val sums = vecs
        .flatMap { case (_, v) =>
          val sl = slices(v, m, dsub)
          (0 until m).iterator.map { j =>
            ((j, nearestSub(sl(j), bc.value(j))), (sl(j).map(_.toDouble), 1L))
          }
        }
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
      cents = Array.tabulate(m)(j =>
        cents(j).indices.map { c =>
          sums.get((j, c)) match {
            case Some((s, n)) => s.map(_ / n)
            case None => cents(j)(c)
          }
        }.toArray)
      bc.unpersist()
      it += 1
    }
    Codebooks(m, dsub, cents)
  }

  /** (id, codes) — each vector quantized to its m nearest-subcentroid
    * ids. Map-only; this narrow table is what a production index
    * persists (plus the codebooks) instead of the raw vectors.
    */
  def encode(embeddings: DataFrame, cb: Codebooks,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val c = bc.value
        val sl = slices(v, c.m, c.dsub)
        (id, Array.tabulate(c.m)(j => nearestSub(sl(j), c.cents(j))))
      }
      .toDF("id", "codes")
  }

  /** ADC approximate cosine top-k: quantize the corpus, precompute each
    * query's subspace dot/norm tables, score every (query, code) pair
    * with m lookups, keep the bounded two-phase top-k.
    *
    * With `rerank = 0` the result is pure ADC and the score column is
    * named `adc_cos` — the exact cosine of the RECONSTRUCTION, not of
    * the original vector, labelled as such. With `rerank = r > k` (the
    * production configuration, per the PQ paper's IVFADC-R variant) the
    * ADC pass keeps an r-sized shortlist per query and only those
    * ≤ Q·r rows re-join the raw vectors for an exact cosine top-k
    * (score column `cos_sim`): quantization then only has to put true
    * neighbours somewhere in the shortlist, not rank them — recall
    * rises steeply with r while the corpus-wide scan still never
    * touches a raw vector. The shortlist re-join is a broadcast
    * (shortlist side) hash join — map-only over the corpus.
    */
  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 5,
      m: Int = 8, ksub: Int = 16, iters: Int = 3, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqTopKFrom(embeddings,
      trainCodebooks(embeddings, m, ksub, iters, idCol, vecCol),
      queryIds, k, rerank, idCol, vecCol)

  /** The apply half of [[pqTopK]] against PRE-TRAINED codebooks — the
    * production shape (codebooks ship as a versioned artifact) and what
    * makes the ADC search DuckDB-oracle-expressible when they are the
    * frozen committed [[FrozenCentroids.pqCodebooks]].
    */
  def pqTopKFrom(embeddings: DataFrame, cb: Codebooks,
      queryIds: Seq[Long], k: Int = 5, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val codes = encode(embeddings, cb, idCol, vecCol)

    // per-query ADC tables: dotTab(j)(c) = dot(q_j, cent_j[c]),
    // normTab(j)(c) = |cent_j[c]|² — m·ksub doubles per query
    val qtabs = embeddings
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("query_id"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (qid, qv) =>
        val c = bc.value
        val sl = slices(qv, c.m, c.dsub)
        val dotTab = Array.tabulate(c.m)(j => c.cents(j).map { cent =>
          var s = 0.0
          var i = 0
          while (i < cent.length) { s += sl(j)(i) * cent(i); i += 1 }
          s
        })
        val normTab = Array.tabulate(c.m)(j => c.cents(j).map { cent =>
          var s = 0.0
          var i = 0
          while (i < cent.length) { s += cent(i) * cent(i); i += 1 }
          s
        })
        var qn = 0.0
        qv.foreach(x => qn += x.toDouble * x)
        (qid, dotTab, normTab, math.sqrt(qn))
      }
      .toDF("query_id", "dot_tab", "norm_tab", "qnorm")

    val scored = codes
      .crossJoin(broadcast(qtabs))
      .filter(col("id") =!= col("query_id"))
      .as[(Long, Array[Int], Long, Array[Array[Double]], Array[Array[Double]], Double)]
      .flatMap { case (id, code, qid, dotTab, normTab, qnorm) =>
        var dot = 0.0
        var xn2 = 0.0
        var j = 0
        while (j < code.length) {
          dot += dotTab(j)(code(j))
          xn2 += normTab(j)(code(j))
          j += 1
        }
        val denom = qnorm * math.sqrt(xn2)
        val cosv = if (denom == 0.0) Double.NaN else dot / denom
        if (java.lang.Double.isFinite(cosv))
          Iterator.single((qid, id, VectorSearch.round6(cosv)))
        else Iterator.empty
      }
      .toDF("query_id", "neighbor_id", "cos_sim")
    finishTopK(embeddings, scored, queryIds, k, rerank, idCol, vecCol)
  }

  /** IVF-PQ (the paper's IVFADC, the FAISS production layout): a coarse
    * IVF quantizer restricts each query to its `nProbe` nearest cells,
    * and PQ/ADC scores only the codes INSIDE those cells — the corpus
    * pass is an equi-join on cell id instead of a full scan, and the
    * scan that remains touches m-byte codes, not vectors. Compose with
    * `rerank` for the IVFADC-R configuration. Both quantizers train
    * deterministically (lowest-id init, no RNG).
    */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 5,
      nList: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      iters: Int = 3, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfPqTopKFrom(embeddings,
      Ivf.trainCentroids(embeddings, nList, iters, idCol, vecCol),
      trainCodebooks(embeddings, m, ksub, iters, idCol, vecCol),
      queryIds, k, nProbe, rerank, idCol, vecCol)

  /** The apply half of [[ivfPqTopK]] against PRE-TRAINED coarse
    * centroids + codebooks (see [[pqTopKFrom]]). */
  def ivfPqTopKFrom(embeddings: DataFrame, coarse: Array[Array[Double]],
      cb: Codebooks, queryIds: Seq[Long], k: Int = 5, nProbe: Int = 4,
      rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcCb = spark.sparkContext.broadcast(cb)

    // corpus: (cell, id, codes) — one map-only pass assigns + encodes
    val codes = embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val c = bcCb.value
        val sl = slices(v, c.m, c.dsub)
        (Ivf.nearestCell(v, bcCoarse.value), id,
          Array.tabulate(c.m)(j => nearestSub(sl(j), c.cents(j))))
      }
      .toDF("cell", "id", "codes")

    // queries fan out to their probed cells with their ADC tables
    val qtabs = embeddings
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("query_id"), col(vecCol))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        val c = bcCb.value
        val sl = slices(qv, c.m, c.dsub)
        val dotTab = Array.tabulate(c.m)(j => c.cents(j).map { cent =>
          var s = 0.0
          var i = 0
          while (i < cent.length) { s += sl(j)(i) * cent(i); i += 1 }
          s
        })
        val normTab = Array.tabulate(c.m)(j => c.cents(j).map { cent =>
          var s = 0.0
          var i = 0
          while (i < cent.length) { s += cent(i) * cent(i); i += 1 }
          s
        })
        var qn = 0.0
        qv.foreach(x => qn += x.toDouble * x)
        Ivf.probeCells(qv, bcCoarse.value, nProbe).iterator
          .map(cell => (cell, qid, dotTab, normTab, math.sqrt(qn)))
      }
      .toDF("cell", "query_id", "dot_tab", "norm_tab", "qnorm")

    val scored = codes
      .join(broadcast(qtabs), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("id"), col("codes"), col("query_id"),
        col("dot_tab"), col("norm_tab"), col("qnorm"))
      .as[(Long, Array[Int], Long, Array[Array[Double]], Array[Array[Double]], Double)]
      .flatMap { case (id, code, qid, dotTab, normTab, qnorm) =>
        var dot = 0.0
        var xn2 = 0.0
        var j = 0
        while (j < code.length) {
          dot += dotTab(j)(code(j))
          xn2 += normTab(j)(code(j))
          j += 1
        }
        val denom = qnorm * math.sqrt(xn2)
        val cosv = if (denom == 0.0) Double.NaN else dot / denom
        if (java.lang.Double.isFinite(cosv))
          Iterator.single((qid, id, VectorSearch.round6(cosv)))
        else Iterator.empty
      }
      .toDF("query_id", "neighbor_id", "cos_sim")
    finishTopK(embeddings, scored, queryIds, k, rerank, idCol, vecCol)
  }

  /** Shared tail of the PQ searches: pure-ADC top-k (score column
    * renamed `adc_cos`) or the r-shortlist exact re-rank.
    */
  private def finishTopK(embeddings: DataFrame, scored: DataFrame,
      queryIds: Seq[Long], k: Int, rerank: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    if (rerank <= k)
      VectorSearch.topKPerQuery(scored, k)
        .withColumnRenamed("cos_sim", "adc_cos")
    else {
      val cand = VectorSearch.topKPerQuery(scored, rerank)
        .select("query_id", "neighbor_id")
      val qvecs = embeddings
        .filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      val rescored = embeddings
        .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nvec"))
        .join(broadcast(cand), "neighbor_id")
        .join(broadcast(qvecs), "query_id")
        .select(col("query_id"), col("neighbor_id"), col("nvec"), col("qvec"))
        .as[(Long, Long, Array[Float], Array[Float])]
        .flatMap { case (q, id, nv, qv) =>
          VectorSearch.finiteRoundedCosine(nv, qv).map(c => (q, id, c))
        }
        .toDF("query_id", "neighbor_id", "cos_sim")
      VectorSearch.topKPerQuery(rescored, k)
    }
  }
}
