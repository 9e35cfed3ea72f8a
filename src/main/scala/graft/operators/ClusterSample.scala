package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-balanced (diversity) sampling over an embedding corpus: draw an
  * exact per-cluster quota so the sample covers semantic space evenly
  * instead of mirroring the crawl's topical skew — the embedding-space
  * analogue of [[Curation.stratifiedSample]], with k-means cells standing
  * in for the language/source strata.
  *
  * Scale shape, stage by stage:
  *   - centroids from [[Ivf.trainCentroids]] (deterministic hash-ranked
  *     init, driver state = nClusters × dim doubles);
  *   - assignment is a map-only pass against the broadcast centroids;
  *   - the per-cell quota is the n smallest md5-hash-ranked ids, held by
  *     the k-bounded [[graft.functions.MinKAggregator]] riding a regular
  *     partial aggregation — every map task ships at most n (rank, id)
  *     pairs per cell, so a hot cluster never funnels through one task
  *     the way a row_number window would.
  *
  * The hash-rank selection is stable under corpus growth and
  * re-partitioning (same rank key as stratifiedSample), so re-running on
  * an appended corpus only swaps members where new ids genuinely rank in.
  */
object ClusterSample {

  def diversitySample(
      embeddings: DataFrame,
      nPerCluster: Int,
      nClusters: Int = 16,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    diversitySampleFrom(embeddings,
      Ivf.trainCentroids(embeddings, nClusters, iters, idCol, vecCol),
      nPerCluster, idCol, vecCol)

  /** The apply half of [[diversitySample]] against a PRE-TRAINED
    * centroid table — see [[Dedup.embeddingPairsKmeansFrom]]; frozen
    * committed centroids make the quota pass
    * DuckDB-oracle-expressible.
    */
  def diversitySampleFrom(
      embeddings: DataFrame,
      cents: Array[Array[Double]],
      nPerCluster: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nPerCluster > 0, s"quota must be positive: $nPerCluster")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)

    val assigned = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, Ivf.nearestCell(v, bc.value)) }
      .toDF("id", "cell")

    assigned
      .select(col("cell"),
        conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("rk"),
        col("id"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.MinKAggregator(nPerCluster).toColumn.name("mink"))
      .flatMap { case (cell, picked) =>
        picked.iterator.zipWithIndex.map { case ((_, id), i) =>
          (cell, id, (i + 1).toLong)
        }
      }
      .toDF("cell", idCol, "rn")
  }
}
