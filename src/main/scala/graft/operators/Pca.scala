package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column via one-pass moment
  * accumulation + driver-side power iteration — the embedding
  * conditioning step in front of semantic dedup / clustering (SemDeDup
  * et al. normalize and decorrelate before cosine work).
  *
  * Scale contract: the ONLY driver state is the d×d covariance moment
  * block (d = embedding dim, bounded by contract at a few thousand —
  * the fixture's d=64 Gram is 32 KiB), accumulated with ONE
  * `treeAggregate`-shaped reduction (map-side partial sums, no row ever
  * leaves its executor). The eigensolver runs on that d×d block on the
  * driver in O(k·iters·d²); projection is a map-only broadcast pass.
  * Everything is deterministic: fixed iteration count, fixed
  * deterministic start vector, double accumulation.
  */
object Pca {

  /** `(n, sum[d], gram[d*d])` of the vectors — one aggregation pass.
    * Gram is the raw second moment Σ x xᵀ (full square, row-major).
    */
  def moments(embeddings: DataFrame, vecCol: String = "embedding"): (Long, Array[Double], Array[Double]) = {
    val rows = embeddings.select(col(vecCol)).rdd
    val (n, s, g) = rows.treeAggregate(
      (0L, null: Array[Double], null: Array[Double]))(
      seqOp = { case ((cnt, sum0, gram0), row) =>
        val v = row.getSeq[Float](0)
        val d = v.length
        val sum = if (sum0 == null) new Array[Double](d) else sum0
        val gram = if (gram0 == null) new Array[Double](d * d) else gram0
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          sum(i) += xi
          var j = 0
          while (j < d) { gram(i * d + j) += xi * v(j); j += 1 }
          i += 1
        }
        (cnt + 1L, sum, gram)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        if (s1 == null) (c2, s2, g2)
        else if (s2 == null) (c1, s1, g1)
        else {
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (c1 + c2, s1, g1)
        }
      })
    require(n > 0, "PCA over an empty table")
    (n, s, g)
  }

  /** Covariance matrix C = Σxxᵀ/n − μμᵀ from the moment block. */
  def covariance(n: Long, sum: Array[Double], gram: Array[Double]): Array[Double] = {
    val d = sum.length
    val c = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      val mi = sum(i) / n
      var j = 0
      while (j < d) {
        c(i * d + j) = gram(i * d + j) / n - mi * (sum(j) / n)
        j += 1
      }
      i += 1
    }
    c
  }

  /** Top-k eigenpairs of symmetric `c` (row-major d×d) by cyclic
    * Jacobi rotation — chosen over power iteration because a
    * covariance bulk spectrum is often FLAT (near-equal eigenvalues),
    * where power iteration stalls; Jacobi diagonalizes to machine
    * precision regardless of eigenvalue gaps, in O(d³·sweeps) on the
    * driver (d is bounded by the moments contract). Deterministic:
    * fixed sweep order, fixed sweep cap, sign-canonicalized vectors
    * (largest-|component| entry made positive), ties in the descending
    * eigenvalue sort broken by original column index.
    */
  def topEigen(c: Array[Double], d: Int, k: Int, maxSweeps: Int = 30): Seq[(Double, Array[Double])] = {
    val a = c.clone()
    // eigenvector accumulator, row-major: column j of V is eigenvector j
    val vm = new Array[Double](d * d)
    var i = 0
    while (i < d) { vm(i * d + i) = 1.0; i += 1 }

    var sweep = 0
    var off = offDiagNorm(a, d)
    while (sweep < maxSweeps && off > 1e-14 * (1.0 + frobNorm(a, d))) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 0) {
            // Givens rotation zeroing a(p,q) (Golub & Van Loan 8.4)
            val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val cth = 1.0 / math.sqrt(1.0 + t * t)
            val sth = t * cth
            var r = 0
            while (r < d) {
              val arp = a(r * d + p); val arq = a(r * d + q)
              a(r * d + p) = cth * arp - sth * arq
              a(r * d + q) = sth * arp + cth * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p * d + r); val aqr = a(q * d + r)
              a(p * d + r) = cth * apr - sth * aqr
              a(q * d + r) = sth * apr + cth * aqr
              val vrp = vm(r * d + p); val vrq = vm(r * d + q)
              vm(r * d + p) = cth * vrp - sth * vrq
              vm(r * d + q) = sth * vrp + cth * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a, d)
      sweep += 1
    }

    val order = (0 until d).sortBy(j => (-a(j * d + j), j)).take(k)
    order.map { j =>
      val v = Array.tabulate(d)(r => vm(r * d + j))
      // canonical sign: the largest-magnitude component is positive
      var best = 0
      var r = 1
      while (r < d) { if (math.abs(v(r)) > math.abs(v(best))) best = r; r += 1 }
      if (v(best) < 0) { r = 0; while (r < d) { v(r) = -v(r); r += 1 } }
      (a(j * d + j), v)
    }
  }

  private def offDiagNorm(a: Array[Double], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { if (i != j) s += a(i * d + j) * a(i * d + j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Double], d: Int): Double =
    math.sqrt(a.map(x => x * x).sum)

  /** Train: covariance from one pass, eigensolve on the driver.
    * Returns `(comp_id int, eigenvalue double, vector array<double>)`.
    */
  def fitTopK(embeddings: DataFrame, k: Int, maxSweeps: Int = 30,
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (n, s, g) = moments(embeddings, vecCol)
    val d = s.length
    val eig = topEigen(covariance(n, s, g), d, k, maxSweeps)
    val mean = s.map(_ / n)
    eig.zipWithIndex.map { case ((lam, v), i) =>
      (i, lam, v.toSeq, mean.toSeq)
    }.toDF("comp_id", "eigenvalue", "vector", "mean")
  }

  /** Map-only projection of every vector onto the fitted components
    * (mean-centered): `(idCol, pc0 … pc{k-1})`. The component table is
    * collected (k·d doubles, bounded) and broadcast.
    */
  def project(embeddings: DataFrame, components: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val comps = components.select("comp_id", "vector", "mean")
      .as[(Int, Seq[Double], Seq[Double])].collect().sortBy(_._1)
    require(comps.nonEmpty, "no components to project on")
    val mean = comps.head._3.toArray
    val vecs = comps.map(_._2.toArray)
    val bc = spark.sparkContext.broadcast((mean, vecs))
    val k = vecs.length
    val projected = embeddings.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val (m, cs) = bc.value
        val centered = Array.tabulate(m.length)(i => v(i).toDouble - m(i))
        (id, cs.map(c => dot(c, centered)).toSeq)
      }
      .toDF(idCol, "pcs")
    (0 until k).foldLeft(projected) { case (df, i) =>
      df.withColumn(s"pc$i", col("pcs").getItem(i))
    }.drop("pcs")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

}
