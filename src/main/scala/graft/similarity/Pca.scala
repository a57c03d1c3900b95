package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the rotation an embedding
  * pipeline applies before quantization (OPQ-lite: PQ subspaces work
  * best when variance is spread evenly), before cheap linear probes,
  * or to shed dead dimensions ahead of an ANN index.
  *
  * Scale shape: ONE corpus pass computes per-partition Gramian +
  * mean partials via `mapPartitions` (a d×d + d double array per
  * partition — 33 KB at d = 64; no Catalyst expression computes an
  * outer-product sum, the same justification as the multimodal
  * decoders). Partials come to the driver ordered by partition index
  * and combine in that fixed order, so the model is deterministic
  * for a given input layout; the d×d eigendecomposition is
  * driver-side breeze (O(d³) ≪ one scheduler round-trip).
  * Projection is a broadcast literal matrix multiply per row — a
  * codegen'd HOF pipeline, no shuffle, no UDF.
  */
object Pca {

  /** `components` holds r rows of d loadings, eigenvalue-descending;
    * `eigenvalues` are the population variances along them. */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
                         components: Array[Array[Double]])

  def train(corpus: DataFrame, vecCol: String, r: Int): Model = {
    val rows = corpus.select(col(vecCol)).rdd
    val partials = rows.mapPartitionsWithIndex { (pi, it) =>
      var g: Array[Double] = null
      var s: Array[Double] = null
      var n = 0L
      it.foreach { row =>
        val v = row.getSeq[Number](0).toArray.map(_.doubleValue)
        if (g == null) { g = new Array[Double](v.length * v.length); s = new Array[Double](v.length) }
        var i = 0
        while (i < v.length) {
          s(i) += v(i)
          var j = 0
          val base = i * v.length
          while (j < v.length) { g(base + j) += v(i) * v(j); j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator((pi, n, s, g))
    }.collect().sortBy(_._1) // fixed combine order → deterministic per layout
    require(partials.nonEmpty, "PCA training corpus is empty")
    val d = partials.head._3.length
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * d)
    var n = 0L
    partials.foreach { case (_, pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { gram(i) += pg(i); i += 1 }
    }
    fromMoments(n, sum, gram, r)
  }

  /** The same model from an in-memory sample, accumulated in the
    * array's fixed order — the fully layout-independent trainer the
    * PQ rotation uses (its sample is already hash-ordered). */
  def trainPoints(points: Array[Array[Double]], r: Int): Model = {
    require(points.nonEmpty, "PCA training sample is empty")
    val d = points.head.length
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * d)
    points.foreach { v =>
      var i = 0
      while (i < d) {
        sum(i) += v(i)
        var j = 0
        val base = i * d
        while (j < d) { gram(base + j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    fromMoments(points.length.toLong, sum, gram, r)
  }

  /** Eigendecomposition of the moment sums: shared by the corpus-pass
    * and in-memory trainers so both produce the identical model for
    * identical moments (deterministic sign convention included). */
  private def fromMoments(n: Long, sum: Array[Double], gram: Array[Double],
                          r: Int): Model = {
    require(n > 1, s"PCA needs at least 2 vectors, saw $n")
    val d = sum.length
    val mean = sum.map(_ / n)
    // population covariance: E[vvᵀ] − μμᵀ
    val cov = breeze.linalg.DenseMatrix.tabulate(d, d) { (i, j) =>
      gram(i * d + j) / n - mean(i) * mean(j)
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(r)
    val comps = order.map { i =>
      val v = Array.tabulate(d)(j => es.eigenvectors(j, i))
      // deterministic sign convention: largest-|loading| coordinate positive
      val k = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(k) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, order.map(i => math.max(es.eigenvalues(i), 0.0)).toArray, comps)
  }

  /** OPQ-lite rotation for product quantization: the FULL orthonormal
    * PCA basis of `points` — orthonormality means inner products are
    * exactly preserved ((Rq)·(Rv) = q·v), so rotating both sides
    * changes nothing about ADC semantics — with the basis rows
    * ALLOCATED to the `m` PQ subspaces by a balanced greedy in the
    * spirit of parametric OPQ's eigenvalue allocation (Ge et al.,
    * "Optimized Product Quantization"): eigenvalue-descending greedy
    * onto the subspace with the smallest current VARIANCE SUM,
    * capacity d/m rows each. (The paper's log-product criterion
    * degenerates when eigenvalues are < 1 — negative logs make the
    * subspace holding the largest components look emptiest, sucking
    * ALL the signal into one subspace; the sum criterion interleaves
    * them as intended.) Rows
    * [s·(d/m), (s+1)·(d/m)) are subspace s's basis, so the
    * quantizer's blind d/m split sees decorrelated, variance-balanced
    * subspaces instead of whatever the raw coordinate order happened
    * to couple together. Deterministic: fixed point order, eigSym,
    * the train() sign convention, ties to the lowest subspace index. */
  def rotationFor(points: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val d = points.head.length
    require(d % m == 0, s"dims=$d must split evenly into m=$m subspaces")
    val subDim = d / m
    val model = trainPoints(points, d)
    val sumVar = Array.fill(m)(0.0)
    val used = Array.fill(m)(0)
    val assigned = Array.fill(m)(List.empty[Int])
    var i = 0
    while (i < d) { // components are eigenvalue-descending already
      var best = -1
      var s = 0
      while (s < m) {
        if (used(s) < subDim && (best < 0 || sumVar(s) < sumVar(best))) best = s
        s += 1
      }
      sumVar(best) += model.eigenvalues(i)
      used(best) += 1
      assigned(best) = i :: assigned(best)
      i += 1
    }
    assigned.flatMap(_.reverse.map(model.components)).toArray
  }

  /** Append `outCol` = the r-dim projection of `vecCol` (centered;
    * `whiten` divides each coordinate by √eigenvalue so every
    * component has unit variance over the training corpus). */
  def project(df: DataFrame, vecCol: String, model: Model,
              whiten: Boolean = false, outCol: String = "pca"): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit, (a, b) => a - b)
    val coords = model.components.zipWithIndex.map { case (comp, i) =>
      val dotc = Similarity.dot(centered, typedLit(comp.toSeq))
      if (whiten) dotc / lit(math.sqrt(math.max(model.eigenvalues(i), 1e-300)))
      else dotc
    }
    df.withColumn(outCol, array(coords: _*))
  }
}
