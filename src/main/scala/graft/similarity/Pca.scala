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
    require(n > 1, s"PCA needs at least 2 vectors, saw $n")
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
