package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.sources.TableCatalog

class SimilaritySpec extends SparkSpec {

  private lazy val emb = TableCatalog(spark, sf).embeddings.cache()

  test("cosine of a vector with itself is 1") {
    val one = emb.limit(50)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9)
    assert(one.isEmpty)
  }

  test("brute-force top-k: k rows per query, ranks contiguous, self excluded") {
    val q = emb.filter(col("vec_id") < 5)
    val top = Similarity.cosineTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
    val counts = top.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(counts.filter(col("n") =!= 10 || col("mx") =!= 10).isEmpty)
    assert(top.filter(col("q_id") === col("n_id")).isEmpty)
  }

  test("LSH ANN returns a subset ranked by true cosine with usable recall") {
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.lshTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // weakly-similar corpus: multi-table LSH holds a modest floor here;
    // the planted-neighbor test below asserts the strong floor on the
    // retrieval case LSH is actually for
    assert(recall >= 0.10, s"recall $recall")
  }

  test("LSH ANN recall >= 0.9 on planted high-similarity neighbors") {
    // queries = perturbed copies of corpus vectors (cosine ≈ 0.999):
    // the ANN must find each query's original in its top-10.
    val q = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.lshTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong)))
    val recall = found / 20.0
    assert(recall >= 0.9, s"planted-neighbor recall $recall")
  }

  test("IVF ANN recall >= 0.9 on planted high-similarity neighbors") {
    val q = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.ivfTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong)))
    val recall = found / 20.0
    assert(recall >= 0.9, s"IVF planted-neighbor recall $recall")
  }

  test("PQ ANN recall >= 0.9 on planted high-similarity neighbors") {
    val q = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.pqTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong)))
    val recall = found / 20.0
    assert(recall >= 0.9, s"PQ planted-neighbor recall $recall")
  }

  test("PQ ANN overlaps the exact top-k meaningfully on the raw corpus") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pq.size === exact.size) // k rows per query either way
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ overlap recall $recall")
  }

  test("persisted PQ index: build once, search ≡ inline path; codes stay narrow") {
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Similarity.pqBuild(emb, "vec_id", "embedding", idx)
    val q = emb.filter(col("vec_id") < 10)
    val fromIndex = Similarity.pqSearch(q, "vec_id", "embedding", idx, k = 10)
    val inline = Similarity.pqTopK(q, emb, "vec_id", "vec_id", "embedding", k = 10)
    assert(fromIndex.exceptAll(inline).isEmpty && inline.exceptAll(fromIndex).isEmpty)
    // the stored code rows carry m small ints, never vectors
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.columns.sorted === Array("__codes", "n_id"))
    assert(codes.head.getSeq[Int](codes.head.fieldIndex("__codes")).length === 8)
    // searching twice from the same index is deterministic
    val again = Similarity.pqSearch(q, "vec_id", "embedding", idx, k = 10)
    assert(again.exceptAll(fromIndex).isEmpty && fromIndex.exceptAll(again).isEmpty)
  }

  test("cosinePairs: LSH path is sound and has high recall on planted near-dups") {
    import graft.SparkSpec.spark.implicits._
    // 30 planted near-dup pairs (cosine ≈ 0.99) among 240 random
    // 32-dim vectors.
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val planted = (0 until 30).flatMap { i =>
      val v = vec()
      val w = v.map(x => x + 0.08f * rnd.nextGaussian().toFloat)
      Seq((i * 2L, v), (i * 2L + 1, w))
    }
    val noise = (0 until 240).map(i => (1000L + i, vec()))
    val df = (planted ++ noise).toDF("id", "embedding")
    val exact = Similarity.cosinePairs(df, "id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.cosinePairs(df, "id", "embedding", 0.9, lsh = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact mode finds (at least) the planted pairs
    val plantedPairs = (0 until 30).map(i => (i * 2L, i * 2L + 1)).toSet
    assert(plantedPairs.forall(exact.contains), "exact mode missed a planted pair")
    // soundness: every LSH pair is a true pair with the identical sim
    lsh.foreach { case (pair, sim) =>
      assert(exact.contains(pair) && math.abs(exact(pair) - sim) < 1e-12) }
    // recall on the high-similarity regime LSH exists for
    val recall = (plantedPairs count lsh.contains).toDouble / plantedPairs.size
    assert(recall >= 0.9, s"cosinePairs LSH recall $recall")
  }

  test("persisted IVF index: build once, search twice ≡ inline path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val q = emb.filter(col("vec_id") < 10)
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir)
    def run() = Similarity.ivfSearch(q, "vec_id", "embedding", dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val first = run()
    val second = run()
    assert(first === second, "persisted-index search is not deterministic")
    val inline = Similarity.ivfTopK(q, emb, "vec_id", "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(first === inline, "persisted-index search diverges from the inline path")
  }

  test("persisted IVF search reads only probed cell partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    Similarity.ivfBuild(emb, "vec_id", "embedding", dir)
    val q = emb.filter(col("vec_id") === 0)
    val plan = Similarity.ivfSearch(q, "vec_id", "embedding", dir, k = 5, nprobe = 2)
      .queryExecution.executedPlan
    // Recurse through AQE wrapper nodes (their sub-plans are not
    // `children`, so a plain collect misses the scans).
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/cells")) => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.inputPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scansOf)
    }
    val scans = scansOf(plan)
    assert(scans.nonEmpty, s"no cells scan found in plan:\n$plan")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"cells scan has no partition filter:\n$plan")
      // 1 query × nprobe=2 → at most 2 of the 16 cell directories read.
      assert(s.selectedPartitions.partitionCount <= 2,
        s"expected ≤2 probed partitions, read ${s.selectedPartitions.partitionCount}")
    }
  }

  test("IVF-PQ composed index: full-probe search ≡ pure-PQ path; recall holds at nprobe=4") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/idx"
    Similarity.ivfpqBuild(emb, "vec_id", "embedding", dir)
    val q = emb.filter(col("vec_id") < 10)
    // Cells only gate WHICH codes get ADC-scored: probing every cell
    // must reproduce the pure-PQ path exactly (same codebooks — the
    // deterministic pqTrain sample — same ADC scores, same re-rank).
    val full = Similarity.ivfpqSearch(q, "vec_id", "embedding", dir, k = 10, nprobe = 16)
    val purePq = Similarity.pqTopK(q, emb, "vec_id", "vec_id", "embedding", k = 10)
    assert(full.exceptAll(purePq).isEmpty && purePq.exceptAll(full).isEmpty,
      "full-probe IVF-PQ diverges from the pure-PQ path")
    // planted-neighbor recall with real pruning (nprobe=4 of 16 cells)
    val qp = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.ivfpqSearch(qp, "vec_id", "embedding", dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong))) / 20.0
    assert(recall >= 0.9, s"IVF-PQ planted-neighbor recall $recall")
    // search twice: deterministic
    val again = Similarity.ivfpqSearch(q, "vec_id", "embedding", dir, k = 10, nprobe = 16)
    assert(again.exceptAll(full).isEmpty && full.exceptAll(again).isEmpty)
  }

  test("IVF-PQ search reads only probed code partitions, and codes stay narrow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/idx"
    Similarity.ivfpqBuild(emb, "vec_id", "embedding", dir)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.sorted === Array("__codes", "cell", "n_id"))
    val q = emb.filter(col("vec_id") === 0)
    val plan = Similarity.ivfpqSearch(q, "vec_id", "embedding", dir, k = 5, nprobe = 2)
      .queryExecution.executedPlan
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/codes")) => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.inputPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scansOf)
    }
    val scans = scansOf(plan)
    assert(scans.nonEmpty, s"no codes scan found in plan:\n$plan")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"codes scan has no partition filter:\n$plan")
      // 1 query × nprobe=2 → at most 2 of the 16 cell directories read.
      assert(s.selectedPartitions.partitionCount <= 2,
        s"expected ≤2 probed partitions, read ${s.selectedPartitions.partitionCount}")
    }
  }

  test("ivfpqAdd: incrementally added vectors become searchable, old results undisturbed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_add").toString + "/idx"
    // build WITHOUT vectors 0..9, then add them incrementally
    val rest = emb.filter(col("vec_id") >= 10)
    Similarity.ivfpqBuild(rest, "vec_id", "embedding", dir, residual = true)
    val q = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val before = Similarity.ivfpqSearch(q, "vec_id", "embedding", dir, k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    Similarity.ivfpqAdd(emb.filter(col("vec_id") < 10), "vec_id", "embedding", dir)
    // planted perturbed copies of the ADDED vectors are now found
    val qp = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.ivfpqSearch(qp, "vec_id", "embedding", dir, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (0 until 10).count(i => ann.contains((i + 100000L, i.toLong))) / 10.0
    assert(recall >= 0.9, s"added-vector recall $recall")
    // an added-set search equals a search over an index built with the
    // SAME quantizers: re-run the old queries and require every result
    // to be either the old hit or a genuinely better new vector
    val after = Similarity.ivfpqSearch(q, "vec_id", "embedding", dir, k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oldIds = before.map(_._3)
    assert(after.forall { case (_, _, n) => oldIds.contains(n) || n < 10 },
      "post-add results contain ids that exist in neither the old index nor the batch")
  }

  test("residual IVF-PQ: recall holds, searches are deterministic, overlap ≥ plain codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_res").toString
    Similarity.ivfpqBuild(emb, "vec_id", "embedding", s"$dir/res", residual = true)
    Similarity.ivfpqBuild(emb, "vec_id", "embedding", s"$dir/plain", residual = false)
    // planted-neighbor recall with pruning (nprobe=4 of 16 cells)
    val qp = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = Similarity.ivfpqSearch(qp, "vec_id", "embedding", s"$dir/res", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong))) / 20.0
    assert(recall >= 0.9, s"residual IVF-PQ planted-neighbor recall $recall")
    // residual codes spend their resolution on the local neighborhood:
    // exact-top-k overlap must not trail the plain-code index
    // (deterministic: fixed seeds, deterministic samples)
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def overlap(idx: String) =
      (Similarity.ivfpqSearch(q, "vec_id", "embedding", idx, k = 10, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet & exact).size
    val (ovRes, ovPlain) = (overlap(s"$dir/res"), overlap(s"$dir/plain"))
    assert(ovRes >= ovPlain,
      s"residual overlap $ovRes trails plain overlap $ovPlain")
    // deterministic across searches
    val again = Similarity.ivfpqSearch(qp, "vec_id", "embedding", s"$dir/res", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === ann)
  }

  test("IVF accepts array<double> embeddings (sampler + expressions)") {
    val dbl = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = dbl.filter(col("vec_id") < 3)
    val top = Similarity.ivfTopK(q, dbl, "vec_id", "vec_id", "embedding", k = 5)
    assert(top.groupBy("q_id").count().filter(col("count") =!= 5).isEmpty)
  }

  test("PCA: orthonormal components, eigen-ordered variance, whitening normalizes") {
    import graft.similarity.Pca
    val model = Pca.train(emb, "embedding", r = 8)
    assert(model.components.length === 8)
    for (i <- 0 until 8; j <- i until 8) {
      val ci = model.components(i); val cj = model.components(j)
      val d = ci.indices.map(k => ci(k) * cj(k)).sum
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"component $i not unit")
      else assert(math.abs(d) < 1e-9, s"components $i,$j not orthogonal")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues not descending")
    // projected variance along each component equals its eigenvalue
    val proj = Pca.project(emb, "embedding", model)
      .select(col("pca")).collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length
    for (i <- 0 until 8) {
      val mean = proj.map(_(i)).sum / n
      val v = proj.map(p => (p(i) - mean) * (p(i) - mean)).sum / n
      assert(math.abs(v - model.eigenvalues(i)) <= 1e-6 * math.max(1.0, model.eigenvalues(i)),
        s"variance $v along component $i != eigenvalue ${model.eigenvalues(i)}")
    }
    // whitening → unit variance per coordinate
    val white = Pca.project(emb, "embedding", model, whiten = true)
      .select(col("pca")).collect().map(_.getSeq[Double](0).toArray)
    for (i <- 0 until 8) {
      val mean = white.map(_(i)).sum / n
      val v = white.map(p => (p(i) - mean) * (p(i) - mean)).sum / n
      assert(math.abs(v - 1.0) < 1e-6, s"whitened variance $v along $i")
    }
    // deterministic: training twice yields the identical model
    val again = Pca.train(emb, "embedding", r = 8)
    assert(again.mean.toSeq === model.mean.toSeq)
    assert(again.components.map(_.toSeq).toSeq === model.components.map(_.toSeq).toSeq)
  }

  test("norm stats cover every label once") {
    val st = Similarity.normStats(emb, "label", "embedding")
    assert(st.count() === emb.select("label").distinct().count())
    assert(st.filter(col("min_norm") > col("max_norm")).isEmpty)
  }
}
