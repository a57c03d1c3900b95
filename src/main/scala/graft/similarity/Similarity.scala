package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale shapes:
  *  - `cosineTopK`: brute-force baseline — broadcast the (small) query
  *    set against the corpus; exact, one pass, no shuffle of the
  *    corpus. Per-row vector math is double-precision HOFs inside
  *    codegen, no UDF.
  *  - `lshTopK`: the scale path — sign-sketch (random hyperplane)
  *    buckets; candidates = bucket match or adjacent (hamming ≤ 1)
  *    bucket, exact cosine re-rank of candidates only. At 100 TB the
  *    bucket join replaces the corpus-wide cross product.
  */
object Similarity {

  /** Element-wise double cast. */
  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm in double precision. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(toD(a), x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector. `queries` must be
    * broadcast-small (it is crossJoin-broadcast against the corpus). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                 cId: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(cId).as("n_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("__qv"), col("__cv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Deterministic sign-sketch bucket id over `planes` pseudo-random
    * hyperplanes (seeded, reproducible across cluster layouts). */
  def signBucket(vec: Column, planes: Int = 8, dims: Int = 64, seed: Long = 7L): Column = {
    val rnd = new java.util.Random(seed)
    val hp = Array.fill(planes, dims)(rnd.nextGaussian())
    val planeCols = (0 until planes).map { p =>
      val w = array(hp(p).map(lit): _*)
      val d = aggregate(zip_with(toD(vec), w, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planeCols.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: `tables` independent sign
    * sketches (OR-amplification), each probed at the query's bucket
    * and every hamming-1 neighbor bucket (multi-probe); exact cosine
    * re-ranks the union of candidates. Probes explode on the query
    * side (queries ≪ corpus), so the corpus is hashed once per table
    * and never cross-joined. At billions of vectors this bounds the
    * scored pairs to tables × (planes+1) × bucket-size per query,
    * versus N for brute force; recall amplifies as
    * 1 − (1 − p_table)^tables. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, qId: String,
              cId: String, vecCol: String, k: Int, planes: Int = 8,
              tables: Int = 4): DataFrame = {
    val tableSeeds = (0 until tables).map(t => 7L + 1000L * t)
    val c = corpus.select((col(cId).as("n_id") +: col(vecCol).as("__cv") +:
      tableSeeds.zipWithIndex.map { case (seed, t) =>
        signBucket(col(vecCol), planes, seed = seed).as(s"__b$t") }): _*)
    val probed = queries.select((col(qId).as("q_id") +: col(vecCol).as("__qv") +:
        tableSeeds.zipWithIndex.map { case (seed, t) =>
          signBucket(col(vecCol), planes, seed = seed).as(s"__qb$t") }): _*)
      .select(col("q_id"), col("__qv"), explode(array((for {
        t <- 0 until tables
        probe <- col(s"__qb$t") +: (0 until planes).map(p =>
          col(s"__qb$t").bitwiseXOR(lit(1L << p)))
      } yield struct(lit(t).as("t"), probe.as("b"))): _*)).as("__probe"))
      .select(col("q_id"), col("__qv"),
        col("__probe.t").as("__t"), col("__probe.b").as("__bucket"))
    val scored = (0 until tables).map { t =>
        c.select(col("n_id"), col("__cv"), col(s"__b$t").as("__bucket"))
          .join(broadcast(probed.filter(col("__t") === t)
            .select(col("q_id"), col("__qv"), col("__bucket"))), "__bucket")
          .select(col("q_id"), col("n_id"), col("__qv"), col("__cv"))
      }.reduce(_ union _)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("__qv"), col("__cv")).as("sim"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"))
  }

  /** Per-group vector norm statistics (order-independent agg only:
    * min/max exact, mean via 6-decimal-rounded decimal sum). */
  def normStats(corpus: DataFrame, groupCol: String, vecCol: String): DataFrame =
    corpus.select(col(groupCol).as("grp"), norm(col(vecCol)).as("__n"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("__n")).as("min_norm"),
        max(col("__n")).as("max_norm"),
        (sum(round(col("__n"), 6).cast("decimal(18,6)")).cast("double") / count(lit(1))).as("avg_norm"))
}
