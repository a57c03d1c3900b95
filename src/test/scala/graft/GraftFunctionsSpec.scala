package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, MinMd5Expr, ShinglesExpr, SimHashMd5Expr, TextFunctions}

/** SQL-surface registration: the native expressions callable from SQL
  * text must agree exactly with their Column-API forms. */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API bit-for-bit") {
    GraftFunctions.register(spark)

    val r = spark.sql(
      """SELECT graft_hamming(5L, 1L) AS h,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_norm(array(3.0D, 4.0D)) AS n""".stripMargin).head
    assert(r.getAs[Long]("h") === 1L)   // 101 xor 001 = 100
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Double]("n") === 5.0)

    // sketch chain from SQL == sketch chain from the Column API
    val docs = sources.TableCatalog(spark, sf).documents.limit(50)
    docs.createOrReplaceTempView("g_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash(graft_shingles(split(text, ' '), 3), 64) AS sig,
        |  graft_simhash(graft_shingles(split(text, ' '), 3)) AS fp,
        |  graft_minmd5(graft_shingles(split(text, ' '), 3)) AS mm
        |FROM g_docs""".stripMargin)
    val sh = ShinglesExpr.shingles(TextFunctions.tokens(col("text")), 3)
    val viaApi = docs.select(col("doc_id"),
      graft.functions.MinHashFromShinglesExpr.minhash(sh, 64).as("sig"),
      SimHashMd5Expr.simhash(sh).as("fp"),
      MinMd5Expr.minMd5(sh).as("mm"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("streaming-text shingles are bit-identical to split + array shingles") {
    import graft.SparkSpec.spark.implicits._
    // edge shapes: normal, doubled spaces (interior empty tokens),
    // leading/trailing spaces (split keeps trailing empties at
    // limit=-1), short (< k), empty, single token, unicode multi-byte,
    // and a repetitive zipf-giant-alike whose distinct set collapses
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  b c   d", " leading space", "trailing space ", "two  ", "",
      "one", "ab cd", "héllo wörld émoji é 世界 token",
      Seq.fill(500)("rep eat me now").mkString(" ")
    ).toDF("text")
    for (k <- Seq(2, 3, 5)) {
      val via = texts.select(
        graft.functions.ShinglesExpr.shingles(TextFunctions.tokens(col("text")), k).as("a"),
        graft.functions.ShinglesExpr.shinglesFromText(col("text"), k).as("b"))
      assert(via.filter(not(col("a") <=> col("b"))).isEmpty,
        s"streaming shingles diverge from split+shingles at k=$k")
    }
  }

  test("native winnow is bit-identical to the gramHashes+winnowMins HOF chain") {
    import graft.SparkSpec.spark.implicits._
    // shapes: below-k, exactly-k, grams < window, unicode multi-byte
    // (grams are CHAR-indexed), long repetitive (giant-alike), and a
    // > FingerprintMaxChars doc exercising the shared cap
    val big = "abcdefgh " * 9000 // 81000 chars > 65536 cap
    val texts = Seq(
      "", "short", "exactly8", "just nine", "the quick brown fox",
      "héllo wörld 世界 multibyte grams", ("rep " * 400).trim, big
    ).toDF("text")
    val via2 = texts
      .withColumn("__hs", TextFunctions.gramHashes("text", 8))
      .select(TextFunctions.winnowMins("__hs", 4).as("a"),
        graft.functions.WinnowExpr.winnow(col("text"), 8, 4).as("b"))
    assert(via2.filter(not(col("a") <=> col("b"))).isEmpty,
      "native winnow diverges from the HOF chain")
  }

  test("collect_min_k equals sorted-collect-truncate under any partitioning") {
    import graft.SparkSpec.spark.implicits._
    import graft.functions.CollectMinK.collectMinK
    val rnd = new scala.util.Random(42)
    // skewed groups: group 0 gets 2000 rows (saturation fast path +
    // merge), group 9 gets 3 (< k buffer); 20% null values (ignored)
    val rows = (0 until 3000).map { i =>
      val g = if (i < 2000) 0L else (i % 9) + 1L
      val v: java.lang.Long = if (rnd.nextInt(5) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(100000).toLong)
      (g, v)
    }
    for (nPart <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "v").repartition(nPart)
      val got = df.groupBy("g").agg(collectMinK(col("v"), 20).as("mk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.filter(col("v").isNotNull)
        .groupBy("g").agg(slice(sort_array(collect_list(col("v"))), 1, 20).as("mk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got === want, s"nPart=$nPart")
      assert(got(0L).size === 20 && got(0L) === got(0L).sorted)
    }
    // all-null group yields an empty array, not null
    val empty = Seq((1L, null: java.lang.Long)).toDF("g", "v")
      .groupBy("g").agg(collectMinK(col("v"), 5).as("mk")).collect()
    assert(empty.head.getSeq[Long](1) === Seq.empty)
  }

  test("graft_collect_min_k is callable from SQL and matches the Column API") {
    import graft.SparkSpec.spark.implicits._
    import graft.functions.CollectMinK.collectMinK
    GraftFunctions.register(spark)
    Seq((1L, 5L), (1L, 2L), (1L, 9L), (2L, 7L)).toDF("g", "v")
      .createOrReplaceTempView("mk_in")
    val viaSql = spark.sql(
      "SELECT g, graft_collect_min_k(v, 2) AS mk FROM mk_in GROUP BY g")
    val viaApi = spark.table("mk_in").groupBy("g")
      .agg(collectMinK(col("v"), 2).as("mk"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("collect_min_k buffers stay bounded at k in the aggregate plan") {
    import graft.SparkSpec.spark.implicits._
    import graft.functions.CollectMinK.collectMinK
    // plan sanity: a partial_collect_min_k appears before the exchange
    // (map-side combine), so skewed keys never ship unbounded state
    val df = (0 until 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
      .groupBy("g").agg(collectMinK(col("v"), 4).as("mk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_collect_min_k"),
      s"expected a partial aggregation phase, plan:\n$plan")
  }
}
