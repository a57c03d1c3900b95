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
}
