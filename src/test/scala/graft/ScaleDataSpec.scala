package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The scale-rehearsal synthesis recipe's invariants (SURVEY §6) —
  * bench_scale.json is only evidence if the synthesized sf1/sf3
  * actually scale the WORKLOAD SHAPE, so the recipe itself is tested:
  *  - row counts multiply by the copy count; fixed dims do not;
  *  - FK relationships hold WITHIN every copy (no orphaned facts);
  *  - copy 0 is bit-identical to the source (sfN ⊇ sf0.1 semantics);
  *  - document texts: token count preserved per doc, n_chars
  *    invariant maintained, and all copies of a doc are pairwise
  *    DISTINCT (the salt defeats cross-copy exact/near dups — naive
  *    replication would drive n² LSH candidate pairs);
  *  - embeddings: rotation preserves the norm, copies differ.
  */
class ScaleDataSpec extends SparkSpec {

  test("id-shifted union synthesis preserves shape invariants") {
    val out = Files.createTempDirectory("graft_scale_spec").toString
    ScaleData.scaleTables(spark, sf, out, 3)
    val S = ScaleData.Stride

    val li0 = spark.read.parquet(s"$sf/lineitem.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    assert(li.count() === 3 * li0.count())
    assert(spark.read.parquet(s"$out/nation.parquet").count() ===
      spark.read.parquet(s"$sf/nation.parquet").count(),
      "fixed dims must not replicate")

    // FK integrity within each copy: every fact key resolves
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .isEmpty, "orphaned lineitem order keys")
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .isEmpty, "orphaned order customer keys")

    // copy 0 ≡ source, bit-for-bit
    val c0 = li.filter(col("l_orderkey") < S)
    assert(c0.exceptAll(li0).isEmpty && li0.exceptAll(c0).isEmpty,
      "copy 0 must be identical to the source")

    // documents: n_chars invariant, token counts preserved, copies distinct
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    assert(d.count() === 3 * d0.count())
    assert(d.filter(length(col("text")) =!= col("n_chars")).isEmpty,
      "n_chars must equal length(text) (the source invariant)")
    val tok = d.select((col("doc_id") % S).as("src_id"),
        size(split(col("text"), " ")).as("ntok"))
      .join(d0.select(col("doc_id").as("src_id"),
        size(split(col("text"), " ")).as("ntok0")), "src_id")
    assert(tok.filter(col("ntok") =!= col("ntok0")).isEmpty,
      "per-copy salting must preserve each doc's token count")
    assert(d.groupBy((col("doc_id") % S).as("src_id"))
      .agg(count_distinct(col("text")).as("k"))
      .filter(col("k") =!= 3).isEmpty,
      "all 3 copies of a doc must carry pairwise-distinct text")

    // embeddings: rotation preserves norms (copies reorder the same
    // elements — fold order shifts, so compare with float tolerance),
    // and copies of a vector differ
    val sq = (cName: String) =>
      expr(s"aggregate($cName, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x)")
    val e0 = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    assert(e.count() === 3 * e0.count())
    val norms = e.select((col("vec_id") % S).as("src_id"), sq("embedding").as("n2"))
      .join(e0.select(col("vec_id").as("src_id"), sq("embedding").as("n20")), "src_id")
    assert(norms.filter(abs(col("n2") - col("n20")) > 1e-3).isEmpty,
      "rotation must preserve vector norms")
    assert(e.groupBy((col("vec_id") % S).as("src_id"))
      .agg(count_distinct(to_json(struct(col("embedding")))).as("k"))
      .filter(col("k") =!= 3).isEmpty,
      "all 3 copies of a vector must be pairwise distinct")
  }

  test("token salting survives irregular whitespace (leading/doubled spaces)") {
    // the separator-anchored regex it replaces left the token after a
    // leading space UNSALTED (a cross-copy exact-dup artifact) and
    // minted standalone 'z<k>q' tokens between doubled spaces
    import graft.SparkSpec.spark.implicits._
    val got = Seq((" foo bar", 1L), ("a  b", 2L), ("", 3L), ("solo", 0L))
      .toDF("text", "copy_k")
      .select(ScaleData.saltedText("text"), col("copy_k"))
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(got(1L) === " z1qfoo z1qbar", "leading space: every token salted")
    assert(got(2L) === "z2qa  z2qb", "doubled space: no minted salt token")
    assert(got(3L) === "", "empty text untouched")
    assert(got(0L) === "solo", "copy 0 verbatim")
  }

  test("hot-key synthesis plants ~10% heat per skew family; FKs and counts hold") {
    val out = Files.createTempDirectory("graft_scale_hot").toString
    ScaleData.scaleTables(spark, sf, out, 3, hot = 0.1)

    // row counts still multiply
    val o0 = spark.read.parquet(s"$sf/orders.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(o.count() === 3 * o0.count())

    // one customer key carries ~10% of ALL orders (xxhash64 selection:
    // binomial around 0.1 — accept [6%, 14%], far above uniform share)
    val hotCust = o0.sparkSession.read.parquet(s"$sf/customer.parquet")
      .agg(min("c_custkey")).head.getLong(0)
    val hotShare = o.filter(col("o_custkey") === hotCust).count().toDouble / o.count()
    assert(hotShare > 0.06 && hotShare < 0.14, s"hot customer share: $hotShare")

    // FK integrity survives the remap (hot key is a real copy-0 customer)
    val c = spark.read.parquet(s"$out/customer.parquet")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").isEmpty,
      "heated orders must still resolve to a customer")

    // events: one user carries ~10%
    val e = spark.read.parquet(s"$out/events.parquet")
    val hotUser = spark.read.parquet(s"$sf/events.parquet")
      .agg(min("user_id")).head.getLong(0)
    val uShare = e.filter(col("user_id") === hotUser).count().toDouble / e.count()
    assert(uShare > 0.06 && uShare < 0.14, s"hot user share: $uShare")

    // documents: hot_source ~10%; hot first token ~10%; token counts preserved
    val d = spark.read.parquet(s"$out/documents.parquet")
    val sShare = d.filter(col("source") === "hot_source").count().toDouble / d.count()
    assert(sShare > 0.06 && sShare < 0.14, s"hot source share: $sShare")
    val tShare = d.filter(col("text").startsWith("qhotzz ") ||
      col("text") === "qhotzz").count().toDouble / d.count()
    assert(tShare > 0.05 && tShare < 0.14, s"hot token share: $tShare")
    assert(d.filter(length(col("text")) =!= col("n_chars")).isEmpty,
      "n_chars must be recomputed after the hot-token replacement")
    val S = ScaleData.Stride
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
    val tok = d.select((col("doc_id") % S).as("src_id"),
        size(split(col("text"), " ")).as("ntok"))
      .join(d0.select(col("doc_id").as("src_id"),
        size(split(col("text"), " ")).as("ntok0")), "src_id")
    assert(tok.filter(col("ntok") =!= col("ntok0")).isEmpty,
      "hot token replaces the first token — token counts must not change")
  }

  test("salt precondition: a source token shaped like a salted one refuses to synthesize") {
    // copy 0 keeps 'z1qx' verbatim while copy 1 would salt 'x' into
    // the same 'z1qx' — a cross-copy exact-duplicate token, exactly
    // the collision class the salt exists to prevent (ADVICE r14).
    import graft.SparkSpec.spark.implicits._
    ScaleData.assertSaltable(Seq("plain words here", "az1qb embeds but not at token start")
      .toDF("text")) // clean corpus: salt-shaped prefixes only count at token start
    val ex = intercept[IllegalArgumentException] {
      ScaleData.assertSaltable(Seq("fine text", "hides z1qx inside").toDF("text"))
    }
    assert(ex.getMessage.contains("salt pattern"))
    // the real source corpus satisfies the precondition
    ScaleData.assertSaltable(spark.read.parquet(s"$sf/documents.parquet"))
  }

  test("embedding rotation stays distinct past the dim-64 wrap (sf10 recipe)") {
    // Plain rotation repeats with period dim (copy 64 ≡ copy 0) — the
    // sign flip for copy_k ≥ dim extends the family to 2·dim distinct
    // norm-preserving transforms. n=100 is exactly the sf10 synthesis.
    val out = Files.createTempDirectory("graft_scale_wrap").toString
    ScaleData.scaleTables(spark, sf, out, 100)
    val S = ScaleData.Stride
    val e0 = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    assert(e.count() === 100 * e0.count())
    assert(e.groupBy((col("vec_id") % S).as("src_id"))
      .agg(count_distinct(to_json(struct(col("embedding")))).as("k"))
      .filter(col("k") =!= 100).isEmpty,
      "all 100 copies of a vector must be pairwise distinct")
    val sq = expr("aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x)")
    val norms = e.select((col("vec_id") % S).as("src_id"), sq.as("n2"))
      .join(e0.select(col("vec_id").as("src_id"), sq.as("n20")), "src_id")
    assert(norms.filter(abs(col("n2") - col("n20")) > 1e-3).isEmpty,
      "sign flip + rotation must preserve vector norms")
  }

  test("zipf mode: power-law doc lengths, one planted giant per copy, invariants hold") {
    val out = Files.createTempDirectory("graft_scale_zipf").toString
    ScaleData.scaleTables(spark, sf, out, 3, zipf = true)
    val S = ScaleData.Stride
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
    val d = spark.read.parquet(s"$out/documents.parquet")
    // row count and n_chars invariants survive the expansion
    assert(d.count() === 3 * d0.count(), "zipf must not change row counts")
    assert(d.filter(length(col("text")) =!= col("n_chars")).isEmpty,
      "n_chars must equal length(text) after expansion")
    // exactly one giant per copy: the source-min doc id, expanded ~GiantMult x
    val minId = d0.agg(min("doc_id")).head().getLong(0)
    val giants = d.filter(col("n_chars") >
      lit(ScaleData.GiantMult.toLong) * 50) // far above any m<=64 doc
    assert(giants.count() === 3, "one planted giant per copy")
    assert(giants.filter(col("doc_id") % S =!= minId).isEmpty,
      "the giant must carry the source-min doc id in every copy")
    // the giant is m repeats of its (salted) base text: token count
    // scales exactly with GiantMult
    val baseTok = d0.filter(col("doc_id") === minId)
      .select(size(split(col("text"), " "))).head().getInt(0)
    val gTok = giants.filter(col("doc_id") === minId)
      .select(size(split(col("text"), " "))).head().getInt(0)
    assert(gTok === baseTok * ScaleData.GiantMult,
      s"giant token count $gTok != $baseTok * ${ScaleData.GiantMult}")
    // the length distribution actually has a power tail: a meaningful
    // fraction expanded (m>=2) and a smaller one expanded further
    // (m>=8); P(m>=2)=2^-1.5~0.35, P(m>=8)=8^-1.5~0.044
    val n = d.count().toDouble
    val p2 = d.join(d0.select(col("doc_id").as("sid"),
        col("n_chars").as("c0")), d("doc_id") % S === col("sid"))
      .filter(col("n_chars") >= col("c0") * 2).count() / n
    val p8 = d.join(d0.select(col("doc_id").as("sid"),
        col("n_chars").as("c0")), d("doc_id") % S === col("sid"))
      .filter(col("n_chars") >= col("c0") * 8).count() / n
    assert(p2 > 0.25 && p2 < 0.45, s"P(m>=2) ~ 0.35, got $p2")
    assert(p8 > 0.02 && p8 < 0.09, s"P(m>=8) ~ 0.044, got $p8")
    // expansion happens AFTER salting: cross-copy texts stay distinct
    assert(d.groupBy((col("doc_id") % S).as("src_id"))
      .agg(count_distinct(col("text")).as("k"))
      .filter(col("k") =!= 3).isEmpty,
      "zipf expansion must preserve cross-copy distinctness")
    // non-document tables are untouched by zipf (same recipe)
    assert(spark.read.parquet(s"$out/lineitem.parquet").count() ===
      3 * spark.read.parquet(s"$sf/lineitem.parquet").count())
  }
}
