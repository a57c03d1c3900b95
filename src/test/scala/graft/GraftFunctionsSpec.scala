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
    // k=1 pins the distinct-tokens identity (s06's token-set payload):
    // 1-shingles ≡ array_distinct(split(text, ' '))
    for (k <- Seq(1, 2, 3, 5)) {
      val via = texts.select(
        graft.functions.ShinglesExpr.shingles(TextFunctions.tokens(col("text")), k).as("a"),
        graft.functions.ShinglesExpr.shinglesFromText(col("text"), k).as("b"))
      assert(via.filter(not(col("a") <=> col("b"))).isEmpty,
        s"streaming shingles diverge from split+shingles at k=$k")
    }
  }

  test("SigAgreeExpr is bit-identical to the aggregate(zip_with(...)) HOF chain") {
    import graft.SparkSpec.spark.implicits._
    // edge shapes: identical sigs, disjoint, partial agreement,
    // LENGTH MISMATCH (zip_with pads the short side with nulls, whose
    // equality indicator falls to otherwise(0) — the native form must
    // count over min(len)), empty arrays, and a NULL array (HOF chain
    // propagates null; BinaryExpression must too)
    val rows = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),
      (Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L)),
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 9L)),
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
      .unionByName(Seq((null, Seq(1L, 2L))).asInstanceOf[Seq[(Seq[Long], Seq[Long])]]
        .toDF("a", "b"))
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
    val via = rows.select(hof.as("h"),
      graft.functions.SigAgreeExpr.sigAgree(col("a"), col("b")).as("n"))
    assert(via.filter(not(col("h") <=> col("n"))).isEmpty,
      "SigAgreeExpr diverges from the HOF agreement count")
    // and on REAL signatures: every candidate pair of a small corpus
    val sigs = Seq("aa bb cc dd", "aa bb cc dd", "aa bb cc ee", "zz yy xx ww")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), graft.functions.MinHashFromShinglesExpr.minhash(
        graft.functions.ShinglesExpr.shinglesFromText(col("text"), 2), 64).as("sig"))
    val pairs = sigs.as("x").join(sigs.as("y"), col("x.id") < col("y.id"))
      .select(col("x.sig").as("a"), col("y.sig").as("b"))
    val real = pairs.select(hof.as("h"),
      graft.functions.SigAgreeExpr.sigAgree(col("a"), col("b")).as("n"))
    assert(real.filter(not(col("h") <=> col("n"))).isEmpty,
      "SigAgreeExpr diverges on real minhash signatures")
  }

  test("SigAgreeExpr rejects non-bigint element arrays at analysis time (ADVICE r18)") {
    import graft.SparkSpec.spark.implicits._
    // array<int> would read garbage through getLong — must fail
    // ANALYSIS, not silently miscount
    val ints = Seq((Seq(1, 2, 3), Seq(1, 2, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.functions.SigAgreeExpr.sigAgree(col("a"), col("b")))
        .collect()
    }
    // array<bigint> through a parquet round trip (containsNull=true)
    // must still be accepted — the nullability of elements is the
    // caller contract, only the element TYPE is enforced
    val dir = java.nio.file.Files.createTempDirectory("graft_sig").toString + "/t"
    Seq((Seq(1L, 2L, 3L), Seq(1L, 9L, 3L))).toDF("a", "b")
      .write.parquet(dir)
    val back = graft.SparkSpec.spark.read.parquet(dir)
    assert(back.select(graft.functions.SigAgreeExpr.sigAgree(col("a"), col("b")))
      .head().getInt(0) === 2)
  }

  test("native winnow is bit-identical to the gramHashes+winnowMins HOF chain") {
    import graft.SparkSpec.spark.implicits._
    // shapes: below-k, exactly-k, grams < window, unicode multi-byte
    // (grams are CHAR-indexed), long repetitive (giant-alike), and a
    // > FingerprintMaxChars doc exercising the shared cap
    val big = "abcdefgh " * 9000 // 81000 chars > 65536 cap
    val texts = Seq(
      "", "short", "exactly8", "just nine", "the quick brown fox",
      "héllo wörld 世界 multibyte grams", ("rep " * 400).trim, big,
      null // NULL text → empty array on BOTH sides (ADVICE r16)
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

  // Edge corpus for every tokenizer identity below: normal text,
  // interior/leading/trailing empties, empty text, single token,
  // multi-byte UTF-8, a repetitive giant-alike, and NULL text.
  private def tokenEdgeTexts = {
    import graft.SparkSpec.spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the quick dog"),
      (2L, "a  b c   d"), (3L, " leading"), (4L, "trailing "),
      (5L, "two  "), (6L, ""), (7L, "one"),
      (8L, "héllo wörld émoji é 世界 token 世界"),
      (9L, Seq.fill(500)("rep eat me now").mkString(" ")),
      (10L, null: String)
    ).toDF("id", "text")
  }

  test("token count/uniq expressions are bit-identical to the split formulations") {
    import graft.functions.{TokenCountExpr, TokenUniqExpr}
    val t = tokenEdgeTexts
    val via = t.select(
      TokenCountExpr.tokenCount(col("text")).as("a1"),
      size(TextFunctions.tokens(col("text"))).as("b1"),
      TokenCountExpr.nonEmptyTokenCount(col("text")).as("a2"),
      size(filter(TextFunctions.tokens(col("text")), x => x =!= "")).as("b2"),
      TokenUniqExpr.stats(col("text")).as("u"),
      size(array_distinct(TextFunctions.tokens(col("text")))).as("b3"))
    assert(via.filter(not(col("a1") <=> col("b1"))).isEmpty, "tokenCount diverges")
    assert(via.filter(not(col("a2") <=> col("b2"))).isEmpty, "nonEmptyTokenCount diverges")
    assert(via.filter(col("u").isNotNull &&
      (col("u.n_tokens") =!= col("b1") || col("u.n_uniq") =!= col("b3"))).isEmpty,
      "TokenUniqExpr diverges")
    assert(via.filter(col("b1").isNull && col("u").isNotNull).isEmpty,
      "TokenUniqExpr must be null for null text")
  }

  test("regex token stats are bit-identical to regexp_extract_all counts") {
    import graft.functions.RegexTokenStatsExpr
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"
    val toks = regexp_extract_all(col("text"), lit(pat), lit(0))
    val via = tokenEdgeTexts.select(
      RegexTokenStatsExpr.stats(col("text"), pat).as("u"),
      size(toks).as("b1"), size(array_distinct(toks)).as("b2"))
    assert(via.filter(col("u").isNotNull &&
      (col("u.n") =!= col("b1") || col("u.n_uniq") =!= col("b2"))).isEmpty,
      "RegexTokenStatsExpr diverges from regexp_extract_all")
    assert(via.filter(col("b1").isNull && col("u").isNotNull).isEmpty)
  }

  test("token/bigram generators match explode-of-split row-for-row in order") {
    import graft.functions.{BigramsGenerator, TokensGenerator}
    val t = tokenEdgeTexts.coalesce(1)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)

    // raw tokens (d20's shape: empties kept)
    assert(rows(t.select(col("id"),
        TokensGenerator.explodeTokens(col("text"), skipEmpty = false).as("token"))) ===
      rows(t.select(col("id"), explode(TextFunctions.tokens(col("text"))).as("token"))))
    // non-empty tokens (the d28/d33/d39/d48/d52 shape)
    assert(rows(t.select(col("id"),
        TokensGenerator.explodeTokens(col("text"), skipEmpty = true).as("token"))) ===
      rows(t.select(col("id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")))
    // raw adjacent pairs, both-non-empty (the d44 shape)
    val d44 = t.select(col("id"), split(col("text"), " ").as("t"))
      .select(col("id"), explode(when(size(col("t")) >= 2, expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    assert(rows(t.select(col("id"),
        BigramsGenerator.explodeBigrams(col("text"), filtered = false).as(Seq("w1", "w2")))) ===
      rows(d44))
    // pairs over the empty-filtered stream (the d40 shape)
    val d40 = t.select(col("id"),
        filter(split(col("text"), " "), x => x =!= "").as("a"))
      .select(col("id"), explode(expr(
        "zip_with(slice(a, 1, greatest(size(a)-1, 0)), " +
        "slice(a, 2, greatest(size(a)-1, 0)), (x, y) -> struct(x AS w1, y AS w2))")).as("p"))
      .select(col("id"), col("p.w1"), col("p.w2"))
    assert(rows(t.select(col("id"),
        BigramsGenerator.explodeBigrams(col("text"), filtered = true).as(Seq("w1", "w2")))) ===
      rows(d40))
  }

  test("span-scrub expression is bit-identical to the zip_with/filter/array_join chain") {
    import graft.SparkSpec.spark.implicits._
    val window = 16
    // (text, sorted drop starts): no drops, one window, overlapping
    // windows, window past the end, all tokens covered, empty text,
    // empties from doubled spaces, multi-byte
    val rnd = new scala.util.Random(7)
    val base = tokenEdgeTexts.filter(col("text").isNotNull)
      .collect().map(_.getString(1))
    val cases = base.flatMap { t =>
      val n = t.split(" ", -1).length
      Seq(
        (t, Seq.empty[Int]),
        (t, Seq(1)),
        (t, Seq(1, 5, 9)),
        (t, Seq(math.max(1, n - 3))),
        (t, (1 to n by 7).toSeq),
        (t, Seq.fill(3)(rnd.nextInt(math.max(1, n)) + 1).distinct.sorted))
    }
    val df = cases.toSeq.toDF("__text", "__drops")
    val old = df.withColumn("__kept", expr(
        s"""filter(zip_with(split(__text, ' '), sequence(1, size(split(__text, ' '))),
           | (t, p) -> named_struct('t', t, 'p', p)),
           | s -> NOT exists(__drops, i -> i <= s.p AND s.p <= i + ${window - 1}))"""
          .stripMargin.replace("\n", " ")))
      .select(
        expr("array_join(transform(__kept, s -> s.t), ' ')").as("text"),
        expr("size(split(__text, ' '))").as("n_tokens"),
        (expr("size(split(__text, ' '))") - size(col("__kept"))).as("n_removed"))
    val via = df.withColumn("__s",
        graft.functions.ScrubSpansExpr.scrub(col("__text"), col("__drops"), window))
      .select(col("__s.cleaned").as("text"), col("__s.n_tokens").as("n_tokens"),
        col("__s.n_removed").as("n_removed"))
    assert(via.exceptAll(old).isEmpty && old.exceptAll(via).isEmpty,
      "ScrubSpansExpr diverges from the HOF chain")
  }

  test("winnow prefix-cap contract: docs sharing the first FingerprintMaxChars " +
    "chars fingerprint identically BY DESIGN; shorter docs see no cap") {
    import graft.SparkSpec.spark.implicits._
    val cap = TextFunctions.FingerprintMaxChars
    val prefix = "abcdefghij " * ((cap / 11) + 2) // > cap chars
    // two oversized docs equal through the cap, wildly different tails
    val over1 = prefix + " tail one entirely different"
    val over2 = prefix + " ANOTHER TAIL 999 zzz"
    // a short doc vs the same doc with one char appended: both under
    // the cap, so the tail MUST change the fingerprint set
    val short1 = "the quick brown fox jumps over the lazy dog " * 10
    val short2 = short1 + "!"
    val fps = Seq(over1, over2, short1, short2).toDF("text")
      .select(graft.functions.WinnowExpr.winnow(col("text"), 8, 4).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(fps(0) === fps(1),
      "oversized docs with a shared cap-length prefix must fingerprint identically " +
        "(the documented recall trade of prefix fingerprinting)")
    assert(fps(2) !== fps(3), "under-cap docs must see their full text")
    // and the cap constant is the single shared source for the DuckDB
    // twin (TextFunctions.gramHashes inlines the same value)
    assert(TextFunctions.gramHashes("text", 8).toString.contains(cap.toString))
  }

  test("CJK posture (SURVEY §2 contract): word shingles degrade to whole-line " +
    "grains on unsegmented text; the char-gram winnow path still discriminates") {
    import graft.SparkSpec.spark.implicits._
    // two CJK documents, no space delimiters: a long shared substring
    // (a mirrored passage) plus distinct tails
    val shared = "深度学习模型的训练数据需要大规模的去重处理以提升模型质量和泛化能力" * 6
    val doc1 = shared + "第一篇文档的独特结尾内容包含不同的表述方式"
    val doc2 = shared + "第二篇文章完全不同的末尾部分讨论другие主题"
    val df = Seq(doc1, doc2).toDF("text")
    // word-level: the whole document is ONE token, so 3-shingles are
    // EMPTY — word-shingle dedup is structurally blind here (the
    // documented degradation)
    val sh = df.select(ShinglesExpr.shinglesFromText(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh.forall(_.isEmpty),
      "unsegmented CJK text must produce zero word-shingles (one token)")
    // char-gram level: winnowing guarantees a shared fingerprint for
    // any common substring >= w + k - 1 = 11 chars, script-agnostic —
    // the shared passage overlaps, the distinct tails differ
    val fps = df.select(graft.functions.WinnowExpr.winnow(col("text"), 8, 4).as("w"))
      .collect().map(_.getSeq[String](0).toSet)
    assert((fps(0) & fps(1)).nonEmpty,
      "shared CJK passage must share winnow fingerprints")
    assert(fps(0) != fps(1),
      "documents with distinct tails must not fingerprint identically")
  }

  test("TextStatsExpr is bit-identical to the length-diff/regexp formulations") {
    import graft.SparkSpec.spark.implicits._
    import graft.functions.TextStatsExpr
    // markers: duplicates across "profiles" (de twice), multibyte
    // (się), plus the en trio; texts stress the non-overlapping
    // replace semantics (runs of adjacent equal stopwords consume
    // their shared delimiter space: k adjacent → ceil(k/2) matches)
    val markers = Seq("the", "and", "with", "się", "de", "de")
    val texts = Seq(
      "the quick the the brown the  the fox and with and",
      "the the", "the the the", "the the the the", "the  the",
      " the cat", "cat the ", "the", "", "a  b c   d",
      "się może się się w tym de de de",
      "digits 123 and punct!!! mixed 世界 é ok with tabs\tand the end",
      (Seq.fill(300)("the and with rep") :+ "the the the").mkString(" "),
      null: String
    ).toDF("text")
    val padded = texts.withColumn("__pt", concat(lit(" "), col("text"), lit(" ")))
    val refMarkerCols = markers.zipWithIndex.map { case (w, i) =>
      TextFunctions.occurrences("__pt", s" $w ").as(s"ref_$i") }
    def assertIdentical(df: org.apache.spark.sql.DataFrame): Unit = {
      val via = df.select(Seq(
        TextStatsExpr.stats(col("text"), markers).as("ts"),
        length(col("text")).as("r_chars"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).as("r_alpha"),
        length(regexp_replace(col("text"), "[^0-9]", "")).as("r_digit"),
        (length(col("text")) - length(expr("replace(text, ' ', '')"))).as("r_space"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).as("r_punct")
      ) ++ refMarkerCols: _*)
      assert(via.filter(col("r_chars").isNull =!= col("ts").isNull).isEmpty,
        "null text must yield null stats (and only then)")
      for ((f, r) <- Seq("n_chars" -> "r_chars", "n_alpha" -> "r_alpha",
          "n_digit" -> "r_digit", "n_space" -> "r_space")) {
        assert(via.filter(col(s"ts.$f") =!= col(r)).isEmpty,
          s"TextStatsExpr.$f diverges from the length/regexp formulation")
      }
      assert(via.filter(col("ts.n_chars") - col("ts.n_alpha") - col("ts.n_digit")
          - col("ts.n_space") =!= col("r_punct")).isEmpty,
        "derived n_punct diverges from regexp_replace([a-zA-Z0-9 ])")
      markers.indices.foreach { i =>
        assert(via.filter(element_at(col("ts.marker_counts"), i + 1)
            .cast("double") =!= col(s"ref_$i")).isEmpty,
          s"marker count for '${markers(i)}' diverges from the " +
            "non-overlapping length-diff replace count")
      }
    }
    assertIdentical(padded)
    // the real corpus, full 10-language × 15-word profile table
    val docs = sources.TableCatalog(spark, sf).documents
      .select(col("text"))
      .withColumn("__pt", concat(lit(" "), col("text"), lit(" ")))
    val allWords = queries.TextSim.langProfiles.flatMap(_._2)
    val refAll = allWords.zipWithIndex.map { case (w, i) =>
      TextFunctions.occurrences("__pt", s" $w ").as(s"ra_$i") }
    val corpus = docs.select(
      TextStatsExpr.stats(col("text"), allWords).as("ts") +: refAll: _*)
    allWords.indices.foreach { i =>
      assert(corpus.filter(element_at(col("ts.marker_counts"), i + 1)
          .cast("double") =!= col(s"ra_$i")).isEmpty,
        s"corpus marker count diverges for '${allWords(i)}'")
    }
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
