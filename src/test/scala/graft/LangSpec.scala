package graft

import graft.queries.TextSim

/** Planted multilingual corpus for the d05 language-ID scorer. */
class LangSpec extends SparkSpec {

  test("langScore identifies all ten profiled languages and und") {
    import graft.SparkSpec.spark.implicits._
    val corpus = Seq(
      1L  -> "the cat sat on the mat and purred with joy",
      2L  -> "los perros corren por las calles con una pelota",
      3L  -> "les enfants jouent dans des parcs avec une balle",
      4L  -> "der hund lief und bellte nicht im garten",
      5L  -> "penso che della musica italiana ci sono molti stili",
      6L  -> "uma casa bonita para morar como esta",
      7L  -> "het kind speelt met een bal en is niet moe",
      8L  -> "solen och vinden vill att vi ska vara ute som igar",
      9L  -> "to jest dom ktory przez lata stal czy nie",
      10L -> "buku yang bagus dan bermanfaat untuk semua orang",
      11L -> "zzz qqq xxx" // no stopword hits anywhere
    ).toDF("doc_id", "text")
    val got = TextSim.langScore(corpus)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de", 5L -> "it",
      6L -> "pt", 7L -> "nl", 8L -> "sv", 9L -> "pl", 10L -> "id",
      11L -> "und"))
  }
}
