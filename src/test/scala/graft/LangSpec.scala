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
      6L  -> "uma casa bonita para morar que não fica muito longe como isso",
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

  test("deep profiles classify docs the old 3-word profiles could not") {
    import graft.SparkSpec.spark.implicits._
    // Round-5 state: 3 stopwords per language. These sentences are
    // real-ish text that avoids every shallow word but hits several
    // deep-profile words — the capability gap the deepening closes.
    val shallow: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "with"), "es" -> Seq("los", "las", "una"),
      "fr" -> Seq("les", "des", "une"), "de" -> Seq("der", "und", "nicht"),
      "it" -> Seq("che", "della", "sono"), "pt" -> Seq("uma", "para", "como"),
      "nl" -> Seq("het", "een", "niet"), "sv" -> Seq("och", "att", "som"),
      "pl" -> Seq("jest", "przez", "czy"), "id" -> Seq("yang", "dan", "untuk"))
    val corpus = Seq(
      1L -> "pero hay que hablar más despacio para entender este idioma",   // es
      2L -> "wir haben auch nach langer zeit noch keine antwort bekommen",  // de
      3L -> "hon har inte sett den filmen eller boken efter festen",        // sv
      4L -> "mereka tidak akan datang karena sudah terlalu malam"           // id
    ).toDF("doc_id", "text")
    val shallowPred = TextSim.langScore(corpus, shallow)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val deepPred = TextSim.langScore(corpus)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Every doc defeats the shallow profiles...
    val expected = Map(1L -> "es", 2L -> "de", 3L -> "sv", 4L -> "id")
    expected.foreach { case (id, lang) =>
      assert(shallowPred(id) !== lang,
        s"doc $id: shallow profiles unexpectedly got $lang right") }
    // ...and the deep profiles classify all of them correctly.
    assert(deepPred === expected)
  }
}
