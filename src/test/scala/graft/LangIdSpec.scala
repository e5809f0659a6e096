package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Head-to-head accuracy: trained char-trigram language ID vs the
  * stopword-profile heuristic, on (a) held-out sentences in each profile
  * language — none shared with TrigramLangId.TrainCorpus — and (b) a slice
  * of the synthetic corpus, whose text is English vocabulary for every
  * `lang` label (SURVEY.md §8.4), so its text-truth is "en". */
class LangIdSpec extends AnyFunSuite with SparkTestBase {

  private val heldOut: Seq[(String, String)] = Seq(
    "en" -> "a small group of students walked slowly toward the library",
    "en" -> "everyone agreed that the meeting should start earlier next week",
    "en" -> "the river flows through the valley and past the small village",
    "en" -> "i cannot remember where i left my keys yesterday evening",
    "de" -> "eine kleine gruppe von studenten ging langsam zur bibliothek",
    "de" -> "alle waren sich einig dass das treffen naechste woche frueher beginnen sollte",
    "de" -> "der fluss fliesst durch das tal und an dem kleinen dorf vorbei",
    "de" -> "ich kann mich nicht erinnern wo ich gestern abend meine schluessel gelassen habe",
    "fr" -> "un petit groupe etudiants marchait lentement vers la bibliotheque",
    "fr" -> "tout le monde est accord pour que la reunion commence plus tot la semaine prochaine",
    "fr" -> "la riviere coule a travers la vallee et passe le petit village",
    "fr" -> "je ne me souviens pas ou ai laisse mes cles hier soir",
    "es" -> "un pequeno grupo de estudiantes caminaba despacio hacia la biblioteca",
    "es" -> "todos estuvieron de acuerdo en que la reunion deberia empezar antes la proxima semana",
    "es" -> "el rio fluye por el valle y pasa junto al pequeno pueblo",
    "es" -> "no recuerdo donde deje mis llaves ayer por la tarde",
    "zh" -> "yi xiao qun xue sheng man man de zou xiang tu shu guan",
    "zh" -> "da jia dou tong yi xia zhou de hui yi ying gai zao dian kai shi",
    "zh" -> "he shui liu guo shan gu jing guo xiao cun zi",
    "zh" -> "wo bu ji de zuo tian wan shang ba yao shi fang zai na li le")

  private def accuracy(detected: Map[Long, String], truth: Map[Long, String]): Double =
    truth.count { case (id, lang) => detected.get(id).contains(lang) }.toDouble / truth.size

  test("trigram language ID beats the stopword heuristic on held-out non-English text") {
    import spark.implicits._
    val df = heldOut.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "true_lang", "text")
    val truth = heldOut.zipWithIndex.map { case ((lang, _), i) => i.toLong -> lang }.toMap
    val tri = TextAnalysis.languageIdTrigramOn(spark, df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = TextAnalysis.languageIdOn(spark, df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val triAcc = accuracy(tri, truth)
    val stopAcc = accuracy(stop, truth)
    assert(triAcc >= 0.9, s"trigram accuracy $triAcc below 0.9 on held-out sentences")
    assert(triAcc >= stopAcc, s"trigram $triAcc must be >= stopword $stopAcc")
  }

  test("trigram language ID reports 'und', not an arbitrary tie-winner, on out-of-vocabulary scripts") {
    import spark.implicits._
    val df = Seq(
      (0L, "αλφα βητα γαμμα δελτα εψιλον ζητα ηλιος θαλασσα"), // Greek
      (1L, "шапка молоко собака якорь прогулка вечер дорога"), // Cyrillic
      (2L, "a plain english sentence about the weather today")) // in-vocab control
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageIdTrigramOn(spark, df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(0L) == ("und", 0.0), s"Greek doc: ${got(0L)}")
    assert(got(1L) == ("und", 0.0), s"Cyrillic doc: ${got(1L)}")
    assert(got(2L)._1 == "en", s"control doc: ${got(2L)}")
  }

  test("trigram language ID matches the stopword heuristic on synthetic corpus docs") {
    // every synthetic doc's TEXT is English-vocabulary regardless of its
    // lang label, so text-truth here is "en" for both classifiers
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text")).limit(200)
    val n = docs.count().toDouble
    val triEn = TextAnalysis.languageIdTrigramOn(spark, docs).collect()
      .count(_.getString(1) == "en") / n
    val stopEn = TextAnalysis.languageIdOn(spark, docs).collect()
      .count(_.getString(1) == "en") / n
    assert(triEn >= 0.9, s"trigram en-rate $triEn below 0.9 on English-vocab synthetic docs")
    assert(triEn >= stopEn - 0.05, s"trigram en-rate $triEn far below stopword $stopEn")
  }
}
