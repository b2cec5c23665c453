package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Classification correctness of the widened language-ID over GENUINE
  * multilingual paragraphs — one per supported language (22: 12 token-
  * marker Latin-script + 10 script-range). The argmax must name each
  * paragraph's language despite cross-language marker collisions ("de" in
  * es/nl, kana vs kanji, etc.); und for marker-free text.
  */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = Tables.localSession(4, "graft-test")

  private val paragraphs: Seq[(String, String)] = Seq(
    "en" -> "the cat sat on the mat and it is a test of the engine",
    "es" -> "el perro y la casa de que los gatos y el sol de madrid",
    "fr" -> "le chat est dans une maison avec les arbres et des fleurs",
    "de" -> "der hund und die katze ist ein haus und das auto",
    "it" -> "il cane di che casa per con una strada di roma",
    "pt" -> "o gato e os livros em uma casa como não sei dizer",
    "nl" -> "het huis is een boom van hout en dat is niet goed",
    "pl" -> "i w na się jest nie dom kot w mieście",
    "sv" -> "och att det som en katt är på ett hus",
    "tr" -> "bir ev ve bu kedi için da ne güzel bir gün",
    "id" -> "yang dan di itu rumah dengan untuk kucing dan anjing",
    "vi" -> "của và các là có không nhà mèo và chó",
    "zh" -> "数据处理引擎是分布式计算系统的核心组件之一",
    "ja" -> "これはテストです データのエンジンをしらべます",
    "ko" -> "이것은 데이터 처리 엔진의 테스트입니다",
    "ru" -> "это тестовый документ для обработки данных",
    "ar" -> "هذا اختبار لمحرك معالجة البيانات الموزعة",
    "he" -> "זהו מסמך בדיקה לעיבוד נתונים",
    "el" -> "αυτό είναι ένα δοκιμαστικό έγγραφο για δεδομένα",
    "hi" -> "यह डेटा प्रोसेसिंग इंजन का परीक्षण है",
    "th" -> "นี่คือการทดสอบเอกสารสำหรับข้อมูล",
    "bn" -> "এটি একটি পরীক্ষামূলক নথি")

  test("every supported language's genuine paragraph classifies correctly") {
    import spark.implicits._
    assert(paragraphs.map(_._1).sorted == TextFunctions.LangNames.sorted,
      "spec must cover exactly the supported language set")
    val got = paragraphs.toDF("want", "text")
      .select(col("want"), TextFunctions.langId(col("text")).as("pred"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val wrong = got.filter { case (w, p) => w != p }
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
  }

  test("marker-free and empty text stay und") {
    import spark.implicits._
    val preds = Seq("", "   ", "qqq zzz www", "12345 67890", "🚀🚀🚀")
      .toDF("text")
      .select(TextFunctions.langId(col("text")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(preds.forall(_ == "und"), preds.mkString(","))
  }
}
