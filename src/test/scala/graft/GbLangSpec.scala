package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbLang

/** X14 language-id pipeline (setLangVec + computeLangId shape; see
  * GbLang header for the documented wiktionary→curated-dict
  * divergence). */
class GbLangSpec extends AnyFunSuite {

  private def lang(text: String): String = GbLang.abbr(GbLang.docLangId(text))

  test("latin-script languages via function words") {
    assert(lang("the quick brown fox jumps over the lazy dog and it was not there") == "en")
    assert(lang("les enfants sont dans le jardin avec leurs amis et ils jouent pour une heure") == "fr")
    assert(lang("los niños están en el jardín con sus amigos y es muy bonito para todos") == "es")
    assert(lang("die Kinder sind mit ihren Freunden im Garten und das ist für alle schön") == "de")
    assert(lang("de kinderen zijn in de tuin met hun vrienden en dat is voor iedereen leuk") == "nl")
    assert(lang("il bambino è nel giardino con i suoi amici e questo è bello per tutti") == "it")
    assert(lang("as crianças estão no jardim com os seus amigos e não é para todos") == "pt")
    assert(lang("barnen är i trädgården med sina vänner och det är inte för alla") == "sv")
    assert(lang("dzieci są w ogrodzie z przyjaciółmi i to nie jest dla wszystkich") == "pl")
    assert(lang("copiii sunt în grădină cu prietenii lor și este pentru toți") == "ro")
  }

  test("script-decided languages (getCharacterLanguage + extensions)") {
    assert(lang("дети в саду со своими друзьями") == "ru")
    assert(lang("الأطفال في الحديقة مع أصدقائهم") == "ar")
    assert(lang("הילדים בגן עם החברים שלהם") == "he")
    assert(lang("τα παιδιά στον κήπο με τους φίλους τους") == "el")
    assert(lang("子供たちは友達と庭にいます、そして天気がいいです") == "ja")
    assert(lang("아이들은 친구들과 정원에 있습니다") == "ko")
    assert(lang("孩子们和朋友们在花园里玩耍") == "zh_cn")
    assert(lang("เด็ก ๆ อยู่ในสวนกับเพื่อน") == "th")
    assert(lang("बच्चे अपने दोस्तों के साथ बगीचे में हैं") == "hi")
  }

  test("ambiguous words resolved by the 5-word window pass") {
    // every word here is in ≥2 lists except the window makes fr unique
    assert(lang("le la les des et le la les des et") == "fr")
  }

  test("unknown for empty/number-only text") {
    assert(GbLang.docLangId("") == GbLang.langUnknown)
    assert(GbLang.docLangId("12345 67890 42") == GbLang.langUnknown)
    assert(GbLang.abbr(GbLang.langUnknown) == "xx")
  }

  test("url-ish words are skipped in the vote (XmlDoc.cpp:7293-7305)") {
    // the only dictionary words sit inside a url path → no vote
    val t = "zqx http://x.test/the/and/of/to/in wvu"
    assert(GbLang.docLangId(t) == GbLang.langUnknown)
  }

  test("abbr table matches the reference order (Lang.cpp:161-196)") {
    assert(GbLang.abbr(0) == "xx")
    assert(GbLang.abbr(1) == "en")
    assert(GbLang.abbr(8) == "zh_cn")
    assert(GbLang.abbr(26) == "tl")
    assert(GbLang.abbr(31) == "tx")
    assert(GbLang.abbr(55) == "et")
  }
}
