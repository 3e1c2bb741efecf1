package graft.core

/** X14: language identification, following the reference's in-crawl
  * pipeline shape (`XmlDoc::getLangId`, XmlDoc.cpp:7177-7265 →
  * `setLangVec` in Words.cpp + `computeLangId` XmlDoc.cpp:7267-7322):
  *
  *  1. per-word language vector: digit-led words → translingual; words
  *     whose dictionary membership names exactly ONE language → that
  *     language; ≥2 → unknown; otherwise script detection
  *     (`getCharacterLanguage`, Words.cpp:1060-1079).
  *  2. 5-word-window smoothing: intersect the membership bits of each
  *     sliding window; a unique surviving language claims the window's
  *     still-unknown words (the reference also has a sentence-level pass
  *     that needs Sections — not ported; the window pass is the one that
  *     fires without sections, Words.cpp setLangVec third loop).
  *  3. majority vote over the vector, skipping url-ish words and
  *     translingual (computeLangId).
  *
  * Language ids and abbreviations are the reference's exact tables
  * (Lang.h:17-77 enum, Lang.cpp:161-196 s_langAbbr).
  *
  * DOCUMENTED DIVERGENCE: the reference's word→languages map is
  * `g_speller.getLangBits64` — a wiktionary-derived dictionary shipped
  * as a runtime data file that is NOT in the reference repo. This port
  * substitutes a curated high-frequency function-word dictionary for the
  * latin-script languages and extends `getCharacterLanguage`'s script
  * mapping to the scripts the reference could only reach through that
  * dictionary (CJK, kana, hangul, thai, devanagari → ja/zh/ko/th/hi).
  * The ALGORITHM (unique-membership voting, window smoothing, majority
  * vote) is the reference's.
  */
object GbLang {

  // Lang.h:17-77
  val langUnknown = 0
  val langEnglish = 1
  val langRussian = 4
  val langJapanese = 6
  val langChineseTrad = 7
  val langChineseSimp = 8
  val langKorean = 9
  val langArabic = 18
  val langHebrew = 19
  val langGreek = 21
  val langThai = 22
  val langHindi = 23
  val langTranslingual = 31
  val MaxLanguages = 64 // Lang.h:9

  // Lang.cpp:161-196 (s_langAbbr), verbatim order
  val abbrs: Array[String] = Array(
    "xx", "en", "fr", "es", "ru", "tr", "ja", "zh_tw", "zh_cn", "ko", "de", "nl",
    "it", "fi", "sv", "no", "pt", "vi", "ar", "he", "id", "el", "th", "hi",
    "bn", "pl", "tl",
    "la", "eo", "ca", "bg", "tx", "sr", "hu", "da", "lt", "cs", "gl", "ka",
    "gd", "go", "ro", "ga", "lv", "hy", "is", "ag", "gv", "io", "fa", "te",
    "vv", "mg", "ku", "lb", "et")

  def abbr(langId: Int): String =
    if (langId >= 0 && langId < abbrs.length) abbrs(langId) else "xx"

  private def id(ab: String): Int = abbrs.indexOf(ab)

  /** Function-word lists standing in for the wiktionary dictionary.
    * High-frequency closed-class words; overlaps across languages are
    * EXPECTED and handled by the ≥2-membership → unknown rule plus the
    * window pass, exactly like the reference's wiktionary overlaps. */
  private val wordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "with", "as", "his", "they", "are", "this", "have", "from", "not", "but",
      "what", "were", "when", "your", "which", "their", "will", "would", "there",
      "been", "has", "more", "who", "its", "page", "about", "into", "than", "them"),
    "fr" -> Seq("de", "le", "la", "les", "des", "une", "et", "est", "dans", "pour",
      "que", "qui", "sur", "avec", "pas", "sont", "aux", "ce", "cette", "ses",
      "mais", "ou", "donc", "ils", "elles", "nous", "vous", "leurs", "être",
      "fait", "tout", "aussi", "très", "bien", "deux", "entre", "après"),
    "es" -> Seq("de", "la", "el", "los", "las", "una", "y", "es", "en", "por", "con",
      "para", "del", "se", "su", "al", "lo", "como", "más", "pero", "sus",
      "le", "ya", "este", "sí", "porque", "esta", "son", "entre", "cuando",
      "muy", "sin", "sobre", "también", "hasta", "hay", "donde", "quien"),
    "tr" -> Seq("bir", "ve", "bu", "da", "de", "için", "ile", "olarak", "daha",
      "çok", "gibi", "kadar", "sonra", "ama", "var", "olan", "her", "ne",
      "iki", "ancak", "göre", "yeni", "aynı", "hem", "şey"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im",
      "für", "auf", "dem", "nicht", "ein", "eine", "als", "auch", "aus", "bei",
      "nach", "wird", "sind", "noch", "wie", "einer", "über", "zum", "nur",
      "werden", "durch", "kann", "wenn", "sich", "dass", "oder", "aber"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "op", "te", "zijn",
      "met", "voor", "niet", "aan", "er", "maar", "als", "dan", "ook", "door",
      "naar", "bij", "uit", "nog", "worden", "wordt", "deze", "heeft", "werd"),
    "it" -> Seq("il", "di", "che", "la", "per", "un", "una", "con", "del",
      "non", "sono", "nel", "alla", "più", "come", "anche", "dei", "delle",
      "questo", "questa", "gli", "ma", "della", "essere", "stato", "dalla"),
    "fi" -> Seq("ja", "on", "ei", "että", "oli", "mutta", "hän", "joka",
      "sen", "kun", "myös", "niin", "ovat", "sekä", "tai", "jos", "vain",
      "kuin", "mukaan", "vuonna", "ole", "siis", "tämä", "voi"),
    "sv" -> Seq("och", "att", "det", "som", "en", "av", "för", "med", "till",
      "den", "inte", "har", "ett", "om", "var", "men", "från", "vid", "kan",
      "också", "efter", "eller", "ska", "skulle", "sig", "han"),
    "no" -> Seq("og", "det", "som", "en", "av", "til", "for", "med", "ikke",
      "har", "de", "om", "et", "men", "var", "fra", "ved", "kan", "også",
      "etter", "eller", "skal", "ble", "seg", "han", "hun"),
    "pt" -> Seq("de", "o", "a", "os", "as", "um", "uma", "e", "do", "da", "dos",
      "das", "em", "no", "na", "nos", "nas", "por", "para", "com", "não",
      "mais", "como", "mas", "foi", "ao", "seu", "sua", "ou", "ser", "são",
      "pelo", "pela", "também", "já", "está", "entre", "quando"),
    "vi" -> Seq("và", "của", "là", "có", "được", "trong", "cho", "không",
      "những", "với", "này", "các", "một", "người", "khi", "đã", "để",
      "trên", "theo", "về", "như", "từ", "tại", "ra"),
    "id" -> Seq("yang", "dan", "di", "ini", "itu", "dengan", "untuk", "tidak",
      "dari", "dalam", "akan", "pada", "juga", "ke", "karena", "ada", "mereka",
      "sudah", "saya", "kita", "atau", "bisa", "tersebut", "oleh"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "jest", "do", "że", "z",
      "jak", "po", "co", "tak", "ale", "przez", "już", "być", "tego", "tym",
      "który", "która", "oraz", "dla", "przy", "może", "są"),
    "ca" -> Seq("i", "el", "la", "els", "les", "amb", "per", "una", "que",
      "dels", "com", "més", "aquest", "aquesta", "seva", "ha", "va", "també",
      "són", "però", "fins", "entre", "sense"),
    "hu" -> Seq("a", "az", "és", "hogy", "nem", "is", "egy", "van", "volt",
      "meg", "ez", "de", "el", "már", "csak", "mint", "még", "ki", "vagy",
      "lehet", "minden", "nagy", "kell", "után"),
    "da" -> Seq("og", "det", "at", "en", "den", "til", "er", "som", "af",
      "for", "med", "ikke", "har", "et", "om", "men", "var", "fra", "ved",
      "kan", "også", "efter", "eller", "skal", "blev", "sig"),
    "cs" -> Seq("a", "se", "na", "je", "v", "že", "s", "z", "do", "to",
      "jako", "ale", "i", "pro", "tak", "po", "byl", "byla", "jsou", "nebo",
      "podle", "při", "také", "však", "který", "které"),
    "ro" -> Seq("și", "de", "la", "a", "în", "cu", "pe", "care", "este",
      "pentru", "mai", "din", "sau", "fost", "sunt", "dar", "când", "fi",
      "acest", "această", "după", "până", "între", "unui"),
    "et" -> Seq("ja", "on", "ei", "et", "oli", "ka", "aga", "see", "oma",
      "kui", "ning", "või", "mis", "siis", "ta", "seda", "kes", "üle", "välja"))

  /** word (lowercased) → language-membership bitmask (bit N-1 = langId
    * N, matching getLangBits64's "bit #0 is english" layout). */
  private val dict: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    wordLists.foreach { case (ab, words) =>
      val lid = id(ab)
      require(lid > 0, s"unknown abbr $ab")
      val bit = 1L << (lid - 1)
      words.foreach { w =>
        val k = w.toLowerCase
        m.put(k, m.getOrDefault(k, 0L) | bit)
      }
    }
    m
  }

  @inline def langBits(word: String): Long = dict.getOrDefault(word, 0L)

  @inline private def bitCount(x: Long): Int = java.lang.Long.bitCount(x)
  @inline private def bitPos(x: Long): Int = java.lang.Long.numberOfTrailingZeros(x)

  /** getCharacterLanguage (Words.cpp:1060-1079) extended per the header
    * divergence note: the reference's 4 script cases plus the scripts it
    * reaches through the wiktionary. ASCII → unknown, like the ref. */
  def characterLanguage(cp: Int): Int = {
    if (cp < 0x80) return langUnknown
    if (cp >= 0x0600 && cp <= 0x06ff) return langArabic
    if (cp >= 0x0400 && cp <= 0x04ff) return langRussian
    if (cp >= 0x0590 && cp <= 0x05ff) return langHebrew
    if (cp >= 0x0370 && cp <= 0x03ff) return langGreek
    // dictionary-reached scripts (divergence, documented above)
    if (cp >= 0x3040 && cp <= 0x30ff) return langJapanese // kana
    if (cp >= 0xac00 && cp <= 0xd7af) return langKorean // hangul
    if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf))
      return langChineseSimp // han (the ref's dict marks zh)
    if (cp >= 0x0e00 && cp <= 0x0e7f) return langThai
    if (cp >= 0x0900 && cp <= 0x097f) return langHindi
    langUnknown
  }

  /** One tokenized word: the lowercased token, whether it starts with a
    * digit, the first codepoint, and whether it looks url-ish (adjacent
    * to '/' or '?', computeLangId's skip rules XmlDoc.cpp:7293-7305). */
  final case class Tok(word: String, digitLed: Boolean, firstCp: Int, urlish: Boolean)

  /** Tokenize text into alnum-run words with the url-ish context flags. */
  def tokenize(text: String, maxWords: Int = 4000): Array[Tok] = {
    val out = new scala.collection.mutable.ArrayBuffer[Tok](256)
    var i = 0
    val n = text.length
    while (i < n && out.length < maxWords) {
      val cp = text.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        val start = i
        while (i < n && Character.isLetterOrDigit(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
        val prev = if (start > 0) text.charAt(start - 1) else ' '
        val next = if (i < n) text.charAt(i) else ' '
        val nextNext = if (i + 1 < n) text.charAt(i + 1) else ' '
        val urlish = prev == '/' || prev == '?' || next == '/' ||
          ((next == '.' || next == '?') && Character.isLetterOrDigit(nextNext))
        out += Tok(text.substring(start, i).toLowerCase, Character.isDigit(text.charAt(start)),
          text.codePointAt(start), urlish)
      } else i += Character.charCount(cp)
    }
    out.toArray
  }

  /** setLangVec first pass + the 5-word window pass. */
  def langVector(toks: Array[Tok]): Array[Int] = {
    val lv = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      lv(i) =
        if (t.digitLed) langTranslingual
        else {
          val bits = langBits(t.word)
          val c = bitCount(bits)
          if (c == 1) bitPos(bits) + 1
          else if (c >= 2) langUnknown
          else characterLanguage(t.firstCp)
        }
      i += 1
    }
    // 5-word window smoothing (setLangVec third loop): intersect the
    // bits of the last 5 dictionary-known words; a unique survivor
    // claims the window
    val window = new Array[Long](5)
    val wpos = new Array[Int](5)
    var wp = 0
    var total = 0
    i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.digitLed && t.word.nonEmpty) {
        val bits = langBits(t.word)
        if (bits != 0L) {
          window(wp) = bits
          wpos(wp) = i
          wp = (wp + 1) % 5
          total += 1
          if (total >= 5) {
            var acc = -1L
            var j = 0
            while (j < 5) { acc &= window(j); j += 1 }
            if (acc != 0L && bitCount(acc) == 1) {
              val lid = bitPos(acc) + 1
              j = 0
              while (j < 5) {
                if (lv(wpos(j)) == langUnknown) lv(wpos(j)) = lid
                j += 1
              }
            }
          }
        }
      }
      i += 1
    }
    lv
  }

  /** computeLangId (XmlDoc.cpp:7267-7322): majority vote, skipping
    * url-ish words, unknown and translingual. */
  def computeLangId(toks: Array[Tok], lv: Array[Int]): Int = {
    val counts = new Array[Int](MaxLanguages)
    var i = 0
    while (i < toks.length) {
      if (!toks(i).urlish) {
        val l = lv(i)
        if (l >= 0 && l < MaxLanguages) counts(l) += 1
      }
      i += 1
    }
    var max = 0
    var maxi = 0
    i = 1
    while (i < MaxLanguages) {
      if (i != langTranslingual && counts(i) > max) { max = counts(i); maxi = i }
      i += 1
    }
    maxi
  }

  /** Document language id over extracted text. */
  def docLangId(text: String): Int = {
    val toks = tokenize(text)
    computeLangId(toks, langVector(toks))
  }

  def docLangAbbr(text: String): String = abbr(docLangId(text))
}
