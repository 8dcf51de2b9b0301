package graft.functions

/** Porter stemming algorithm (M.F. Porter, 1980, public domain algorithm;
  * implemented from the published description at tartarus.org/martin/
  * PorterStemmer). This is the semantic equivalent of the reference's
  * `english_stemmer` token filter (kuko6/tweets-elastic
  * `src/config/settings.json:64-67`) used by the `englando` analyzer
  * (`settings.json:9-19`).
  *
  * Pure function on a lowercase word; used from the codegen'd Catalyst
  * expression [[graft.functions.expressions.PorterStem]].
  */
object PorterStemmer {

  @inline private def isVowel(w: CharSequence, i: Int): Boolean =
    w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y'                         => i > 0 && !isVowel(w, i - 1)
      case _                           => false
    }

  /** Porter's measure m: number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: CharSequence): Int = {
    var n = 0
    var i = 0
    val len = w.length
    while (i < len && !isVowel(w, i)) i += 1
    while (i < len) {
      while (i < len && isVowel(w, i)) i += 1
      if (i < len) {
        n += 1
        while (i < len && !isVowel(w, i)) i += 1
      }
    }
    n
  }

  private def containsVowel(w: CharSequence): Boolean = {
    var i = 0
    while (i < w.length) { if (isVowel(w, i)) return true; i += 1 }
    false
  }

  /** *d — ends with a double consonant. */
  private def endsDoubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w(n - 1) == w(n - 2) && !isVowel(w, n - 1)
  }

  /** *o — ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
    "wxy".indexOf(w(n - 1)) < 0
  }

  /** Replace suffix if condition on the stem holds; None = rule not fired. */
  private def rule(w: String, suffix: String, repl: String,
                   cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w) // suffix matched: step rule consumed
    } else None

  private def firstOf(w: String, rules: Seq[(String, String, String => Boolean)]): String =
    rules.iterator
      .map { case (s, r, c) => rule(w, s, r, c) }
      .collectFirst { case Some(x) => x }
      .getOrElse(w)

  private val always: String => Boolean = _ => true
  private def mGt(k: Int): String => Boolean = s => measure(s) > k

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word

    // Step 1a
    w = firstOf(w, Seq(
      ("sses", "ss", always),
      ("ies", "i", always),
      ("ss", "ss", always),
      ("s", "", always)))

    // Step 1b
    var step1bFired = false
    if (w.endsWith("eed")) {
      val stem = w.substring(0, w.length - 3)
      if (measure(stem) > 0) w = stem + "ee"
    } else if (w.endsWith("ed")) {
      val stem = w.substring(0, w.length - 2)
      if (containsVowel(stem)) { w = stem; step1bFired = true }
    } else if (w.endsWith("ing")) {
      val stem = w.substring(0, w.length - 3)
      if (containsVowel(stem)) { w = stem; step1bFired = true }
    }
    if (step1bFired) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
      else if (endsDoubleConsonant(w) && "lsz".indexOf(w.last) < 0)
        w = w.substring(0, w.length - 1)
      else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.substring(0, w.length - 1)))
      w = w.substring(0, w.length - 1) + "i"

    // Step 2 (condition: m(stem) > 0)
    w = firstOf(w, Seq(
      ("ational", "ate", mGt(0)), ("tional", "tion", mGt(0)),
      ("enci", "ence", mGt(0)), ("anci", "ance", mGt(0)),
      ("izer", "ize", mGt(0)), ("abli", "able", mGt(0)),
      ("alli", "al", mGt(0)), ("entli", "ent", mGt(0)),
      ("eli", "e", mGt(0)), ("ousli", "ous", mGt(0)),
      ("ization", "ize", mGt(0)), ("ation", "ate", mGt(0)),
      ("ator", "ate", mGt(0)), ("alism", "al", mGt(0)),
      ("iveness", "ive", mGt(0)), ("fulness", "ful", mGt(0)),
      ("ousness", "ous", mGt(0)), ("aliti", "al", mGt(0)),
      ("iviti", "ive", mGt(0)), ("biliti", "ble", mGt(0))))

    // Step 3 (condition: m(stem) > 0)
    w = firstOf(w, Seq(
      ("icate", "ic", mGt(0)), ("ative", "", mGt(0)),
      ("alize", "al", mGt(0)), ("iciti", "ic", mGt(0)),
      ("ical", "ic", mGt(0)), ("ful", "", mGt(0)),
      ("ness", "", mGt(0))))

    // Step 4 (condition: m(stem) > 1; "ion" additionally needs stem ending s|t)
    w = firstOf(w, Seq(
      ("ement", "", mGt(1)),
      ("ance", "", mGt(1)), ("ence", "", mGt(1)),
      ("able", "", mGt(1)), ("ible", "", mGt(1)),
      ("ment", "", mGt(1)),
      ("ant", "", mGt(1)), ("ent", "", mGt(1)),
      ("ion", "", (s: String) => measure(s) > 1 && s.nonEmpty &&
        (s.last == 's' || s.last == 't')),
      ("ism", "", mGt(1)), ("ate", "", mGt(1)), ("iti", "", mGt(1)),
      ("ous", "", mGt(1)), ("ive", "", mGt(1)), ("ize", "", mGt(1)),
      ("al", "", mGt(1)), ("er", "", mGt(1)), ("ic", "", mGt(1)),
      ("ou", "", mGt(1))))

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.substring(0, w.length - 1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.last == 'l')
      w = w.substring(0, w.length - 1)

    w
  }
}
