package graft.text

/** Porter stemmer (Porter 1980), matching the exact variant embedded in the
  * reference at `DirtDriver.java:106-371` — the classic public-domain
  * "tartarus" formulation. Path keys and therefore every downstream MI /
  * similarity score depend on bit-identical stemming (SURVEY.md §7.5.1), so
  * this reproduces the reference's observable quirks precisely:
  *
  *   - words of length <= 2 are returned unchanged (`:360`);
  *   - no lowercasing: uppercase vowels are treated as consonants by
  *     `cons` (`:147-153`), exactly as in the reference;
  *   - the shared match offset `j` is only updated on a *successful*
  *     suffix match, so measure checks after failed matches use the
  *     previous `j` (`:201-209`);
  *   - in the final e/l cleanup the measure is computed against the `j`
  *     captured *before* a possible e-deletion (`:349-356`).
  *
  * Stateless facade over a per-call worker: thread-safe under Spark's
  * multi-threaded task execution (unlike the reference's reused mutable
  * instance, `:374,482` — SURVEY.md §7.5.7).
  */
object Porter {
  def stem(s: String): String =
    if (s == null || s.isEmpty) "" else new Worker(s.toCharArray).run()

  private final class Worker(b: Array[Char]) {
    private var k = b.length - 1
    private var j = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                          => if (i == 0) true else !cons(i - 1)
      case _                            => true
    }

    /** Measure m() of the stem b[0..j]: number of VC sequences. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(at: Int): Boolean =
      at >= 1 && b(at) == b(at - 1) && cons(at)

    /** cvc(i): b[i-2..i] is consonant-vowel-consonant with the final
      * consonant not w/x/y (so adding 'e' restores a short stem).
      */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    /** True iff b[0..k] ends with s; on success sets j = k - s.length. */
    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    /** Overwrite the suffix after j with s and move k accordingly. */
    private def setTo(s: String): Unit = {
      val o = j + 1
      var i = 0
      while (i < s.length) { b(o + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def replaceIfMeasure(s: String): Unit = if (m() > 0) setTo(s)

    /** Plurals and -ed/-ing (Porter steps 1a + 1b). */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) {
        if (m() > 0) k -= 1
      } else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Terminal y -> i when the stem has a vowel (Porter step 1c). */
    private def step2(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Double-suffix reductions, dispatched on the penultimate char
      * (Porter step 2).
      */
    private def step3(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) replaceIfMeasure("ate")
          else if (ends("tional")) replaceIfMeasure("tion")
        case 'c' =>
          if (ends("enci")) replaceIfMeasure("ence")
          else if (ends("anci")) replaceIfMeasure("ance")
        case 'e' =>
          if (ends("izer")) replaceIfMeasure("ize")
        case 'l' =>
          if (ends("bli")) replaceIfMeasure("ble")
          else if (ends("alli")) replaceIfMeasure("al")
          else if (ends("entli")) replaceIfMeasure("ent")
          else if (ends("eli")) replaceIfMeasure("e")
          else if (ends("ousli")) replaceIfMeasure("ous")
        case 'o' =>
          if (ends("ization")) replaceIfMeasure("ize")
          else if (ends("ation")) replaceIfMeasure("ate")
          else if (ends("ator")) replaceIfMeasure("ate")
        case 's' =>
          if (ends("alism")) replaceIfMeasure("al")
          else if (ends("iveness")) replaceIfMeasure("ive")
          else if (ends("fulness")) replaceIfMeasure("ful")
          else if (ends("ousness")) replaceIfMeasure("ous")
        case 't' =>
          if (ends("aliti")) replaceIfMeasure("al")
          else if (ends("iviti")) replaceIfMeasure("ive")
          else if (ends("biliti")) replaceIfMeasure("ble")
        case 'g' =>
          if (ends("logi")) replaceIfMeasure("log")
        case _ => ()
      }
    }

    /** -ic-/-full/-ness etc. (Porter step 3). */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) replaceIfMeasure("ic")
        else if (ends("ative")) replaceIfMeasure("")
        else if (ends("alize")) replaceIfMeasure("al")
      case 'i' =>
        if (ends("iciti")) replaceIfMeasure("ic")
      case 'l' =>
        if (ends("ical")) replaceIfMeasure("ic")
        else if (ends("ful")) replaceIfMeasure("")
      case 's' =>
        if (ends("ness")) replaceIfMeasure("")
      case _ => ()
    }

    /** -ant/-ence/... removal in context m() > 1 (Porter step 4). */
    private def step5(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' =>
          (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && m() > 1) k = j
    }

    /** Final -e and -ll cleanup (Porter step 5); note the reference keeps
      * j at the pre-deletion k for the second check (`:349-356`).
      */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    def run(): String = {
      if (k > 1) { step1(); step2(); step3(); step4(); step5(); step6() }
      new String(b, 0, k + 1)
    }
  }
}
