package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the reference Porter variant (`DirtDriver.java:106-371`).
  * Expected values derive from the published Porter (1980) algorithm in the
  * classic formulation the reference embeds; `causes -> caus` is the
  * documented example (`design.md:29`).
  */
class PorterSpec extends AnyFunSuite {

  val golden: Seq[(String, String)] = Seq(
    // documented + pipeline-critical
    "causes" -> "caus",
    "cause" -> "caus",
    "caused" -> "caus",
    "causing" -> "caus",
    "accompanied" -> "accompani",
    "accompany" -> "accompani",
    "accompanying" -> "accompani",
    "lead" -> "lead",
    "leads" -> "lead",
    "leading" -> "lead",
    "result" -> "result",
    "resulted" -> "result",
    "die" -> "die",
    "died" -> "di",        // ends("ed") -> "di", no restore (m()=0 branch)
    "dies" -> "di",        // "ies" -> "i"
    "dying" -> "dy",
    // step 1a
    "caresses" -> "caress",
    "ponies" -> "poni",
    "caress" -> "caress",
    "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed",
    "agreed" -> "agre",
    "plastered" -> "plaster",
    "bled" -> "bled",
    "motoring" -> "motor",
    "sing" -> "sing",
    "conflated" -> "conflat",
    "troubled" -> "troubl",
    "sized" -> "size",
    "hopping" -> "hop",
    "tanned" -> "tan",
    "falling" -> "fall",
    "hissing" -> "hiss",
    "fizzed" -> "fizz",
    "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi",
    "sky" -> "sky",
    // steps 2-4
    "relational" -> "relat",
    "conditional" -> "condit",
    "rational" -> "ration",
    "valenci" -> "valenc",
    "digitizer" -> "digit",
    "operator" -> "oper",
    "feudalism" -> "feudal",
    "decisiveness" -> "decis",
    "hopefulness" -> "hope",
    "callousness" -> "callous",
    "formaliti" -> "formal",
    "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic",
    "formative" -> "form",
    "formalize" -> "formal",
    "electriciti" -> "electr",
    "electrical" -> "electr",
    "hopeful" -> "hope",
    "goodness" -> "good",
    // step 5 (suffix strip at m > 1)
    "revival" -> "reviv",
    "allowance" -> "allow",
    "inference" -> "infer",
    "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust",
    "defensible" -> "defens",
    "irritant" -> "irrit",
    "replacement" -> "replac",
    "adjustment" -> "adjust",
    "dependent" -> "depend",
    "adoption" -> "adopt",
    "homologou" -> "homolog",
    "communism" -> "commun",
    "activate" -> "activ",
    "angulariti" -> "angular",
    "homologous" -> "homolog",
    "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 6
    "probate" -> "probat",
    "rate" -> "rate",
    "cease" -> "ceas",
    "controll" -> "control",
    "roll" -> "roll",
    // verbs common in the corpus / test set
    "suffer" -> "suffer",
    "associate" -> "associ",
    "confuse" -> "confus",
    "release" -> "releas",
    "secrete" -> "secret",
    "relate" -> "relat",
    "produce" -> "produc",
    "suggest" -> "suggest",
    "attend" -> "attend",
    "protect" -> "protect",
    "expose" -> "expos",
    "differ" -> "differ",
    "resemble" -> "resembl",
    "distinguish" -> "distinguish",
    "know" -> "know",
    // short words pass through untouched (k <= 1 guard)
    "a" -> "a",
    "be" -> "be",
    "at" -> "at",
    "io" -> "io")

  test("golden vectors") {
    golden.foreach { case (in, want) =>
      assert(Porter.stem(in) == want, s"stem($in)")
    }
  }

  test("null and empty") {
    assert(Porter.stem(null) == "")
    assert(Porter.stem("") == "")
  }

  test("idempotent on already-stemmed pipeline verbs") {
    Seq("caus", "lead", "result", "suffer", "confus").foreach { w =>
      assert(Porter.stem(Porter.stem(w)) == Porter.stem(w), w)
    }
  }

  test("uppercase letters are not vowels for cons() — reference parity") {
    // 'E' hits the default branch of cons() and counts as a consonant,
    // so "ApplES".stem behaves differently from "apples"; just pin that
    // the function is deterministic and total on mixed case.
    assert(Porter.stem("Causes") == "Caus")
  }
}
