package graft.text

import graft.Token
import org.scalatest.funsuite.AnyFunSuite

class BiarcParserSpec extends AnyFunSuite {

  test("token parse — plain") {
    assert(BiarcParser.parseToken("died/VBD/ROOT/0")
      .contains(Token("died", "VBD", "ROOT", 0)))
  }

  test("token parse — slash inside word (right-to-left lastIndexOf)") {
    assert(BiarcParser.parseToken("km/h/NN/nsubj/2")
      .contains(Token("km/h", "NN", "nsubj", 2)))
  }

  test("token parse — malformed tokens are skipped") {
    assert(BiarcParser.parseToken("noslashes").isEmpty)
    assert(BiarcParser.parseToken("a/b").isEmpty)
    assert(BiarcParser.parseToken("a/b/c").isEmpty) // only 2 slashes
    assert(BiarcParser.parseToken("w/POS/dep/notanint").isEmpty)
  }

  test("line parse — happy path") {
    val line = "died\tpatients/NNS/nsubj/2 died/VBD/ROOT/0 from/IN/prep/2 cancer/NN/pobj/3\t42"
    val s = BiarcParser.parseLine(line).get
    assert(s.cnt == 42L)
    assert(s.tokens.length == 4)
    assert(s.tokens(0) == Token("patients", "NNS", "nsubj", 2))
    assert(s.tokens(3) == Token("cancer", "NN", "pobj", 3))
  }

  test("line parse — < 3 fields dropped, bad count defaults to 1") {
    assert(BiarcParser.parseLine("just\ttwo").isEmpty)
    val s = BiarcParser.parseLine("h\ta/N/x/0\tnotanumber").get
    assert(s.cnt == 1L)
  }

  test("line parse — bad-token-only ngram yields None") {
    assert(BiarcParser.parseLine("h\tgarbage notokens\t5").isEmpty)
  }
}

class PathExtractorSpec extends AnyFunSuite {

  private def toks(s: String): Array[Token] = BiarcParser.parseTokens(s)

  test("die-from sentence extracts the canonical path") {
    val t = toks("patients/NNS/nsubj/2 died/VBD/ROOT/0 from/IN/prep/2 cancer/NN/pobj/3")
    val out = PathExtractor.extractPaths(t)
    assert(out == Seq(("N:<nsubj:V:di:>prep:P:from:>pobj:N", "patient", "cancer")))
  }

  test("active transitive: X causes Y") {
    val t = toks("smoking/NN/nsubj/2 causes/VBZ/ROOT/0 cancer/NN/dobj/2")
    val out = PathExtractor.extractPaths(t)
    assert(out == Seq(("N:<nsubj:V:caus:>dobj:N", "smoke", "cancer")))
  }

  test("aux-only path is invalid") {
    val t = toks("this/NN/nsubj/2 is/VBZ/ROOT/0 good/NN/attr/2")
    assert(PathExtractor.extractPaths(t).isEmpty)
  }

  test("disconnected nouns yield no path") {
    // two roots: tokens 1 and 2 both point at head 0 (root marker)
    val t = toks("a/NN/nsubj/0 b/NN/dobj/0")
    assert(PathExtractor.extractPaths(t).isEmpty)
  }

  test("all noun pairs are enumerated in order") {
    // verb with three noun children: pairs (1,3),(1,4),(3,4) by index order
    val t = toks("dogs/NNS/nsubj/2 give/VBP/ROOT/0 people/NNS/iobj/2 joy/NN/dobj/2")
    val out = PathExtractor.extractPaths(t)
    assert(out.map(t => t._2 -> t._3) == Seq(
      "dog" -> "peopl", "dog" -> "joi", "peopl" -> "joi"))
  }

  test("non-verb internal nodes render W:/P: and edges <dep/>dep") {
    // noun -> prep -> noun attached under a verb; internal prep is P:
    val t = toks("man/NN/nsubj/2 walked/VBD/ROOT/0 with/IN/prep/2 dog/NN/pobj/3")
    val out = PathExtractor.extractPaths(t)
    assert(out == Seq(("N:<nsubj:V:walk:>prep:P:with:>pobj:N", "man", "dog")))
  }
}

class PhrasePathsSpec extends AnyFunSuite {

  test("active transitive") {
    assert(PhrasePaths.convert("X cause Y")
      .contains("N:<nsubj:V:caus:>dobj:N"))
  }

  test("verb + preposition") {
    assert(PhrasePaths.convert("X lead to Y")
      .contains("N:<nsubj:V:lead:>prep:P:to:>pobj:N"))
    // Note: the infinitive "die" stems to "die" while corpus "died" stems
    // to "di" — distinct path keys, exactly as in the reference.
    assert(PhrasePaths.convert("X die from Y")
      .contains("N:<nsubj:V:die:>prep:P:from:>pobj:N"))
  }

  test("passive via trailing by (Java grammar, not the Python agent form)") {
    assert(PhrasePaths.convert("X caused by Y")
      .contains("N:<nsubjpass:V:caus:>prep:P:by:>pobj:N"))
    assert(PhrasePaths.convert("X is caused by Y")
      .contains("N:<nsubjpass:V:caus:>prep:P:by:>pobj:N"))
  }

  test("leading auxiliary is stripped") {
    assert(PhrasePaths.convert("X is related to Y")
      .contains("N:<nsubj:V:relat:>prep:P:to:>pobj:N"))
  }

  test("verb + particle + prep collapses to composite stem") {
    val got = PhrasePaths.convert("X break out into Y")
    assert(got.contains(
      s"N:<nsubj:V:${Porter.stem("breakout")}:>prep:P:into:>pobj:N"))
  }

  test("unhandled shapes drop (reversed templates like 'Y confound with X')") {
    assert(PhrasePaths.convert("Y confound with X").isEmpty)
    assert(PhrasePaths.convert("").isEmpty)
    assert(PhrasePaths.convert("X one two three four Y").isEmpty)
  }
}
