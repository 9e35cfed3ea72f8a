package graft.props

import graft.operators.{Dedup, TextAnalysis}
import graft.text.Porter
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5.2) over the pure kernels —
  * run by sbt's native ScalaCheck integration.
  */
object KernelProps extends Properties("graft.kernels") {

  val word: Gen[String] = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  // NOTE: classic Porter is NOT universally idempotent (ScalaCheck found
  // counterexamples like "osavcye"); the parity requirement is
  // determinism, and PorterSpec pins idempotence only for the pipeline's
  // already-stemmed verbs.
  property("porter stem is deterministic and total") = forAll(word) { w =>
    Porter.stem(w) == Porter.stem(w)
  }

  property("porter stem never lengthens a word") = forAll(word) { w =>
    Porter.stem(w).length <= w.length
  }

  val text: Gen[String] = Gen.chooseNum(0, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  property("shingle sets grow with containment") = forAll(text, word) { (t, extra) =>
    val s1 = Dedup.shingles(t, 5)
    val s2 = Dedup.shingles(t + " " + extra, 5)
    // every full-width shingle of t survives in the extension
    s1.filter(_.length == 5).subsetOf(s2)
  }

  property("minhash signature entries bounded and deterministic") =
    forAll(text) { t =>
      val sh = Dedup.shingles(t, 5)
      val s1 = Dedup.minhashSignature(sh, 32)
      val s2 = Dedup.minhashSignature(sh, 32)
      s1.toSeq == s2.toSeq && s1.forall(_ >= 0L)
    }

  property("simhash of identical token multisets is equal") =
    forAll(Gen.listOf(word)) { ws =>
      Dedup.simhash64(ws) == Dedup.simhash64(ws)
    }

  property("fingerprint is deterministic and total") = forAll(text) { t =>
    TextAnalysis.fingerprintOf(t) == TextAnalysis.fingerprintOf(t)
  }

  // round 15: the code-point murmur twin must be BIT-IDENTICAL to
  // MurmurHash3.stringHash on BMP strings — that equality is what keeps
  // every frozen hash artifact (classifier weights, minhash perms,
  // count-min sketches) valid across the codepoint migration.
  val bmpString: Gen[String] = Gen.chooseNum(0, 20).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(32, 126),
      2 -> Gen.choose(0x3000, 0x9FFF))).map(_.map(_.toChar).mkString))

  property("murmurCp == MurmurHash3.stringHash on BMP text") =
    forAll(bmpString, Gen.choose(0, 100)) { (s, seed) =>
      graft.text.SqlText.murmurCp(s, seed) ==
        scala.util.hashing.MurmurHash3.stringHash(s, seed)
    }

  // astral strings: one code point per char — cpLength counts it once,
  // codePoints round-trips losslessly, cpOffsets never lands inside a
  // surrogate pair
  val astralString: Gen[String] = Gen.chooseNum(1, 10).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      5 -> Gen.choose(0x61, 0x7A),
      5 -> Gen.choose(0x1F300, 0x1F64F))).map(
      _.map(cp => new String(Character.toChars(cp))).mkString))

  property("codePoints/cpOffsets round-trip and never split pairs") =
    forAll(astralString) { s =>
      val cps = graft.text.SqlText.codePoints(s)
      val offs = graft.text.SqlText.cpOffsets(s)
      val rebuilt = cps.map(cp => new String(Character.toChars(cp))).mkString
      val slices = (0 until cps.length)
        .map(i => s.substring(offs(i), offs(i + 1))).mkString
      rebuilt == s && slices == s &&
        graft.text.SqlText.cpLength(s) == cps.length
    }

  property("canonical pair order is an involution-fixed normal form") =
    forAll(word, word) { (a, b) =>
      val c1 = graft.eval.Evaluate.canon(a, b)
      val c2 = graft.eval.Evaluate.canon(b, a)
      c1 == c2 && c1._1 <= c1._2
    }
}
