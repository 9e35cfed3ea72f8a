package graft.pipeline

import graft.queries.MiniCorpus
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden end-to-end test of the CLI entry: biarc corpus file in, sorted
  * `path1 \t path2 \t score` TSV out, byte-compared against the closed-form
  * expectation (same arithmetic as DirtPipelineSpec, `DirtDriver.java:
  * 694-698,972-975`; TSV framing `:1007-1012`).
  */
class DirtCliSpec extends AnyFunSuite {

  test("CLI writes the reference TSV format with closed-form scores") {
    val tmp = Files.createTempDirectory("dirtcli").toString
    val corpusFile = s"$tmp/corpus.txt"
    val testSetFile = s"$tmp/testset.txt"
    val outDir = s"$tmp/out"
    Files.write(Paths.get(corpusFile), MiniCorpus.lines.asJava)
    Files.write(Paths.get(testSetFile), MiniCorpus.testSet.asJava)

    DirtCli.main(Array(corpusFile, testSetFile, outDir))

    val got = Files.list(Paths.get(outDir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .toSeq.sorted

    // Closed-form scores on the mini corpus (N = 56), cf. DirtPipelineSpec.
    val miFromPatient = math.log(10.0 * 56 / (15.0 * 21))
    val miFromPeopl = math.log(5.0 * 56 / (15.0 * 5))
    val miOfPatient = math.log(7.0 * 56 / (9.0 * 21))
    val miOfMen = math.log(2.0 * 56 / (9.0 * 2))
    val miSufPatient = math.log(4.0 * 56 / (4.0 * 21))
    val dieFromOf =
      (miFromPatient + miOfPatient) /
        ((miFromPatient + miFromPeopl) + (miOfPatient + miOfMen))
    val dieFromSuffer =
      (miFromPatient + miSufPatient) /
        ((miFromPatient + miFromPeopl) + miSufPatient)

    val pFrom = "N:<nsubj:V:die:>prep:P:from:>pobj:N"
    val pOf = "N:<nsubj:V:die:>prep:P:of:>pobj:N"
    val pSuffer = "N:<nsubj:V:suffer:>prep:P:from:>pobj:N"
    val expected = Seq(
      s"$pFrom\t$pOf\t$dieFromOf",
      s"$pFrom\t$pSuffer\t$dieFromSuffer").sorted

    assert(got == expected)
  }
}
