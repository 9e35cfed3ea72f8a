package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupEmbeddingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-embedding-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("LSH pairs are a subset of exact pairs with usable recall") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Dedup.embeddingPairsExact(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLsh(emb, threshold = 0.4,
      nBits = 2, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact)) // verify step guarantees no false positives
    val recall = lsh.size.toDouble / exact.size
    info(f"embedding LSH recall = $recall%.2f (${lsh.size}/${exact.size})")
    assert(recall >= 0.8, s"recall $recall") // deterministic seeds: 0.94 observed

    // deterministic across runs (fixed hyperplane seeds)
    val again = Dedup.embeddingPairsLsh(emb, threshold = 0.4,
      nBits = 2, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == lsh)
  }
}
