package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regeneration path for [[graft.operators.FrozenVocab]]: trains the BPE
  * merge table (40 merges, the q114 training slice `doc_id % 7 == 0`) and
  * the WordPiece vocabulary (30 merges + corpus alphabet) on the given
  * fixture dir and prints the Scala literal bodies to paste into
  * `FrozenVocab.scala`. Run whenever the frozen artifacts need refreshing
  * against a regenerated fixture:
  *
  * `sbt "runMain graft.FreezeVocab /root/testdata/sf0.01"`
  *
  * Training itself stays deterministic (exact-long counts, lexicographic
  * tie-breaks — see Bpe/WordPiece scaladoc), so this is reproducible, and
  * `FrozenVocabSpec` asserts frozen == retrained whenever the fixture is
  * present.
  */
object FreezeVocab {
  def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    val bpe = graft.operators.Bpe
      .trainMerges(docs.filter(col("doc_id") % 7 === 0), nMerges = 40)
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect().sortBy(_._1)
    println("  val bpeMerges: Vector[(String, String)] = Vector(")
    println(bpe.map(t => s"    (${q(t._2)}, ${q(t._3)})").mkString(",\n"))
    println("  )")

    val wp = graft.operators.WordPiece
    val merges = wp.trainMerges(docs, nMerges = 30)
    val vocab = wp.vocabulary(docs, merges).toSeq.sorted
    println()
    println("  val wordPieceVocab: Vector[String] = Vector(")
    println(vocab.grouped(6).map(g => "    " + g.map(q).mkString(", "))
      .mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
