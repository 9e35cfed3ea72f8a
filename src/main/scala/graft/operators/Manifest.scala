package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output manifests: an order-independent, engine-portable content
  * fingerprint per partition key — the primitive a 100 TB pipeline uses
  * to answer "did this rerun/backfill/migration produce the same data?"
  * without re-reading both sides (data versioning, cross-cluster
  * reconciliation, sink audit after an exactly-once recovery).
  *
  * Per group: row count, XOR of each row's 60-bit content key (first 15
  * hex digits of the md5 of the NUL-joined hashed columns — the same
  * portable construction `Curation.rankKey` uses, so DuckDB computes
  * the identical value), and the min/max content key. XOR is
  * commutative/associative with no overflow, so the checksum is exact
  * under ANY partitioning, row order, or merge tree — unlike an integer
  * SUM, which overflows differently per engine at scale.
  *
  * Contract: XOR self-cancels, so a row duplicated an EVEN number of
  * times leaves the checksum unchanged — that is what `n_rows` (exact
  * cardinality) and min/max are in the manifest for; the three fields
  * together make even-multiplicity tampering visible unless it also
  * preserves count and extremes. NULL hashed columns are pinned to the
  * empty string via an explicit per-column coalesce BEFORE the NUL
  * join — never bare concat_ws, which silently skips NULL operands and
  * collapses the separator layout (("a",NULL,"b") would collide with
  * ("a","b",NULL)) while SQL `||` in the oracle engine propagates NULL
  * and drops the row from bit_xor entirely. With the coalesce both
  * engines compute the identical key for nullable columns; a NULL→''
  * flip is still invisible to the checksum — add an explicit
  * null-marker column if that distinction matters.
  *
  * Scale shape: one partial-aggregated groupBy — map-side XOR/count,
  * vocabulary-of-keys-sized shuffle, nothing collected.
  */
object Manifest {

  def fingerprint(df: DataFrame, keyCols: Seq[String],
      hashCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one partition-key column")
    require(hashCols.nonEmpty, "need at least one hashed column")
    val rowKey = conv(
      substring(md5(concat_ws("\u0000",
        hashCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)),
        1, 15),
      16, 10).cast("long")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        bit_xor(rowKey).as("xor_check"),
        min(rowKey).as("min_key"),
        max(rowKey).as("max_key"))
  }
}
