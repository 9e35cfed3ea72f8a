package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared id-column helpers for operators that key on a numeric doc id. */
object Ids {

  /** Doc id as long, failing fast on a lossy cast: a non-numeric string
    * id would cast to null, and null ids fail every `id1 < id2`
    * comparison (dedup) or never match an anti-join key
    * (decontamination) — that doc's pairs/flags would silently vanish.
    * Raising beats silently keeping a contaminated doc.
    */
  def longId(idCol: String): Column =
    when(col(idCol).isNotNull && col(idCol).cast("long").isNull,
      raise_error(concat(lit(s"$idCol not castable to long: "), col(idCol))))
      .otherwise(col(idCol).cast("long"))
}
