package graft.operators

/** Frozen tokenizer artifacts (round 11, VERDICT r10 #5): the BPE merge
  * table and WordPiece vocabulary that `q114_bpe_encode` /
  * `q148_wordpiece_encode` apply, committed as literals the way a
  * production tokenizer ships — the vocabulary is a versioned artifact,
  * not something retrained inside every query. Freezing is what makes
  * the encode pass DuckDB-oracle-expressible: both engines apply the
  * SAME table, so the oracle tests the ENCODE ALGORITHM (greedy
  * rank-order merge replay / greedy longest-match), not training.
  *
  * Provenance: trained deterministically on the sf0.01 fixture by
  * `graft.FreezeVocab` — BPE: 40 merges over the `doc_id % 7 == 0`
  * slice (the original q114 training recipe); WordPiece: 30 merges +
  * the corpus alphabet over all documents. `FrozenVocabSpec` retrains
  * on the fixture and asserts equality, so artifact drift is a visible
  * test failure, never a silent oracle mismatch. Training itself stays
  * first-class and oracle-gated elsewhere: q88 (BPE merge table
  * property oracle) and the WordPiece distributed==sequential pin in
  * `WordPieceSpec`.
  */
object FrozenVocab {

  val bpeMerges: Vector[(String, String)] = Vector(
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("er", "</w>"),
    ("o", "r"),
    ("t", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("h", "</w>"),
    ("a", "s"),
    ("l", "u"),
    ("s", "t"),
    ("t", "a"),
    ("i", "n"),
    ("g", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("y", "</w>"),
    ("as", "h</w>"),
    ("h", "ash</w>"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n</w>"),
    ("or", "t</w>"),
    ("s", "ort</w>"),
    ("b", "i"),
    ("bi", "g</w>"),
    ("a", "n</w>"),
    ("c", "an</w>"),
    ("c", "u"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "m"),
    ("custom", "er</w>"),
    ("s", "can</w>"),
    ("d", "ow</w>"),
    ("in", "dow</w>"),
    ("w", "indow</w>"),
    ("i", "n</w>")
  )

  val wordPieceVocab: Vector[String] = Vector(
    "##a", "##b", "##bl", "##c", "##ch", "##d",
    "##e", "##g", "##h", "##i", "##in", "##k",
    "##l", "##lu", "##lum", "##lumn", "##m", "##n",
    "##o", "##oin", "##p", "##r", "##s", "##sh",
    "##st", "##t", "##tch", "##u", "##up", "##us",
    "##w", "##y", "a", "ag", "agg", "b",
    "bi", "big", "c", "cus", "cust", "d",
    "f", "fi", "fil", "filt", "g", "h",
    "j", "join", "k", "l", "li", "lin",
    "m", "o", "p", "q", "qu", "r",
    "s", "sp", "t", "th", "v", "w",
    "wi", "win", "wind"
  )
}
