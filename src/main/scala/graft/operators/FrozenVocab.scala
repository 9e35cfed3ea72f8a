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

  /** Unigram-LM piece table (piece -> log-prob), the q119 training
    * recipe (`doc_id % 5` slice of sf0.01, vocabSize=120, iters=2,
    * maxPieceLen=4, seedSize=300) frozen by `graft.FreezeVocab`. The
    * q150 encode pass applies it on both engines: Spark via
    * `Unigram.encodeDocs`, DuckDB via `UnigramEncodeSql`'s recursive
    * Viterbi DP. Doubles are shortest-round-trip literals, so both
    * parsers recover identical IEEE-754 bit patterns and the DP's
    * score sums compare bit-for-bit.
    */
  val unigramTable: Vector[(String, Double)] = Vector(
    ("a", -3.7575213868361006),
    ("agg", -3.828395726422758),
    ("am", -3.8746467440735133),
    ("b", -9.004545458996587),
    ("batc", -3.7213417302585983),
    ("big", -3.752272030949957),
    ("c", -9.004545458996587),
    ("colu", -3.6815354798581783),
    ("cust", -3.6432532932871613),
    ("d", -9.004545458996587),
    ("data", -3.9356412567763552),
    ("dup", -6.925103917316751),
    ("e", -2.7111261801501056),
    ("er", -3.8512538644988075),
    ("f", -9.004545458996587),
    ("fast", -3.857050982183134),
    ("filt", -3.8512538644988075),
    ("g", -9.004545458996587),
    ("grou", -3.8227619087045017),
    ("h", -3.7213417302585983),
    ("hash", -3.8115886081063763),
    ("i", -9.004545458996587),
    ("j", -9.004545458996587),
    ("join", -3.9872656221816625),
    ("k", -3.8687470219463247),
    ("key", -3.904679031172388),
    ("l", -3.752272030949957),
    ("line", -4.000599153051128),
    ("m", -9.004545458996587),
    ("merg", -3.817159653155832),
    ("mn", -3.6815354798581783),
    ("n", -9.004545458996587),
    ("o", -9.004545458996587),
    ("omer", -3.6432532932871613),
    ("or", -3.9231410940121236),
    ("orde", -3.8115886081063763),
    ("ow", -3.8005387719197916),
    ("p", -3.8227619087045017),
    ("part", -3.7470500869688053),
    ("q", -9.004545458996587),
    ("quer", -3.880581479593328),
    ("r", -3.8115886081063763),
    ("row", -3.667007379295269),
    ("s", -9.004545458996587),
    ("scan", -3.916949123764203),
    ("slow", -3.73154590043284),
    ("smal", -3.752272030949957),
    ("sort", -3.8115886081063763),
    ("spar", -3.8687470219463247),
    ("stre", -3.8746467440735133),
    ("t", -9.004545458996587),
    ("tabl", -3.773436842142),
    ("the", -3.7681034961666375),
    ("u", -9.004545458996587),
    ("v", -9.004545458996587),
    ("valu", -3.828395726422758),
    ("vect", -3.9231410940121236),
    ("w", -9.004545458996587),
    ("wind", -3.8005387719197916),
    ("y", -3.880581479593328)
  )
}
