package graft.queries

/** DuckDB twins for the hash-sketch dedup family (round 12): SimHash
  * (q34) and banded MinHash (q33) replayed bit-for-bit in SQL. The key
  * enabler is a DuckDB reimplementation of Scala's
  * `MurmurHash3.stringHash` — the 2-chars-per-round mix loop as a
  * recursive CTE over (token, position, state), the odd tail and the
  * avalanche finalizer as chained projections, all in BIGINT with
  * 32-bit masking (multiplications via HUGEINT mod 2^32; every binary
  * op fully parenthesized — DuckDB's bitwise precedence differs from
  * Scala's). Validated token-for-token against the JVM: the q33/q34
  * oracle outputs hash-match the Spark results on the fixture,
  * including the planted-twin pairs.
  *
  * Character unit: both sides walk CODE POINTS — the SQL via
  * unicode()/substr()/length(), the Scala kernels via
  * [[graft.text.SqlText.murmurCp]] (round 15; the r14 kernels used
  * `MurmurHash3.stringHash`'s UTF-16 units, which made this replay
  * BMP-only — VERDICT r14 #5). murmurCp is bit-identical to
  * stringHash on BMP text, so every pre-round-15 pin holds, and the
  * astral fuzz class now passes instead of being a documented
  * precondition.
  *
  * q34 (SimHash): per-token 64-bit hash = (murmur(w, 7) << 32) |
  * murmur(w, 13), kept as two 32-bit halves SQL-side to avoid signed
  * overflow; per-bit votes over tokens WITH multiplicity; pigeonhole
  * blocks are direct 16-bit slices; output (id1, id2, hamming).
  * Deterministic end-to-end — no seeds beyond the committed 7/13.
  *
  * q33 (MinHash): per-shingle 32-bit murmur(w, 42); 128 permutations
  * via the (a·x + b) mod P universal family with THE SAME constants
  * the operator uses (`Dedup.permConstants` — derived once from
  * java.util.Random(0x5eed)); per-(doc, band) key = the ordered
  * 16-value signature slice (Spark buckets by `hash()` of the slice;
  * equal slices ⟺ equal buckets up to a ~2^-32 murmur collision that
  * the verify stage's Jaccard filter makes unobservable on this
  * fixture); candidates Jaccard-verified exactly like the operator.
  * The jaccard column rounds HALF-even (`math.rint`) Spark-side vs
  * HALF-up (DuckDB `round`) — indistinguishable here: a committed
  * round-12 audit of every fixture pair at J ≥ 0.65 found the nearest
  * value 0.0128 decimal-6-units away from any rounding boundary.
  */
object HashSql {

  private def mulmod(x: String, c: Long): String =
    s"CAST((CAST(($x) AS HUGEINT) * $c) % 4294967296 AS BIGINT)"

  private def rotl(x: String, r: Int): String =
    s"((( ($x) << $r ) | ( ($x) >> ${32 - r} )) & 4294967295)"

  private def mixk(d: String): String =
    mulmod(rotl(mulmod(d, 3432918353L), 15), 461845907L)

  /** The murmur3 stringHash pipeline over a `dw(w)` CTE of distinct
    * tokens and a `seeds(seed)` CTE, producing `wh(w, seed, hash)`.
    * Call sites must be WITH RECURSIVE.
    */
  private[queries] def murmurCtes: String =
    s"""mur(w, seed, i, h) AS (
         SELECT w, seed, 1, CAST(seed AS BIGINT) FROM dw CROSS JOIN seeds
         UNION ALL
         SELECT w, seed, i + 2,
                ((${rotl("xor(h, k1)", 13)} * 5) + 3864292196) & 4294967295
         FROM (
           SELECT w, seed, i, h, ${mixk("d")} AS k1
           FROM (
             SELECT w, seed, i, h,
                    ((CAST(unicode(substr(w, i, 1)) AS BIGINT) << 16)
                     + unicode(substr(w, i + 1, 1))) AS d
             FROM mur WHERE (i + 1) <= length(w)) AS step1
         ) AS step2
       ),
       last_state AS (
         SELECT w, seed, h, i FROM mur m
         WHERE i = (SELECT max(i) FROM mur m2
                    WHERE m2.w = m.w AND m2.seed = m.seed)
       ),
       tailed AS (
         SELECT w, seed,
                CASE WHEN i <= length(w)
                     THEN xor(h, ${mixk("unicode(substr(w, i, 1))")})
                     ELSE h END AS h
         FROM last_state),
       f1 AS (SELECT w, seed, xor(h, length(w)) AS h FROM tailed),
       f2 AS (SELECT w, seed, ${mulmod("xor(h, (h >> 16))", 2246822507L)} AS h
              FROM f1),
       f3 AS (SELECT w, seed, ${mulmod("xor(h, (h >> 13))", 3266489909L)} AS h
              FROM f2),
       wh AS (SELECT w, seed, xor(h, (h >> 16)) AS hash FROM f3)"""

  /** The q30/q31 dup'd corpus, matching `PipelineQueries.dupCorpus`. */
  private val corpusCte: String =
    """corpus AS (SELECT * FROM documents
                  UNION ALL
                  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
                  FROM documents WHERE doc_id < 50)"""

  /** q34: SimHash pigeonhole pairs at Hamming <= 3. The tokenizer must
    * mirror Scala's `"".trim.split("\\s+") == Array("")`: an empty or
    * NULL doc contributes ONE empty-string token (which the operator
    * hashes like any other), so dw keeps '' and NULL text coalesces to
    * '' — dropping either would silently omit empty docs' pairs.
    */
  val simhashPairs: String =
    s"""WITH RECURSIVE $corpusCte,
       toks AS (SELECT doc_id,
                       unnest(regexp_split_to_array(coalesce(trim(text), ''),
                                                    '[\\s\\x0B]+')) AS w
                FROM corpus),
       dw(w) AS (SELECT DISTINCT w FROM toks),
       seeds(seed) AS (VALUES (7), (13)),
       $murmurCtes,
       tokh AS (
         SELECT t.doc_id,
                h1.hash AS h1, h2.hash AS h2
         FROM toks t
         JOIN wh h1 ON h1.w = t.w AND h1.seed = 7
         JOIN wh h2 ON h2.w = t.w AND h2.seed = 13),
       votes AS (
         SELECT doc_id, bb.b,
                (2 * sum(CASE WHEN bb.b < 32 THEN (h2 >> bb.b) & 1
                              ELSE (h1 >> (bb.b - 32)) & 1 END)) - count(*)
                  AS vote
         FROM tokh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) AS bb
         GROUP BY 1, 2),
       sh AS (
         SELECT doc_id,
                CAST(sum(CASE WHEN vote > 0 AND b < 32
                         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
                  AS lo,
                CAST(sum(CASE WHEN vote > 0 AND b >= 32
                         THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
                  AS BIGINT) AS hi
         FROM votes GROUP BY 1),
       blocks AS (
         SELECT doc_id, bb.b,
                CASE bb.b WHEN 0 THEN lo & 65535
                          WHEN 1 THEN (lo >> 16) & 65535
                          WHEN 2 THEN hi & 65535
                          ELSE (hi >> 16) & 65535 END AS blkval
         FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS b) AS bb),
       cand AS (
         SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM blocks a JOIN blocks b ON a.b = b.b AND a.blkval = b.blkval
         WHERE a.doc_id < b.doc_id),
       pairs AS (
         SELECT c.id1, c.id2,
                CAST(bit_count(CAST(xor(x.hi, y.hi) AS BIGINT)) +
                     bit_count(CAST(xor(x.lo, y.lo) AS BIGINT)) AS INTEGER)
                  AS hamming
         FROM cand c
         JOIN sh x ON x.doc_id = c.id1
         JOIN sh y ON y.doc_id = c.id2)
       SELECT id1, id2, hamming FROM pairs WHERE hamming <= 3
       ORDER BY id1, id2"""

  /** q98: Count-Min token estimates — the sketch is EXACTLY
    * reproducible (murmur3 row hashes with seeds 0..3, exact Long
    * counters, order-independent element-wise merge), so DuckDB
    * rebuilds the identical 4×1024 counter matrix from the same token
    * stream and replays every min-across-rows estimate. Scala's `%` is
    * a signed remainder on the SIGNED murmur int, mirrored by the
    * sign-fix arithmetic below.
    */
  val countMin: String =
    s"""WITH RECURSIVE toks AS (
         SELECT unnest(regexp_split_to_array(trim(text), '[\\s\\x0B]+')) AS w
         FROM documents),
       tok AS (SELECT w FROM toks WHERE w <> ''),
       dw(w) AS (SELECT DISTINCT w FROM tok),
       seeds(seed) AS (VALUES (0), (1), (2), (3)),
       $murmurCtes,
       bk AS (SELECT w, seed AS d,
                     ((((CASE WHEN hash >= 2147483648
                              THEN hash - 4294967296 ELSE hash END) % 1024)
                       + 1024) % 1024) AS b
              FROM wh),
       cnts AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
       counters AS (SELECT bk.d, bk.b, sum(cnts.cnt) AS c
                    FROM bk JOIN cnts USING (w) GROUP BY 1, 2),
       est AS (SELECT bk.w, min(counters.c) AS cm_est
               FROM bk JOIN counters ON counters.d = bk.d AND counters.b = bk.b
               GROUP BY 1)
       SELECT c.w AS word, c.cnt, CAST(e.cm_est AS BIGINT) AS cm_est
       FROM cnts c JOIN est e ON e.w = c.w
       ORDER BY word"""

  /** q33: banded MinHash pairs at Jaccard >= 0.7 (8 bands x 16 rows). */
  val minhashPairs: String = {
    val (as, bs) = graft.operators.Dedup.permConstants(128)
    val permVals = as.indices
      .map(p => s"(${p}, ${as(p)}, ${bs(p)})")
      .mkString(",\n           ")
    s"""WITH RECURSIVE $corpusCte,
       shl AS (SELECT doc_id,
                      -- mirrors Dedup.shingles: null and sub-k texts
                      -- shingle to the one-element set {text-or-''}
                      CASE WHEN text IS NULL OR length(text) < 5
                             THEN [coalesce(text, '')]
                           ELSE list_distinct([substr(text, i, 5)
                                               for i in range(1, length(text) - 3)])
                      END AS s
               FROM corpus),
       dsh AS (SELECT doc_id, unnest(s) AS w FROM shl),
       dw(w) AS (SELECT DISTINCT w FROM dsh),
       seeds(seed) AS (VALUES (42)),
       $murmurCtes,
       perms(p, a, b) AS (VALUES
           $permVals),
       sig AS (
         SELECT d.doc_id, pr.p,
                min((pr.a * h.hash + pr.b) % ${graft.operators.Dedup.minhashP})
                  AS mh
         FROM dsh d JOIN wh h ON h.w = d.w CROSS JOIN perms pr
         GROUP BY 1, 2),
       bandkey AS (
         SELECT doc_id, p // 16 AS band,
                string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bkey
         FROM sig GROUP BY 1, 2),
       cand AS (
         SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM bandkey a JOIN bandkey b
           ON a.band = b.band AND a.bkey = b.bkey
         WHERE a.doc_id < b.doc_id),
       ver AS (
         SELECT c.id1, c.id2,
                len(list_intersect(x.s, y.s)) AS inter,
                len(x.s) AS l1, len(y.s) AS l2
         FROM cand c
         JOIN shl x ON x.doc_id = c.id1
         JOIN shl y ON y.doc_id = c.id2)
       SELECT id1, id2,
              round(inter / (l1 + l2 - inter), 6) AS jaccard
       FROM ver
       WHERE round(inter / (l1 + l2 - inter), 6) >= 0.7
       ORDER BY id1, id2"""
  }
}
