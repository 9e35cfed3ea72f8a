package graft.queries

/** DuckDB twins for the media near-dup family (round 12): q106
  * (perceptual-hash image dedup) and q107 (envelope-fingerprint audio
  * dedup). The planted payloads are closed-form — the PNG pattern is
  * g(x, y) = (a·x + b·y) mod 256 gray (lum of gray g is exactly g
  * under the 299/587/114 integer weights) and the WAV envelope is
  * amp(f) = 500 + ((a·f + b) mod 29)·1000 with alternating-sign
  * samples (|s| = amp, so each 40-sample frame's integer mean IS amp)
  * — and both codecs round-trip losslessly, so the aHash / envelope
  * fingerprint is a pure integer function of (doc_id, noise) that
  * DuckDB recomputes exactly, 64-bit hashes kept as two 32-bit halves.
  * A Spark-side codec bug (lossy decode, wrong endianness, wrong
  * block mapping) would change its hashes and fail the driver's hash
  * compare — the oracle certifies the real decode path end-to-end.
  *
  * The oracle brute-forces all pairs (550² at oracle scale — trivial)
  * where the operator uses the pigeonhole block join; the pigeonhole
  * is exactness-preserving by the block-agreement theorem, so the two
  * candidate sets agree at every Hamming ≤ maxDist pair.
  */
object MediaSql {

  private def hammingTail(maxDist: Int): String =
    s"""SELECT a.doc_id AS id1, b.doc_id AS id2,
              CAST(bit_count(CAST(xor(a.lo, b.lo) AS BIGINT))
                   + bit_count(CAST(xor(a.hi, b.hi) AS BIGINT)) AS INTEGER)
                AS hamming
       FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       WHERE bit_count(CAST(xor(a.lo, b.lo) AS BIGINT))
             + bit_count(CAST(xor(a.hi, b.hi) AS BIGINT)) <= $maxDist
       ORDER BY id1, id2"""

  /** q106: 32×32 pattern → 8×8 block-average aHash → Hamming ≤ 6. */
  val imageDedup: String =
    s"""WITH media AS (
         SELECT doc_id, doc_id % 97 + 1 AS a, doc_id % 89 + 1 AS b,
                false AS noise
         FROM documents
         UNION ALL
         SELECT doc_id + 100000, doc_id % 97 + 1, doc_id % 89 + 1, true
         FROM documents WHERE doc_id < 50),
       px AS (
         SELECT m.doc_id, xs.x, ys.y,
                CASE WHEN m.noise AND (ys.y * 32 + xs.x) % 37 = 0
                     THEN least(255, ((m.a * xs.x + m.b * ys.y) % 256) + 16)
                     ELSE (m.a * xs.x + m.b * ys.y) % 256 END AS g
         FROM media m
         CROSS JOIN (SELECT unnest(range(0, 32)) AS x) xs
         CROSS JOIN (SELECT unnest(range(0, 32)) AS y) ys),
       cells AS (
         SELECT doc_id, (y // 4) * 8 + (x // 4) AS cell,
                sum(g) // 16 AS avg
         FROM px GROUP BY 1, 2),
       means AS (SELECT doc_id, sum(avg) // 64 AS mean FROM cells GROUP BY 1),
       hashes AS (
         SELECT c.doc_id,
                CAST(sum(CASE WHEN c.avg > m.mean AND c.cell < 32
                         THEN (CAST(1 AS BIGINT) << c.cell) ELSE 0 END)
                  AS BIGINT) AS lo,
                CAST(sum(CASE WHEN c.avg > m.mean AND c.cell >= 32
                         THEN (CAST(1 AS BIGINT) << (c.cell - 32)) ELSE 0 END)
                  AS BIGINT) AS hi
         FROM cells c JOIN means m ON m.doc_id = c.doc_id
         GROUP BY 1)
       ${hammingTail(6)}"""

  /** q107: 64-frame envelope fingerprint → Hamming ≤ 6. */
  val audioDedup: String =
    s"""WITH media AS (
         SELECT doc_id, doc_id % 28 + 1 AS a, doc_id % 29 AS b,
                false AS noise
         FROM documents
         UNION ALL
         SELECT doc_id + 100000, doc_id % 28 + 1, doc_id % 29, true
         FROM documents WHERE doc_id < 50),
       frames AS (
         SELECT m.doc_id, fs.f,
                CASE WHEN m.noise AND fs.f % 5 = 0
                     THEN 500 + ((m.a * fs.f + m.b) % 29) * 1000 + 400
                     ELSE 500 + ((m.a * fs.f + m.b) % 29) * 1000 END AS amp
         FROM media m CROSS JOIN (SELECT unnest(range(0, 64)) AS f) fs),
       means AS (SELECT doc_id, sum(amp) // 64 AS mean FROM frames GROUP BY 1),
       hashes AS (
         SELECT fr.doc_id,
                CAST(sum(CASE WHEN fr.amp > m.mean AND fr.f < 32
                         THEN (CAST(1 AS BIGINT) << fr.f) ELSE 0 END)
                  AS BIGINT) AS lo,
                CAST(sum(CASE WHEN fr.amp > m.mean AND fr.f >= 32
                         THEN (CAST(1 AS BIGINT) << (fr.f - 32)) ELSE 0 END)
                  AS BIGINT) AS hi
         FROM frames fr JOIN means m ON m.doc_id = fr.doc_id
         GROUP BY 1)
       ${hammingTail(6)}"""
}
