#!/usr/bin/env python3
"""Regeneration path for FrozenCompressionSql.scala (round 12, VERDICT
r11 #5): computes the q101 compression-ratio expected table for the
sf0.01 fixture with CPython's zlib — an INDEPENDENT implementation of
the same RFC-1950/1951 algorithm the query runs through
java.util.zip.Deflater (level 6, zlib wrapper; spot-verified
byte-identical outputs across the two implementations) — and writes the
DuckDB oracle SQL as a committed VALUES literal. The driver's hash
compare then certifies the whole Spark pipeline (UTF-8 encoding,
deflate drain loop, permille arithmetic) against a second zlib
implementation, the strongest oracle available for an algorithm DuckDB
cannot run natively.

Usage: python3 tools/freeze_compression.py [sf_dir]
Rewrites src/main/scala/graft/queries/FrozenCompressionSql.scala.
Rerun whenever the sf0.01 fixture is regenerated (a stale table shows
up as a q101 hash mismatch, never silently).
"""
import sys
import zlib

import duckdb

LEVEL = 6  # matches TextAnalysis.compressionStats(level = 6)

OUT = "src/main/scala/graft/queries/FrozenCompressionSql.scala"

HEADER = '''package graft.queries

/** GENERATED FILE -- regenerate with `python3 tools/freeze_compression.py`
  * (see that script's docstring for the cross-implementation oracle
  * rationale). Expected q101 output for the sf0.01 fixture, computed by
  * CPython zlib level 6 -- independent of the JVM Deflater the query
  * uses.
  */
object FrozenCompressionSql {

  val sql: String = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n_bytes AS BIGINT) AS n_bytes,
              CAST(n_compressed AS BIGINT) AS n_compressed,
              CAST(compress_permille AS BIGINT) AS compress_permille
       FROM (VALUES
'''

FOOTER = ''') AS t(doc_id, n_bytes, n_compressed, compress_permille)
       ORDER BY doc_id"""
}
'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    vals = []
    for doc_id, text in rows:
        data = (text or "").encode("utf-8")
        n = len(zlib.compress(data, LEVEL))
        permille = 1000 if not data else 1000 * n // len(data)
        vals.append(f"         ({doc_id}, {len(data)}, {n}, {permille})")
    with open(OUT, "w") as f:
        f.write(HEADER + ",\n".join(vals) + FOOTER)
    print(f"wrote {OUT}: {len(vals)} expected rows (zlib level {LEVEL})")


if __name__ == "__main__":
    main()
