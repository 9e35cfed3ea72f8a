#!/usr/bin/env python3
"""Build an adversarial-text twin of a fixture dir for cross-engine
oracle fuzzing (round 13). Copies every table verbatim except
`documents`, whose `text` is replaced by 500 deterministic adversarial
strings — mixed-case ASCII, CJK, accented words, tab/newline/U+000B
whitespace, HTML-ish punctuation, repeated phrases, boilerplate
sentences, and empty/whitespace-only docs — with `n_chars` recomputed
to stay self-consistent.

This probe found three latent cross-engine divergences the real
fixtures (ASCII, no control whitespace) could never reach: the
Java-\\s-vs-RE2-\\s U+000B gap across every tokenization oracle, an
INT32 left-shift overflow in the murmur3 SQL replay on CJK chars, and
Java-String.trim-vs-SQL-trim token-count drift on edge newlines
(all fixed; see the round-13 commit log).

Recipe:
  python3 tools/fuzz_corpus.py [src_sf_dir] [out_dir]
  sbt "runMain graft.Verify <out_dir> /tmp/fuzz_verify <text-queries>"
  python3 tools/check_oracle.py <out_dir> /tmp/fuzz_verify
Exclusions by design: q128 (fixture-shaped planted-suffix require),
q99/q101 and other per-fixture frozen pins (their committed artifacts
describe the REAL fixture, so fuzz mismatches there are the pin working
as intended, not parity bugs).
"""
import random
import shutil
import sys

import duckdb


def fuzz_text(i, random):
    ascii_words = ['The', 'quick', 'BROWN', 'fox', 'jumps', 'over', 'the',
                   'lazy', 'dog', 'and', 'of', 'to', 'el', 'que', 'der',
                   'und', 'le', 'est', 'water', 'HOUSE', 'garden', 'spark',
                   'data -- table']
    cjk = list('今天天气很好我们应该出去走走的是了在有和人这中大为上')
    accents = ['café', 'über', 'años', 'réponse', 'straße', 'niño',
               'être', 'müde']
    kind = i % 10
    if kind == 0:
        return ' '.join(random.choices(ascii_words, k=random.randint(3, 40)))
    if kind == 1:
        return ''.join(random.choices(cjk, k=random.randint(3, 40)))
    if kind == 2:
        return ' '.join(random.choices(ascii_words + accents,
                                       k=random.randint(3, 30)))
    if kind == 3:
        return ('\t'.join(random.choices(ascii_words, k=4)) + '\x0b'
                + random.choice(accents) + '\n\npara two. '
                + ''.join(random.choices(cjk, k=5)))
    if kind == 4:
        return random.choice(['', ' ', '  \t ', '\n\n', 'x'])
    if kind == 5:
        return ("It's <b>bold</b> &amp; <a href='http://e.com/x?y=1&z=2'>"
                "a link</a>; 42.0% [sic] -- done.")
    if kind == 6:
        return ' '.join(random.choices(accents,
                                       k=random.randint(3, 15))).upper()
    if kind == 7:
        return ('repeat me. ' * random.randint(2, 12)).strip()
    if kind == 8:
        return (' '.join(random.choices(ascii_words, k=8)) + '. '
                + ' '.join(random.choices(ascii_words, k=8))
                + '. subscribe to our newsletter. tail ' + str(i))
    return (random.choice(ascii_words) + random.choice(cjk)
            + random.choice(accents) + ' ' + str(i) + ' end.')


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/fuzzsf'
    import os
    os.makedirs(out, exist_ok=True)
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'embeddings']:
        shutil.copy(f'{src}/{t}.parquet', f'{out}/{t}.parquet')
    rnd = random.Random(42)
    con = duckdb.connect()
    df = con.execute(f"SELECT * FROM parquet_scan('{src}/documents.parquet')"
                     " ORDER BY doc_id").fetchdf()
    df['text'] = [fuzz_text(i, rnd) for i in range(len(df))]
    con.register('fz', df)
    con.execute("CREATE TABLE d AS SELECT * FROM fz")
    con.execute("UPDATE d SET n_chars = length(text)")
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f'wrote {out} ({len(df)} fuzzed docs)')


if __name__ == '__main__':
    main()
