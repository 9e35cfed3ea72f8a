#!/usr/bin/env python3
"""Build an adversarial-text twin of a fixture dir for cross-engine
oracle fuzzing (round 13). Copies every table verbatim except
`documents`, whose `text` is replaced by 500 deterministic adversarial
strings — mixed-case ASCII, CJK, accented words, tab/newline/U+000B
whitespace, HTML-ish punctuation, repeated phrases, boilerplate
sentences, and empty/whitespace-only docs — with `n_chars` recomputed
to stay self-consistent. Round 14 adds edge control chars (\\x01/\\x07/
\\x1b/\\x7f — the Java-trim-vs-SQL-trim class ADVICE r13 flagged) and
exotic whitespace-lookalikes (NBSP/U+3000/ZWSP); round 15 adds
supplementary-plane text (emoji/CJK-B — the UTF-16-unit-vs-code-point
class, VERDICT r14 #5). The sweep's tokenization-sensitive core runs
on every preflight (tools/preflight.sh FUZZ_QUERIES).

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
    kind = i % 13
    if kind == 12:
        # round 15 (VERDICT r14 #5): supplementary-plane text — emoji,
        # CJK extension B, math alphanumerics. These are ONE code point
        # but TWO UTF-16 units, so any kernel that hashes, counts or
        # indexes per-char on UTF-16 units (Java String.charAt/length)
        # diverges from its code-point SQL twin (DuckDB unicode/length/
        # substr) exactly here. No lone surrogates: those are invalid
        # UTF-8 and could not reach a parquet text column in the first
        # place.
        astral = ['\U0001F600', '\U0001F389', '\U0001F680', '\U0002070E',
                  '\U0001D400', '\U0001F98A']
        shape = i // 13 % 4
        if shape == 0:
            return (random.choice(astral)
                    + ' '.join(random.choices(ascii_words, k=3))
                    + random.choice(astral))
        if shape == 1:
            return ' '.join(random.choices(ascii_words + astral, k=8))
        if shape == 2:
            return ''.join(random.choices(astral + cjk, k=12))
        return ('mixed ' + random.choice(astral) + 'inside'
                + random.choice(astral) + ' token ' + str(i))
    if kind == 10:
        # round 14 (ADVICE r13): control chars AT THE EDGES. These are
        # NOT \s in either engine, but Java String.trim strips every
        # char <= U+0020 while SQL trim strips only spaces — the parity
        # class that survived the round-13 sweep because no generator
        # emitted them. Kernels must treat them as ordinary token chars.
        # no \x01/\x02: those are the BpeEncodeSql oracle's IN-BAND
        # segmentation markers (documented precondition there); the
        # engine itself handles them (BpeSpec), but the SQL twin cannot
        # represent them, so emitting them would fail the oracle compare
        # without indicating an engine bug.
        ctl = random.choice(['\x07', '\x1b', '\x7f'])
        core = ' '.join(random.choices(ascii_words, k=random.randint(2, 8)))
        shape = i // 12 % 3
        if shape == 0:
            return ctl + core
        if shape == 1:
            return core + ctl
        return (ctl + core + '\x07' + random.choice(accents) + ' '
                + ''.join(random.choices(cjk, k=3)) + ctl)
    if kind == 11:
        # exotic whitespace-lookalikes (NBSP, ideographic space U+3000,
        # zero-width space): \s in NEITHER Java's default classes NOR
        # RE2 — both engines must keep them INSIDE tokens, so any
        # tokenizer that Unicode-widens its whitespace class on one
        # side only diverges here.
        return ('a\u00a0b ' + random.choice(ascii_words) + '\u3000'
                + random.choice(cjk) + '\u200bz tail ' + str(i))
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
