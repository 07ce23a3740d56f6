#!/usr/bin/env python
"""NFD-decomposed-text probe (r12 §7.4o late axis, mechanized r13 as
a permanent tool): regenerate the adversarial fixture, then rewrite
`documents` with every text NFD-normalized (unicodedata) plus six
NFD-hostile documents — decomposed Hangul jamo, Latin combining
stacks, an NFC/NFD twin pair, a >57-byte-prefix doc (the payload
class that exposed Spark base64()'s CRLF MIME-chunking in r12), and
a combining-mark-initial doc. n_chars is recomputed from the NFD
text so the metadata column stays truthful.

Why this axis: NFD multiplies bytes-per-codepoint and surfaces any
op that conflates codepoints with graphemes or bytes with chars —
the two r12 finds were str_encode_b64_hex (REAL, fixed r13) and
udf_arrow_scalar (the documented r5 reverse-grapheme contract, out
of contract by design).

Usage:
  python tools/probe_nfd_text.py [out_dir]   # default below
then
  python tools/parity_sweep.py <out_dir>

Expected adjudication on a healthy tree (r13+): 290/291 — only the
udf_arrow_scalar grapheme contract remains.
"""

from __future__ import annotations

import os
import subprocess
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_nfd"
HERE = os.path.dirname(os.path.abspath(__file__))

# Six NFD-hostile documents (single-spaced, nonempty — the fixture's
# documented text conventions hold). All literals are escape-spelled
# so no literal combining bytes sit in this source file.
HOSTILE = [
    # decomposed Hangul jamo (NFD of '한국어' + filler)
    unicodedata.normalize("NFD", "한국어 텍스트 예시 문서 한글 본문"),
    # combining stacks: base letters with 3-deep combining marks
    "á̂̃ è̖̣ ȫ̰ text with stacks",
    # NFC twin of the next doc (the pair must stay DISTINCT rows)
    unicodedata.normalize("NFC", "café naïve résumé words"),
    # NFD twin
    unicodedata.normalize("NFD", "café naïve résumé words"),
    # >57-byte 24-codepoint prefix: NFD Hangul at 3 bytes/codepoint
    unicodedata.normalize("NFD", "가각간갈감갑강같 " * 4).strip(),
    # combining-mark-initial text (no base char before the mark)
    "́leading mark then words",
]


def main() -> None:
    subprocess.run(
        [sys.executable, os.path.join(HERE, "adversarial_fixture.py"), OUT],
        check=True,
    )
    path = os.path.join(OUT, "documents.parquet")
    t = pq.read_table(path)
    cols = {c: t.column(c).to_pylist() for c in t.schema.names}
    n = len(cols["doc_id"])
    cols["text"] = [
        unicodedata.normalize("NFD", x) if x is not None else None
        for x in cols["text"]
    ]
    langs = [x for x in cols["lang"] if x is not None] or ["en"]
    sources = [x for x in cols["source"] if x is not None] or ["web"]
    base_id = max(x for x in cols["doc_id"] if x is not None) + 1
    for i, text in enumerate(HOSTILE):
        cols["doc_id"].append(base_id + i)
        cols["text"].append(text)
        cols["lang"].append(langs[i % len(langs)])
        cols["source"].append(sources[i % len(sources)])
        cols["n_chars"].append(None)  # recomputed below
    cols["n_chars"] = [
        len(x) if x is not None else None for x in cols["text"]
    ]
    out = pa.table(
        {c: pa.array(cols[c], type=t.schema.field(c).type) for c in t.schema.names}
    )
    pq.write_table(out, path)
    print(
        f"NFD probe fixture at {OUT}: {n} docs NFD-normalized, "
        f"{len(HOSTILE)} hostile docs appended (ids {base_id}..{base_id + len(HOSTILE) - 1})"
    )


if __name__ == "__main__":
    main()
