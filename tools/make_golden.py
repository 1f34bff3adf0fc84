"""Generate the golden-value parquet that oracles the pure text functions.

The driver's hard correctness signal needs SQL-comparable outputs; simhash /
fingerprint / langid / quality are pure functions of ``text`` that plain SQL
can't re-derive, so we precompute them ONCE here with INDEPENDENT scalar
reimplementations (plain Python loops, no numpy vectorization — a
vectorization bug in the library would show up as a golden mismatch) and the
oracle joins ``documents`` against the golden file on ``md5(text)``.

Covers the union of texts across all driver scale factors (texts differ per
sf for the same doc_id). Output: /root/repo/golden/text_golden.parquet.

Run: python tools/make_golden.py
"""

from __future__ import annotations

import hashlib
import re
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

_TOKEN_RE = re.compile(r"\S+")


# --- simhash (mirror of stages/text... no: independent scalar version of
# stages/dedup.SimHasher semantics: crc32 tokens -> 64-bit mix -> bit votes)

_SIMHASH_SALT = int(np.random.RandomState(11).randint(1, 2**63 - 1, dtype=np.int64))


def simhash_scalar(text: str) -> int:
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = (zlib.crc32(t.encode()) * 0x9E3779B97F4A7C15 + _SIMHASH_SALT) % (1 << 64)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if votes[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


# --- fingerprint (stages/text.Fingerprinter semantics: rolling polynomial
# hash base 257 mod 2^55-55 over 16-byte windows, crc32 of 4 smallest)


def fingerprint_scalar(text: str, window: int = 16, keep: int = 4) -> int:
    data = (text or "").encode("utf-8")
    if len(data) <= window:
        return zlib.crc32(data)
    mod = (1 << 55) - 55
    hs = []
    for i in range(len(data) - window + 1):
        acc = 0
        for j in range(window):
            acc = (acc * 257 + data[i + j]) % mod
        hs.append(acc)
    smallest = sorted(hs)[:keep]
    return zlib.crc32(struct.pack("<%dQ" % keep, *smallest))


# --- language id (stages/text.LangId semantics)

_MARKERS = {
    "en": {" the ", " and ", " of ", " to ", " is ", " that ", " it "},
    "fr": {" le ", " la ", " les ", " de ", " et ", " un ", " est ", " que "},
    "es": {" el ", " los ", " de ", " y ", " que ", " en ", " una ", " es "},
    "de": {" der ", " die ", " und ", " das ", " ist ", " ein ", " nicht "},
}


def langid_scalar(text: str) -> str:
    if not text:
        return "unknown"
    cjk = 0
    for ch in text[:200]:
        if "一" <= ch <= "鿿":
            cjk += 1
    if cjk > 2:
        return "zh"
    padded = f" {text.lower()} "
    best, best_score = "unknown", 0
    for lang in ("en", "fr", "es", "de"):
        score = 0
        for m in _MARKERS[lang]:
            score += padded.count(m)
        if score > best_score:
            best, best_score = lang, score
    return best


# --- quality (stages/text.QualityScorer semantics; numpy float64 scalars in
# the same operation order so results are bit-identical)

_PUNCT_RE = re.compile(r"[^\w\s]")
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def quality_scalar(text: str) -> tuple[float, float, float, float]:
    t = text or ""
    toks = t.split()
    stop = np.float64(0.0)
    mean = np.float64(0.0)
    punct = np.float64(0.0)
    if toks:
        mean = np.float64(sum(map(len, toks))) / np.float64(len(toks))
        low = [w.lower() for w in toks]
        stop = np.float64(sum(w in _STOPWORDS for w in low)) / np.float64(len(toks))
    if t:
        punct = np.float64(len(_PUNCT_RE.findall(t))) / np.float64(len(t))
    score = (
        np.float64(0.4) * np.clip(stop * np.float64(4.0), 0, 1)
        + np.float64(0.3) * np.clip(mean / np.float64(8.0), 0, 1)
        + np.float64(0.3) * (np.float64(1.0) - np.clip(punct * np.float64(5.0), 0, 1))
    )
    r = lambda x: float(np.round(np.float64(x), 6))  # noqa: E731
    return r(stop), r(mean), r(punct), r(score)


def main() -> int:
    seen: dict[str, dict] = {}
    for sf in SF_DIRS:
        tbl = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
        for text in tbl["text"].to_pylist():
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key in seen:
                continue
            stop, mean, punct, score = quality_scalar(text)
            seen[key] = {
                "text_md5": key,
                "simhash": simhash_scalar(text),
                "fingerprint": fingerprint_scalar(text),
                "lang_pred": langid_scalar(text),
                "stop_ratio": stop,
                "mean_tok_len": mean,
                "punct_ratio": punct,
                "quality": score,
            }
        print(f"{sf}: cumulative distinct texts = {len(seen)}", file=sys.stderr)
    out = pa.Table.from_pylist(sorted(seen.values(), key=lambda r: r["text_md5"]))
    import os

    os.makedirs("/root/repo/golden", exist_ok=True)
    pq.write_table(out, "/root/repo/golden/text_golden.parquet")
    print(f"wrote {out.num_rows} rows to golden/text_golden.parquet", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
