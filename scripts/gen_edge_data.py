"""Generate edge-case variants of the test dataset for robustness sweeps.

Production pipelines constantly hit inputs the benchmark data never shows:
an empty partition (a day with no events), a batch where every optional
column is NULL, a single-row table. A query that crashes or silently
mis-answers on those is a real production bug even if every sf* gate is
green. This script derives such variants FROM the driver-generated
sf0.001 schemas (never hand-written schemas, so they cannot drift) and
writes them under a target directory with the same `<table>.parquet`
layout, so `tests/oracle_util.py` and the sweep scripts work unchanged.

Variants:
  empty  — every table has 0 rows, schema byte-identical to sf0.001.
  tiny   — every table keeps exactly 1 row (head(1) of sf0.001), so
           joins mostly produce empty results and aggregates hit the
           one-group path.
  nulls  — payload columns nulled on deterministic row strides (join
           keys stay intact): NULL text/lang, NULL timestamps, NULL
           embedding vectors, NULL measures — the shapes a failed
           extractor or encoder batch actually ships. The differential
           gate stays fair because Spark and DuckDB read the same file.
  dupkeys — every 13th row re-appended wholesale (a double-load): used to
           probe the key-uniqueness PRECONDITION (see
           operators/dq.py::dq_pk_uniqueness). The registry's key-join
           operators assume unique PKs and are NOT oracle-compared on
           this variant; the detector query is the gate.
  nullkeys — dupkeys PLUS the primary-key column nulled on every 17th
           row: probes the detector's declared NULL-key semantics (a
           NULL key violates the PK on its own; it must be counted in
           n_null_key_rows and excluded from n_keys/n_duplicate_rows
           IDENTICALLY on both engines — Spark's count_distinct(struct)
           and SQL's COUNT(DISTINCT) disagree on NULLs by default).
           Only the detector is oracle-compared on this variant.
  fuzz   — seeded value-domain perturbations on the same strides:
           negative/zero/huge monetary values, empty strings, tab/newline
           whitespace and non-ASCII text, zero and large-component
           embedding vectors, unseen enum values. The nulls variant
           changes NULL-ness but never values; this variant probes the
           value edges (sign handling in integer div, tokenizer
           whitespace dialects, unicode hashing, overflow headroom).
  textfuzz — adversarial TEXT domain on the documents table: astral-plane
           codepoints (surrogate pairs / 4-byte UTF-8), combining marks
           vs precomposed forms, zero-width + bidi controls inside words,
           C0 control characters, whitespace-only docs, Unicode spaces
           (non-separators under the tokenizer contract), a 100k-token
           document, a 200 KB single token, 50k repetitions of one token,
           spaceless CJK/Hangul, and quasi-PII strings — the tokenizer /
           shingle / regex / hashing surface at its extremes. Heavy
           payloads sit on wide strides (a few rows each) so the sweep
           stays minutes, not hours.
  longdoc — per-row text VOLUME on the documents table (round-11 verdict
           task 4): a few documents at 1-8 MB — a ~1 MB high-vocabulary
           token stream (shingle/minhash array width), a ~4 MB highly
           repetitive body (CDC chunking, dedup signatures, compression-
           ratio quality gates), and an 8 MB single token with no
           whitespace at all (tokenizer/regex scan cost, Arrow batch
           sizing through mapInPandas, single-shingle degenerate case).
           The other ~500 documents stay normal, so per-row blow-ups
           surface as wall/heap cliffs against an otherwise ordinary
           corpus. Everything else (strides, both-engines-read-one-file
           fairness) mirrors textfuzz.

Usage:  python scripts/gen_edge_data.py <variant> <out_dir> [src_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (modulus, remainder) stride per nulled column — distinct primes so the
# null patterns overlap in varied combinations; join/id keys never nulled.
NULL_PLAN: dict[str, dict[str, tuple[int, int]]] = {
    "documents": {"text": (3, 0), "lang": (5, 1), "source": (7, 2)},
    "events": {
        "event_type": (5, 0),
        "value": (3, 1),
        "props": (2, 0),
        "ts": (11, 3),
    },
    "embeddings": {"label": (4, 1), "embedding": (13, 5)},
    "orders": {
        "o_orderstatus": (5, 2),
        "o_orderpriority": (7, 1),
        "o_totalprice": (11, 4),
        "o_orderdate": (13, 6),
    },
    "lineitem": {
        "l_returnflag": (5, 3),
        "l_linestatus": (7, 4),
        "l_shipdate": (11, 2),
        "l_quantity": (13, 1),
        "l_extendedprice": (17, 0),
        "l_discount": (19, 5),
        "l_tax": (23, 7),
    },
    "customer": {"c_mktsegment": (5, 0), "c_acctbal": (7, 3), "c_name": (11, 2)},
}


# fuzz plan: column -> list of (modulus, remainder, replacement-or-callable).
# Deterministic strides (no RNG), values chosen to probe a specific edge:
# sign handling in integer div, sub-cent rounding, the 12.5-cent half-way
# point (exactly representable in double -> exposes HALF_UP vs banker's),
# empty/whitespace/unicode strings through tokenizers and hashes, unseen
# enum values, zero-norm / large-component vectors.
_FUZZ_TEXTS = [
    "",
    "hello\tworld\nnewline  double-space",
    "café 北京 Ωμέγα \U0001f389 mixed unicode",
    "spam " * 500,
    "x",
    "   ",
]
FUZZ_PLAN: dict[str, dict[str, list]] = {
    "documents": {
        "text": [(17, k, t) for k, t in enumerate(_FUZZ_TEXTS)],
        "lang": [(13, 0, "xx"), (13, 1, "")],
        "source": [(11, 0, "weird source/with:punct")],
    },
    "events": {
        "value": [
            (7, 0, -123.456),
            (7, 1, 0.0),
            (7, 2, 123456789.99),
            (7, 3, 1e-9),
            (7, 4, 0.125),
        ],
        "event_type": [(19, 0, ""), (19, 1, "UNKNOWN_TYPE"), (19, 2, "click ")],
        "props": [
            (23, 0, ""),
            (23, 1, "not json"),
            (23, 2, '{"k":"v","nested":{"a":[1,2]}}'),
            # fractional / negative-fractional / overflowing numeric k:
            # exercises the floored-numeric policy (engines' direct
            # to-BIGINT casts disagree on 3.7) and the finite-magnitude
            # guard (1e400 parses to +inf)
            (23, 3, '{"k": 3.7}'),
            (23, 4, '{"k": -2.5}'),
            (23, 5, '{"k": 1e400}'),
        ],
    },
    "orders": {
        "o_totalprice": [
            (7, 0, -500.25),
            (7, 1, 0.0),
            (7, 2, 99999999.99),
            (7, 3, 0.125),
        ],
        "o_orderstatus": [(13, 0, "Z")],
        "o_orderpriority": [(11, 0, "9-EXPERIMENTAL")],
    },
    "lineitem": {
        "l_quantity": [(19, 0, 0.0), (19, 1, -5.0)],
        "l_discount": [(23, 0, 1.5)],
        "l_returnflag": [(29, 0, "")],
        "l_extendedprice": [(31, 0, 0.008)],
    },
    "customer": {
        "c_acctbal": [(7, 0, -999.99), (7, 1, 0.0)],
        "c_mktsegment": [(11, 0, "")],
        "c_name": [(13, 0, "O'Brien \"quote\" \\ backslash")],
    },
    "embeddings": {
        "embedding": [
            (17, 0, lambda v: [0.0] * len(v)),
            (17, 1, lambda v: [1e6] * len(v)),
            (17, 2, lambda v: [1e-9] * len(v)),
            # a NaN component and a zero-length vector: the contract must
            # exclude both identically on both engines, and the quarantine
            # report must label them
            (17, 3, lambda v: [float("nan")] + [0.1] * (len(v) - 1)),
            (17, 4, lambda v: []),
        ],
        "label": [(13, 0, -1)],
    },
}


# textfuzz plan: documents.text only, deterministic strides. Light texts on
# stride 17 (~30 rows each at sf0.001's 500 docs); heavy texts (100k tokens,
# 200 KB token, 50k repetitions) on stride 167 (~3 rows each) so the
# quadratic-ish consumers (shingle explode in the jaccard oracle, inverted
# index) stay bounded while still exercising the extreme.
_TEXTFUZZ_LIGHT = [
    # astral-plane codepoints: math alphanumerics, Deseret, emoji with ZWJ
    # and skin-tone modifiers — every one a surrogate pair in the JVM
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝒜ℬ𝒞 𐐷𐑊 😀 👨‍👩‍👧‍👦 👍🏽 end of astral plane",
    # combining marks: NFD sequences alongside their precomposed twins
    # (NOT equal under either engine — no implicit normalization)
    "café noël ångström vs café noël ångström",
    # zero-width and bidi controls INSIDE words: token bytes, not breaks
    "zero​width‌non‍joiner bidi ‮reversed‬ tail",
    # C0 controls + DEL are token bytes; VT and FF are SEPARATORS under
    # the tokenizer contract (Java \\s class, pinned round 8)
    "ctrl\x01\x02\x03chars\x7fdel\x0bvtab\x0cffeed tail",
    # whitespace-only: trims/tokenizes to nothing without being NULL
    " \t\n\x0b\f\r \t ",
    # Unicode spaces are NOT separators: this is ONE token
    "nbsp\xa0thin ideo　nel\x85line para joined",
    # spaceless CJK/Hangul with fullwidth punctuation: one giant token,
    # plus an ascii tail so the doc still has >= 3 tokens for shingles
    "한국어텍스트와中文文本が混ざった文。全角！？＃ ascii tail here",
    # quasi-PII through the redaction/regex surface
    "mail a.b+c@ex-ample.co.uk ip 192.168.001.255 card 4111 1111 1111 1111",
    # mojibake artifacts through the encoding-quality gate, built from
    # ESCAPES so no editor/transport can re-encode them: double-encoded
    # e-acute (the UTF-8 bytes of \xe9 read back as latin-1), the
    # cp1252-decoded right quote/en-dash, a replacement char, C1
    # controls (\x85 NEL is exempt), and 'A-circumflex + NBSP'
    "clich\u00c3\u00a9 caf\u00c3\u00a9 quote\u00e2\u20ac\u2122s "
    "dash\u00e2\u20ac\u2013here bad\ufffdbyte c1\x8acontrol nel\x85ok "
    "nbsp\u00c2\u00a0tail",
    # URLs through the domain-extraction gate: case-folding, subdomains,
    # ports/paths/queries stop the host class, a repeated domain
    "see https://Example.COM/path then http://sub.domain.org?q=1 and "
    "https://example.com/other plus https://a-b.c9.net:8443/x no-scheme "
    "www.skipped.org end",
]
_TEXTFUZZ_HEAVY = [
    " ".join(f"tok{i % 997}x{i % 31}" for i in range(100_000)),
    "y" * 200_000,
    "spam " * 50_000,
]
TEXTFUZZ_PLAN: dict[str, dict[str, list]] = {
    "documents": {
        "text": (
            [(17, k, t) for k, t in enumerate(_TEXTFUZZ_LIGHT)]
            + [(167, 11 + k, t) for k, t in enumerate(_TEXTFUZZ_HEAVY)]
        ),
        "lang": [(29, 0, "und"), (29, 1, "")],
    },
}


# longdoc plan: documents.text only. Three MB-scale bodies on stride 167
# (~3 rows each at sf0.001's ~500 docs) — volume, not adversarial bytes;
# textfuzz owns the byte-level edges. All deterministic, no RNG.
def _longdoc_stream(n_tokens: int) -> str:
    # high-vocabulary token stream: ~1009*97 distinct tokens, so shingle
    # and minhash arrays are as wide as the token count allows
    return " ".join(f"w{i % 1009}a{i % 97}" for i in range(n_tokens))


_LONGDOC_TEXTS = [
    # ~1.1 MB, 140k tokens, high vocabulary: the token-COUNT stressor
    # (shingle/minhash arrays, BPE pair counting, surprisal tables). Kept
    # as the only six-figure token count on purpose — the shingle oracles
    # explode one row per token on BOTH engines, so token count is the
    # sweep-wall driver while BYTE volume is nearly free.
    _longdoc_stream(140_000),
    # ~3.9 MB from 60k LONG (64-char) tokens over a 41-word vocabulary:
    # the byte-volume + repetition stressor (CDC chunk boundaries,
    # compression-ratio quality gates, signature hashing over MB bodies)
    # without multiplying the explode row count
    " ".join("blk" + "x" * 56 + f"{i % 41:02d}" for i in range(60_000)),
    # 8 MB, ONE token: no whitespace anywhere (tokenizer/regex scan cost,
    # Arrow batch sizing, the single-shingle degenerate case)
    "z" * 8_000_000,
]
# Copy counts are deliberate: the MB volume PER ROW is the stressor, so
# the stream and single-token bodies appear once (modulus 499 > row count
# at sf0.001 = exactly one row), while the repetitive body appears twice
# (modulus 251 -> two rows) so cross-document duplicate chunks/signatures
# still have a twin to pair with. Tripling every text only multiplied the
# linear-but-constant-heavy consumers' wall (CDC: ~260s/copy-set).
LONGDOC_PLAN: dict[str, dict[str, list]] = {
    "documents": {
        "text": [
            (499, 50, _LONGDOC_TEXTS[0]),
            (251, 60, _LONGDOC_TEXTS[1]),
            (499, 70, _LONGDOC_TEXTS[2]),
        ],
    },
}


def _with_fuzz(tbl: pa.Table, plan: dict[str, list]) -> pa.Table:
    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    for col, rules in plan.items():
        i = tbl.schema.get_field_index(col)
        vals = tbl.column(i).to_pylist()
        for m, r, repl in rules:
            for j in range(r % m, n, m):
                if vals[j] is None:
                    continue
                vals[j] = repl(vals[j]) if callable(repl) else repl
        arr = pa.array(vals, type=tbl.column(i).type)
        tbl = tbl.set_column(i, tbl.schema.field(i), arr)
    return tbl


# primary-key columns for the nullkeys variant — mirrors
# operators/dq.py::_PK_MAP (kept literal here so the generator stays
# importable without a Spark session; test_dq pins the two in sync)
PK_COLS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _with_nulls(tbl: pa.Table, plan: dict[str, tuple[int, int]]) -> pa.Table:
    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    for col, (m, r) in plan.items():
        mask = pa.array([i % m == r % m for i in range(n)], type=pa.bool_())
        i = tbl.schema.get_field_index(col)
        nulled = pc.if_else(mask, pa.scalar(None, tbl.column(i).type), tbl.column(i).combine_chunks())
        tbl = tbl.set_column(i, tbl.schema.field(i), nulled)
    return tbl


def generate(variant: str, out_dir: str | Path, src_dir: str | Path = "/root/testdata/sf0.001") -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = Path(src_dir) / f"{t}.parquet"
        tbl = pq.read_table(src)
        if variant == "empty":
            tbl = tbl.slice(0, 0)
        elif variant == "tiny":
            tbl = tbl.slice(0, 1)
        elif variant == "nulls":
            tbl = _with_nulls(tbl, NULL_PLAN.get(t, {}))
        elif variant == "fuzz":
            tbl = _with_fuzz(tbl, FUZZ_PLAN.get(t, {}))
        elif variant == "textfuzz":
            tbl = _with_fuzz(tbl, TEXTFUZZ_PLAN.get(t, {}))
        elif variant == "longdoc":
            tbl = _with_fuzz(tbl, LONGDOC_PLAN.get(t, {}))
        elif variant in ("dupkeys", "nullkeys"):
            tbl = tbl.combine_chunks()
            idx = list(range(tbl.num_rows)) + list(
                range(0, tbl.num_rows, 13)
            )
            tbl = tbl.take(pa.array(idx, type=pa.int64()))
            if variant == "nullkeys" and t in PK_COLS:
                tbl = _with_nulls(
                    tbl, {k: (17, 5) for k in PK_COLS[t]}
                )
        else:
            raise ValueError(f"unknown variant {variant!r}")
        pq.write_table(tbl, out / f"{t}.parquet")
    return out


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "empty"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/edge_{variant}"
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    p = generate(variant, out_dir, src)
    print(f"wrote {variant} variant to {p}")
