"""Deterministic synthetic `web_pages` corpus (FIXTURES.md §1).

Common-Crawl-style table: (url, warc_ts, html, text, lang). Zipfian
vocabulary (~10k terms, s≈1.07) so head-term skew is real; doc lengths
10–2000 tokens; html is constructed so that
``functions.text.extract_text(html)`` reproduces ``text``
**byte-identically** (the per-row invariant from BASELINE.json).

Generation is row-index-deterministic: row i has identical content at
any scale and any partitioning, because randomness is drawn from a
fixed-size batch generator seeded by (SEED, i // BATCH). This is the
scale path: `synth_pages_df` distributes generation with mapInPandas
over `spark.range(n)` — no driver-side materialization.

Reference analog: the reference has no data generator (it moves live ES
indexes); determinism here substitutes for its live-cluster fixtures
(/root/reference/service/task/taskmgr_test.go:12-40).
"""

from __future__ import annotations

import datetime as dt
import html as html_mod

import numpy as np
import pandas as pd

SEED = 42
BATCH = 4096  # rows per deterministic generation batch (fixed forever)
VOCAB_SIZE = 10_000
ZIPF_S = 1.07

# Tokens with html-escapable punctuation, mixed in at low probability to
# make the byte-identity invariant non-trivial (escape → unescape).
_SPICE = ["r&d", "x<y", "a>b", 'say"no"', "don't"]


def vocabulary() -> list[str]:
    """Deterministic vocab: rank-ordered synthetic terms.

    term0000 is the head (highest-df) term; term9999 the rarest.
    """
    return [f"term{i:04d}" for i in range(VOCAB_SIZE)]


_VOCAB = np.array(vocabulary())
_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S)
_P /= _P.sum()

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _doc_html(text: str, row_idx: int) -> bytes:
    """Wrap `text` in html such that extract_text(html) == text, byte-for-byte.

    Head (incl. title) and script/style blocks are dropped by the
    extractor; body paragraphs concatenate with single spaces.
    """
    toks = text.split(" ")
    # split into up to 4 paragraphs at deterministic points
    n = len(toks)
    cuts = sorted({n // 4, n // 2, (3 * n) // 4} - {0, n})
    parts, prev = [], 0
    for c in cuts + [n]:
        if c > prev:
            parts.append(" ".join(toks[prev:c]))
            prev = c
    paras = "".join(f"<p class=\"c{i}\">{html_mod.escape(p)}</p>" for i, p in enumerate(parts))
    doc = (
        f"<html><head><title>doc {row_idx}</title>"
        f"<meta charset=\"utf-8\"/><style>p{{margin:0}}</style></head>"
        f"<body><script>var x={row_idx} &amp;&amp; 1;</script>"
        f"{paras}"
        f"<!-- comment {row_idx} --></body></html>"
    )
    return doc.encode("utf-8")


def gen_batch(batch_id: int, n_rows: int, start_idx: int) -> pd.DataFrame:
    """Generate `n_rows` rows beginning at global row `start_idx`.

    Must be called with start_idx == batch_id * BATCH and
    n_rows <= BATCH for cross-scale determinism.
    """
    rng = np.random.default_rng([SEED, batch_id])
    # doc lengths: lognormal clipped to [10, 2000]
    lens = np.clip(np.exp(rng.normal(4.6, 0.9, size=BATCH)), 10, 2000).astype(np.int64)
    total = int(lens.sum())
    token_idx = rng.choice(VOCAB_SIZE, size=total, p=_P)
    spice_mask = rng.random(total) < 0.001
    langs = rng.choice(np.array(["en", "en", "en", "en", "de", "fr"]), size=BATCH)

    rows = []
    off = 0
    for j in range(n_rows):
        i = start_idx + j
        L = int(lens[j])
        toks = _VOCAB[token_idx[off : off + L]].tolist()
        for k in np.flatnonzero(spice_mask[off : off + L]):
            toks[int(k)] = _SPICE[int(token_idx[off + int(k)]) % len(_SPICE)]
        off += L
        text = " ".join(toks)
        ts = _EPOCH + dt.timedelta(seconds=i * 7, milliseconds=(i * 137) % 1000)
        rows.append(
            {
                "url": f"https://site{i % 997}.example/{i}",
                "warc_ts": ts,
                "html": _doc_html(text, i),
                "text": text,
                "lang": str(langs[j]),
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_pages_df(spark, n_docs: int, num_partitions: int | None = None):
    """Distributed deterministic generation of n_docs web_pages rows.

    Partition boundaries are aligned to BATCH so content is identical
    at any parallelism level (the two-cluster-size scaling evidence
    depends on this).
    """
    from ela_lib_spark.schemas import WEB_PAGES

    n_batches = (n_docs + BATCH - 1) // BATCH
    if num_partitions is None:
        num_partitions = min(n_batches, 64)
    batches = spark.range(0, n_batches, 1, num_partitions)

    def gen(it):
        for pdf in it:
            for b in pdf["id"].tolist():
                start = b * BATCH
                n = min(BATCH, n_docs - start)
                if n > 0:
                    yield gen_batch(int(b), n, start)

    return batches.mapInPandas(gen, schema=WEB_PAGES)


def write_web_pages(spark, n_docs: int, path: str, num_partitions: int | None = None) -> None:
    synth_pages_df(spark, n_docs, num_partitions).write.mode("overwrite").parquet(path)


def reference_queries() -> list[dict]:
    """Fixed reference query set (FIXTURES.md §2).

    Shapes: single-term, 2–3-term OR, 2–3-term AND, and the
    WAND-stressing head+rare mix. term0000 = head, term7xxx = rare.
    """
    return [
        {"name": "single_head", "terms": ["term0000"], "mode": "OR"},
        {"name": "single_mid", "terms": ["term0120"], "mode": "OR"},
        {"name": "single_rare", "terms": ["term7321"], "mode": "OR"},
        {"name": "or2", "terms": ["term0005", "term0417"], "mode": "OR"},
        {"name": "or3", "terms": ["term0031", "term0290", "term1500"], "mode": "OR"},
        {"name": "and2", "terms": ["term0002", "term0045"], "mode": "AND"},
        {"name": "and3", "terms": ["term0001", "term0010", "term0100"], "mode": "AND"},
        {"name": "head_rare_or", "terms": ["term0000", "term6123"], "mode": "OR"},
        {"name": "head_rare_and", "terms": ["term0003", "term5011"], "mode": "AND"},
        {"name": "or2_mid", "terms": ["term0800", "term2222"], "mode": "OR"},
    ]
