"""Deterministic synthetic WAL: binlog-style change events over pages.

Replaces the reference's Kafka/file loaders (plugins/kafka, group.id +
offset semantics at plugins/kafka/src/plugin.cpp:55-65) with deterministic
file-based binlog segments: ``wal/epoch={e}/part-{i}.parquet``, totally
ordered by a strictly-increasing ``lsn``. Offsets are recovered from commit
manifests as ``(epoch, max_lsn)`` instead of broker-side consumer state.

The generator is seeded and scale-free: url domains are Zipf-distributed so
url *prefixes* are hot (FIXTURES.md §1 — exercises skew handling), re-crawls
produce duplicate ``(url)`` keys with later ``warc_ts`` (LWW), DELETEs are
tombstones, and fixed epochs inject the three schema-evolution episodes:

- E_add   : add column ``title: string``        (older rows → null)
- E_widen : widen ``lang`` dictionary → string  (cast at merge)
- E_rename: rename ``text`` → ``body``          (explicit alias map)

``text`` is a deterministic pure function of ``html`` (tag-strip), so the
per-url byte-identical-text invariant is checkable against any replay.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TAG = re.compile(rb"<[^>]*>")

LANGS = [
    "en", "de", "fr", "es", "pt", "it", "nl", "ru", "ja", "zh",
    "ko", "ar", "tr", "pl", "sv", "da", "fi", "no", "cs", "el",
    "he", "hi", "id", "ms", "th", "vi", "uk", "ro", "hu", "bg",
    "hr", "sk", "sl", "lt", "lv", "et", "fa", "bn", "ta", "ca",
]

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "data stream engine arrow parquet shuffle actor block epoch commit".split()
)


def extract_text(html: bytes | None) -> str | None:
    """Deterministic extraction: strip tags (→ space), trim ends.

    This is THE invariant function — the lake's final ``text`` per url must
    be byte-identical to applying this to the last-writer-wins ``html``.
    ``extract_text_column`` is its vectorized Arrow form; both must agree
    byte-for-byte.
    """
    if html is None:
        return None
    return _TAG.sub(b" ", html).decode("utf-8", "replace").strip()


def extract_text_column(html) -> "pa.Array":
    """Vectorized ``extract_text`` over a binary array: Arrow C++ regex
    replace + trim (≈3.5 µs/row vs ≈10 µs/row for the per-row Python
    kernel); Python fallback when html is not valid UTF-8."""
    import pyarrow.compute as pc

    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        s = html.cast(pa.string())
        s = pc.replace_substring_regex(s, pattern="<[^>]*>", replacement=" ")
        return pc.utf8_trim_whitespace(s)
    except pa.ArrowInvalid:
        return pa.array([extract_text(v) for v in html.to_pylist()], pa.string())


@dataclass
class WalSpec:
    n_events: int = 10_000
    n_urls: int = 2_000
    n_epochs: int = 8
    seed: int = 42
    parts_per_epoch: int = 2
    zipf_s: float = 1.2
    p_update: float = 0.25
    p_delete: float = 0.05
    html_mean_len: int = 400
    # schema-evolution episodes (epoch index or -1 to disable)
    epoch_add_title: int = -1
    epoch_widen_lang: int = -1
    epoch_rename_text: int = -1


def _make_urls(spec: WalSpec, rng: np.random.Generator) -> np.ndarray:
    n_domains = max(2, spec.n_urls // 100)
    # Zipf-ranked domain for each url → hot url prefixes.
    ranks = rng.zipf(spec.zipf_s, size=spec.n_urls) % n_domains
    paths = rng.integers(0, 1 << 40, size=spec.n_urls)
    return np.array(
        [
            f"https://d{r:04d}.example.com/p/{p:011x}"
            for r, p in zip(ranks, paths)
        ]
    )


def _gen_html(
    rng: np.random.Generator, n: int, mean_len: int
) -> tuple[list[bytes], list[str]]:
    """Vectorized page generator → (html, text) where text is exactly
    ``extract_text(html)`` by construction (title + body words)."""
    lens = np.minimum(
        rng.lognormal(np.log(mean_len), 0.6, size=n).astype(np.int64) // 8 + 3,
        8192,
    )
    pool = _WORDS[rng.integers(0, len(_WORDS), size=int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    html = []
    for i in range(n):
        words = pool[offs[i]: offs[i + 1]]
        body = " ".join(words)
        html.append(
            (
                f"<html><head><title>{words[0]}</title></head>"
                f"<body><p>{body}</p></body></html>"
            ).encode()
        )
    text = extract_text_column(pa.array(html, pa.binary())).to_pylist()
    return html, text


def generate_wal(out_dir: str, spec: WalSpec | None = None) -> dict:
    """Write ``{out_dir}/epoch={e}/part-{i}.parquet`` segments. Returns a
    summary dict (n_events, n_epochs, url count). Deterministic in seed.
    """
    spec = spec or WalSpec()
    rng = np.random.default_rng(spec.seed)
    urls = _make_urls(spec, rng)
    langs = np.array(LANGS)
    # Zipf lang distribution
    lang_of_url = langs[rng.zipf(1.3, size=spec.n_urls) % len(langs)]

    per_epoch = spec.n_events // spec.n_epochs
    lsn0 = 0
    base_ts = np.datetime64("2025-01-01T00:00:00", "ns")
    for e in range(spec.n_epochs):
        n = per_epoch if e < spec.n_epochs - 1 else spec.n_events - lsn0
        # op mix: first epoch all inserts so updates/deletes hit existing urls
        r = rng.random(n)
        if e == 0:
            ops = np.zeros(n, dtype=np.int8)
        else:
            ops = np.where(
                r < spec.p_delete, 2, np.where(r < spec.p_delete + spec.p_update, 1, 0)
            ).astype(np.int8)
        uidx = rng.integers(0, spec.n_urls, size=n)
        lsn = np.arange(lsn0, lsn0 + n, dtype=np.int64)
        lsn0 += n
        # warc_ts: mostly increasing with jitter; duplicates per url happen
        ts = base_ts + (lsn * 1_000_000_000 + rng.integers(0, 5_000_000_000, n)).astype(
            "timedelta64[ns]"
        )
        html, text = _gen_html(rng, n, spec.html_mean_len)
        is_del = ops == 2
        html_col = [None if d else h for h, d in zip(html, is_del)]
        text_col = [None if d else s for s, d in zip(text, is_del)]
        lang_col = [None if d else l for l, d in zip(lang_of_url[uidx], is_del)]
        op_str = np.array(["INSERT", "UPDATE", "DELETE"])[ops]

        cols: dict[str, pa.Array] = {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(op_str).dictionary_encode().cast(
                pa.dictionary(pa.int8(), pa.string())
            ),
            "url": pa.array(urls[uidx], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ns")),
            "html": pa.array(html_col, pa.binary()),
        }
        text_name = "body" if 0 <= spec.epoch_rename_text <= e else "text"
        cols[text_name] = pa.array(text_col, pa.string())
        if 0 <= spec.epoch_widen_lang <= e:
            cols["lang"] = pa.array(lang_col, pa.string())
        else:
            cols["lang"] = pa.array(lang_col, pa.string()).dictionary_encode().cast(
                pa.dictionary(pa.int8(), pa.string())
            )
        if 0 <= spec.epoch_add_title <= e:
            cols["title"] = pa.array(
                [None if d else f"t-{u}" for u, d in zip(uidx, is_del)], pa.string()
            )
        table = pa.table(cols)

        edir = os.path.join(out_dir, f"epoch={e:05d}")
        os.makedirs(edir, exist_ok=True)
        nparts = spec.parts_per_epoch
        step = (n + nparts - 1) // nparts
        for i in range(nparts):
            part = table.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part, os.path.join(edir, f"part-{i:03d}.parquet"))
        # seal marker written LAST: a live tailer (Lake.follow) treats an
        # epoch as ready only once sealed, so half-written segments are
        # never consumed (binlog segment-roll convention)
        open(os.path.join(edir, "_sealed"), "w").close()
    return {
        "n_events": spec.n_events,
        "n_epochs": spec.n_epochs,
        "n_urls": spec.n_urls,
        "out_dir": out_dir,
    }


def list_epochs(wal_dir: str) -> list[tuple[int, list[str]]]:
    """[(epoch, [part files sorted])] ascending by epoch."""
    out = []
    if not os.path.isdir(wal_dir):
        return out
    for name in sorted(os.listdir(wal_dir)):
        if name.startswith("epoch="):
            e = int(name.split("=", 1)[1])
            edir = os.path.join(wal_dir, name)
            files = sorted(
                os.path.join(edir, f)
                for f in os.listdir(edir)
                if f.endswith(".parquet")
            )
            out.append((e, files))
    # numeric, not lexical: 'epoch=100000' sorts before 'epoch=99999'
    # in directory-listing order
    out.sort(key=lambda ef: ef[0])
    return out
