"""Corpus-shaping operators for training-data curation: per-key quota
capping (domain-mix control) and benchmark decontamination (test-set
n-gram overlap removal, the GPT-3/Pile protocol).

Reference analogs: Tenzir's `deduplicate key, limit=n`
(operators/deduplicate.cpp:126 — per-key emission limit) and the
context-enrich membership probe (contexts/lookup_table.cpp) — both
re-expressed Ray-Data-first.

Scale notes:
* ``cap_per_key`` pre-reduces INSIDE each batch before the keyed
  shuffle (per-batch top-n per key), so the exchange carries at most
  ``n × keys_per_batch`` rows per block, not the corpus — the
  combiner pattern that keeps a 100 TB per-domain quota from moving
  every row.
* ``decontaminate`` broadcasts the benchmark's n-gram hash set ONCE
  (``ray.put`` of a sorted uint64 array, ~8 B per distinct n-gram);
  each actor binary-searches its batches against it. The corpus never
  shuffles; benchmark sets (even 10 M n-grams = 80 MB) fit every
  worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.text.dedup import _shingle_hashes


def _top_n_table(t: pa.Table, key_col: str, n: int, order_by: str,
                 descending: bool, id_col: str) -> pa.Table:
    """Arrow-native top-n per key: one ``pc.sort_indices`` over
    (key, order_by, id) + a vectorized within-run rank — no pandas
    conversion (VERDICT r03 #5). Null keys form a real group (SQL
    PARTITION BY semantics): they sort as a distinct run via the
    (string-filled, is_null) derived pair."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return t
    key = t.column(key_col)
    gk = pc.fill_null(pc.cast(key, pa.string()), "").combine_chunks()
    nul = pc.is_null(key).combine_chunks()
    tmp = t.append_column("__tn_k", gk).append_column("__tn_n", nul)
    idx = pc.sort_indices(tmp, sort_keys=[
        ("__tn_k", "ascending"), ("__tn_n", "ascending"),
        (order_by, "descending" if descending else "ascending"),
        (id_col, "ascending"),
    ]).to_numpy()
    gks, nuls = gk.take(pa.array(idx)), nul.take(pa.array(idx))
    change = np.ones(len(idx), dtype=bool)
    if len(idx) > 1:
        change[1:] = (
            np.asarray(pc.not_equal(gks.slice(1), gks.slice(0, len(idx) - 1)))
            | np.asarray(pc.not_equal(nuls.slice(1),
                                      nuls.slice(0, len(idx) - 1)))
        )
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    rank = np.arange(len(idx)) - starts[run_id]
    keep = np.sort(idx[rank < n])  # original row order within the block
    return t.take(pa.array(keep))


def cap_per_key(
    ds: Dataset, key_col: str, n: int, order_by: str,
    descending: bool = True, id_col: str = "doc_id",
) -> Dataset:
    """Keep at most ``n`` rows per ``key_col`` value, preferring rows
    with the highest (``descending=True``) ``order_by`` value;
    deterministic tie-break by ascending ``id_col``. The domain-quota /
    source-rebalancing primitive (cap web-crawl domains, per-source
    mixture control).

    Two stages, both zero-copy Arrow: a per-batch combiner (top-n per
    key inside each batch — correct because the global top-n per key is
    a subset of every batch-local top-n union) then one keyed
    ``map_groups`` finalize."""
    import pyarrow.compute as pc

    # Ray's sort-based groupby cannot order None vs str, so group on a
    # null-safe derived pair: (key-as-string with nulls filled, is_null
    # flag) — injective, so co-location per original key is preserved
    # and null keys form their own group (SQL PARTITION BY semantics).
    def partial(t: pa.Table) -> pa.Table:
        t = _top_n_table(t, key_col, n, order_by, descending, id_col)
        c = t.column(key_col)
        t = t.append_column("__cpk_nul", pc.is_null(c))
        t = t.append_column(
            "__cpk_key", pc.fill_null(pc.cast(c, pa.string()), ""))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    def finalize(g: pa.Table) -> pa.Table:
        out = _top_n_table(g, key_col, n, order_by, descending, id_col) \
            .drop_columns(["__cpk_key", "__cpk_nul"])
        return out.replace_schema_metadata(None) if out.schema.metadata \
            else out

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    return pruned.groupby(["__cpk_key", "__cpk_nul"]).map_groups(
        finalize, batch_format="pyarrow")


def mixture_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-row sampling hash in [0, 2^32): Knuth
    multiplicative over a xor-folded id. Chosen to be exactly
    expressible in ANSI SQL for oracle checks:
    ``(xor(id, id >> 17) * 2654435761) % 4294967296``."""
    ids = ids.astype(np.uint64)
    return ((ids ^ (ids >> np.uint64(17))) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)


def sample_mixture(
    ds: Dataset, rates: dict[str, float], key_col: str = "source",
    id_col: str = "doc_id", default_rate: float = 0.0,
) -> Dataset:
    """Deterministic stratified sampling for domain-mixture control:
    keep each row with probability ``rates[key]`` (else
    ``default_rate``), decided by a pure hash of ``id_col`` — no RNG
    state, so the sample is reproducible, resumable across retries, and
    identical at any parallelism. Pure ``map_batches`` filter: no
    shuffle, no driver traffic, the scale-safe way to re-weight a
    100 TB corpus mix (cf. The Pile / DoReMi mixture weights).

    Reference analog: Tenzir `sample` (operators/sample.cpp) is
    rate-based but stateful-sequential; this is the order-free keyed
    variant."""
    keys = list(rates)
    key_arr = pa.array(keys, pa.string())
    thresholds = np.array(
        [min(max(rates[k], 0.0), 1.0) * (1 << 32) for k in keys]
        + [min(max(default_rate, 0.0), 1.0) * (1 << 32)], np.float64)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = mixture_hash(t.column(id_col).to_numpy(zero_copy_only=False))
        idx = pc.index_in(t.column(key_col), key_arr) \
            .to_numpy(zero_copy_only=False)
        idx = np.where(np.isnan(idx.astype(np.float64)), len(keys),
                       idx).astype(np.int64)
        return t.filter(pa.array(h < thresholds[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def _decontam_batch(t: pa.Table, bench: np.ndarray, text_col: str,
                    ngram: int, threshold: int) -> pa.Table:
    """Flag documents sharing ≥ ``threshold`` distinct word-``ngram``
    shingle hashes with the (sorted uint64) benchmark set. One
    vectorized pass: batch shingling + one searchsorted + per-doc
    segment sums (empty/null docs score 0, as before)."""
    from tenzir_ray.text.dedup import _shingle_hashes_batch

    col = t.column(text_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    nonempty = pc.and_kleene(
        pc.is_valid(col), pc.not_equal(pc.fill_null(col, ""), "")
    ).to_numpy(zero_copy_only=False)
    hits = np.zeros(t.num_rows, np.int64)
    if nonempty.any() and bench.size:
        sh, scounts = _shingle_hashes_batch(
            col.filter(pa.array(nonempty)), ngram)
        idx = np.searchsorted(bench, sh)
        idx[idx == bench.size] = 0
        hit = (bench[idx] == sh).astype(np.int64)
        per = np.zeros(scounts.size, np.int64)
        nz = scounts > 0  # always true (>=1 shingle/doc), kept for shape
        starts = np.r_[0, np.cumsum(scounts[:-1])][nz]
        per[nz] = np.add.reduceat(hit, starts)
        hits[nonempty] = per
    t = t.append_column("n_contaminated_ngrams", pa.array(hits))
    t = t.append_column("contaminated", pa.array(hits >= threshold))
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def benchmark_hashes(texts: list[str | None], ngram: int = 8) -> np.ndarray:
    """Sorted distinct shingle-hash array for a benchmark corpus."""
    parts = [_shingle_hashes(t, ngram) for t in texts if t]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    ds: Dataset, benchmark_texts: list[str | None], text_col: str = "text",
    ngram: int = 8, threshold: int = 1, drop: bool = False,
    batch_size: int = 512,
) -> Dataset:
    """Benchmark decontamination: mark (or drop) documents whose text
    shares ≥ ``threshold`` distinct word-``ngram`` shingles with any
    benchmark document. Adds ``n_contaminated_ngrams`` and
    ``contaminated`` columns; with ``drop=True`` removes contaminated
    rows instead."""
    import ray

    bench_ref = ray.put(benchmark_hashes(benchmark_texts, ngram))

    def probe(t: pa.Table) -> pa.Table:
        # plain task: the benchmark array is one plasma object, so the
        # per-task ray.get is a zero-copy shared-memory read
        return _decontam_batch(t, ray.get(bench_ref), text_col, ngram,
                               threshold)

    out = ds.map_batches(probe, batch_format="pyarrow",
                         batch_size=batch_size)
    if drop:
        out = out.filter(expr="contaminated == False").drop_columns(
            ["n_contaminated_ngrams", "contaminated"])
    return out


def decontaminate_seq(
    doc_ids: list, texts: list, benchmark_texts: list,
    ngram: int = 8, threshold: int = 1,
) -> pa.Table:
    """Sequential verification oracle: plain-Python set intersection per
    document against a set() of benchmark hashes (shares only the leaf
    ``_shingle_hashes`` primitive with the distributed path)."""
    bench: set[int] = set()
    for t in benchmark_texts:
        if t:
            bench.update(int(x) for x in _shingle_hashes(t, ngram))
    rows = []
    for did, txt in zip(doc_ids, texts):
        if txt:
            mine = {int(x) for x in _shingle_hashes(txt, ngram)}
            k = len(mine & bench)
        else:
            k = 0
        rows.append((did, k, k >= threshold))
    rows.sort()
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_contaminated_ngrams": pa.array([r[1] for r in rows], pa.int64()),
        "contaminated": pa.array([r[2] for r in rows], pa.bool_()),
    })


def sample_to_token_budget(
    ds: Dataset, budgets: dict[str, int], token_col: str,
    key_col: str = "source", id_col: str = "doc_id",
    default_budget: int = 0,
    totals: dict[str, int] | None = None,
) -> Dataset:
    """Sample each source down to a TOKEN budget (the mixture knob real
    training-data recipes use — "≤ N tokens of domain X"): one tiny
    keyed aggregate computes per-source token totals, keep-rates follow
    as ``min(1, budget / total)``, and the row decision is the same
    deterministic :func:`mixture_hash` filter as :func:`sample_mixture`
    — reproducible at any parallelism, corpus never shuffles (the only
    exchange is the scalar-per-source totals aggregate). Expected kept
    tokens per source ≈ the budget (hash sampling is unbiased); sources
    without a budget entry get ``default_budget``; a null ``key_col``
    forms its own group priced at ``default_budget``. ``key_col`` must
    be a string column (the filter's ``index_in`` probe is string-typed).

    The input is consumed TWICE (totals, then the filter): it is
    materialized here so upstream compute (read + tokenize) runs once —
    the object store holds (and spills) the corpus between the passes.
    Callers who already know per-source totals pass ``totals=`` and
    skip both the materialize and the aggregate — but then a source
    present in the data yet MISSING from ``totals`` has an unknown
    token mass and cannot be priced: it is dropped entirely when
    ``default_budget`` is 0 and kept entirely otherwise (pass complete
    totals to budget it exactly)."""
    from ray.data.aggregate import Sum

    null_total = 0
    totals_known = totals is not None
    if totals is None:
        ds = ds.materialize()  # both passes read plasma, compute once
        totals_t = ds.groupby(key_col).aggregate(
            Sum(on=token_col, alias_name="__tok_total"))
        totals = {}
        for row in totals_t.take_all():  # rows = #sources (tiny)
            if row.get(key_col) is None:
                null_total = int(row["__tok_total"] or 0)
            else:
                totals[str(row[key_col])] = int(row["__tok_total"] or 0)

    def rate_for(total: int, b: int) -> float:
        return 1.0 if total <= b else b / total

    rates = {k: rate_for(t, budgets.get(k, default_budget))
             for k, t in totals.items()}
    # null keys (and, with caller-passed totals, unpriced sources) fall
    # through sample_mixture's index_in to default_rate
    if totals_known:
        default_rate = 0.0 if default_budget <= 0 else 1.0
    else:
        default_rate = rate_for(null_total, default_budget)
    return sample_mixture(ds, rates, key_col=key_col, id_col=id_col,
                          default_rate=default_rate)


def _host_suffixes(host: str) -> list[str]:
    """All dot-suffixes of a host that could match a domain blocklist
    entry: 'a.b.c.example' → ['a.b.c.example', 'b.c.example',
    'c.example', 'example'] (registered-domain matching, the UT1/
    FineWeb convention: blocking 'example.com' blocks every
    subdomain)."""
    parts = host.split(".")
    return [".".join(parts[i:]) for i in range(len(parts))]


def url_filter(
    ds: Dataset, url_col: str = "url", *,
    block_domains=(), block_url_re: str | None = None,
    invert: bool = False,
) -> Dataset:
    """URL/domain filtering — the first stage of every crawl-curation
    pipeline (FineWeb §3.1, CCNet; the UT1 blocklist protocol): drop a
    row when its url's host matches ``block_domains`` at any dot-suffix
    (blocking ``example.com`` blocks ``www.example.com``) or when the
    full url matches ``block_url_re`` (RE2). ``invert=True`` keeps only
    matches (allowlist mode).

    Scale shape: the blocklist broadcasts ONCE via ``ray.put`` (UT1 is
    ~4M domains ≈ 100 MB as a frozenset — every worker holds it, the
    corpus never shuffles); per batch, hosts reduce through
    ``np.unique`` first (web batches repeat hosts heavily) so the
    per-unique suffix probe is bounded by distinct hosts × ~5 labels,
    then the verdict gathers back through the inverse index. The url
    regex runs as one Arrow RE2 kernel."""
    import ray

    blocked = frozenset(
        d.strip().lower().lstrip(".") for d in block_domains if d)
    block_ref = ray.put(blocked) if blocked else None

    def kernel(t: pa.Table) -> pa.Table:
        col = t.column(url_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = pc.fill_null(col, "")
        bad = np.zeros(t.num_rows, bool)
        if block_ref is not None:
            from tenzir_ray.functions.url import normalized_host

            bl = ray.get(block_ref)
            hosts = normalized_host(col).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(hosts, return_inverse=True)
            ubad = np.array(
                [any(s in bl for s in _host_suffixes(h)) if h else False
                 for h in uniq], bool)
            bad |= ubad[inv]
        if block_url_re:
            bad |= pc.match_substring_regex(col, block_url_re) \
                .to_numpy(zero_copy_only=False)
        keep = bad if invert else ~bad
        out = t.filter(pa.array(keep))
        return out.replace_schema_metadata(None) \
            if out.schema.metadata else out

    return ds.map_batches(kernel, batch_format="pyarrow")
