"""Web link graph: href extraction from HTML pages and host-level
PageRank — the Common-Crawl-style centrality signal (the public CC
host/domain ranks are exactly this: harmonic centrality / PageRank over
the host webgraph) that curation pipelines use as a quality prior next
to content-based scores.

``extract_links``: (url, html) pages → (src_host, dst_host) edge table.
Pages without an ``href`` are skipped by a vectorized Arrow pre-filter;
only pages WITH links run the compiled findall (C-speed per doc).
Relative links resolve to the source host. Self-loops and duplicate
(src, dst) pairs collapse per page before anything leaves the task, so
the edge exchange carries host-pair cardinality, not link cardinality.

``pagerank``: damped PageRank over the edge table in DETERMINISTIC
FIXED-POINT arithmetic — ranks are int64 micro-units (2^-30 of total
mass), every step is integer add/multiply/floor-divide, and integer
addition is order-free, so the distributed groupby-sum result is
BIT-identical to the sequential oracle no matter how blocks shuffle.
(Float PageRank cannot be hash-verified across a shuffle: float
addition orders differ run to run. The fixed-point iterates converge to
the same vector up to 1 part in 2^30 per step — far below any ranking
decision threshold — and determinism is what the 100 TB replay contract
needs anyway.)

Scale shape: one iteration = one ``map_batches`` (contribution =
rank[src] // outdeg[src], broadcast rank+outdeg maps) + one
``groupby(dst).sum`` over narrow (dst, contrib int64) rows. The
broadcast is a ray.put'd (hosts → idx) int64 vector pair — hosts are
the HOST graph (~10⁷ at full crawl scale, a few hundred MB — the same
budget as the CC webgraph's own node table); the edge table, which is
the big side, streams and never materializes. ``iters`` shuffles of
narrow int64 pairs total.

No reference analog (Tenzir has no graph ops); public recipe:
Page et al. 1999; Common Crawl webgraph releases. Oracle-checked
``host_pagerank`` vs :func:`tenzir_ray.text.sequential.pagerank_seq`.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# href="..." / href='...' / href=bare (the three HTML spellings);
# value captured without quotes. Compiled once per process.
_HREF = re.compile(
    r"""(?is)<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""")

_SCALE = np.int64(1) << np.int64(30)  # fixed-point unit: 2^-30 mass


def _host_of_links(src_host: str, hrefs: list[str]) -> set[str]:
    """Destination hosts of one page's hrefs: absolute http(s) links
    keep their own host (lowercased), protocol-relative ``//host/..``
    likewise, everything else (relative, fragment, mailto/js) resolves
    to the source host. Empty hosts drop."""
    out: set[str] = set()
    for h in hrefs:
        h = h.strip()
        if not h or h.startswith(("#", "mailto:", "javascript:")):
            continue
        low = h.lower()
        if low.startswith(("http://", "https://")):
            rest = h.split("//", 1)[1]
            host = rest.split("/", 1)[0].split("?", 1)[0] \
                .split("#", 1)[0].split("@")[-1].split(":", 1)[0].lower()
        elif h.startswith("//"):
            host = h[2:].split("/", 1)[0].split("?", 1)[0] \
                .split("#", 1)[0].split("@")[-1].split(":", 1)[0].lower()
        else:
            host = src_host
        if host:
            out.add(host)
    return out


def extract_links(
    ds: Dataset, html_col: str = "html", url_col: str = "url",
) -> Dataset:
    """(url, html) pages → deduplicated (src_host, dst_host) edges.
    Per-page dedup happens in the task; global dedup is the caller's
    choice (``pagerank`` counts each (page → host) once, which is the
    host-graph convention: edge weight = #linking pages)."""
    def kernel(t: pa.Table) -> pa.Table:
        from tenzir_ray.text.html import utf8_string_array

        from tenzir_ray.functions.url import normalized_host

        col = pc.fill_null(utf8_string_array(t.column(html_col)), "")
        # shared host identity (lower + userinfo strip) so src nodes and
        # the destination rule (_host_of_links) agree on what a host is
        srcs = normalized_host(t.column(url_col)).to_pylist()
        has = pc.match_substring(col, "href", ignore_case=True) \
            .to_numpy(zero_copy_only=False)
        s_out: list[str] = []
        d_out: list[str] = []
        idx = np.flatnonzero(has)
        for i in idx:
            src = srcs[int(i)]
            if not src:
                continue
            hrefs = [m.group(2) or m.group(3) or m.group(4) or ""
                     for m in _HREF.finditer(col[int(i)].as_py())]
            for dst in sorted(_host_of_links(src, hrefs)):
                s_out.append(src)
                d_out.append(dst)
        return pa.table({"src_host": pa.array(s_out, pa.string()),
                         "dst_host": pa.array(d_out, pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def pagerank(
    edges: Dataset, *, damping_num: int = 85, damping_den: int = 100,
    iters: int = 20, small_graph_rows: int = 4_000_000,
) -> pa.Table:
    """Fixed-point PageRank over a (src_host, dst_host) edge Dataset.
    Returns (host, rank) sorted by rank desc then host, with rank in
    int64 units of 2^-30 total mass (divide by 2^30 for the float
    rank). Damping is the rational ``damping_num/damping_den`` applied
    as integer multiply-then-floor. Multi-edges act as weights (each
    linking page contributes once — ``extract_links`` dedups per page).

    Scale shape: the NODE table is the small side (the CC host graph is
    ~10⁷-10⁸ hosts; the driver state is one int64 vector per n, the
    broadcast one ray.put'd index map) while the EDGE table — the big
    side — only ever streams: one map-only pass builds the narrow
    (src_idx, dst_idx) int64 form (materialized once), every iteration
    is one map-only pass emitting per-block sparse (dst, contrib)
    partials that the driver folds — the DSIR model-fit pattern, no
    shuffle inside the loop."""
    import ray

    # the narrow two-string edge table is consumed by THREE passes
    # (host scan, to_idx, and transitively every iteration) — pin it
    # once so the upstream extraction pipeline never re-executes
    edges = edges.materialize()

    # pass 1: node table (distinct hosts; per-block distinct → driver set)
    def uniq(t: pa.Table) -> pa.Table:
        hs = set(t.column("src_host").to_pylist()) \
            | set(t.column("dst_host").to_pylist())
        return pa.table({"host": pa.array(sorted(hs), pa.string())})

    hosts_set: set[str] = set()
    for t in edges.map_batches(uniq, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        hosts_set.update(t.column("host").to_pylist())
    hosts = sorted(hosts_set)
    n = len(hosts)
    if n == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    pos_ref = ray.put({h: i for i, h in enumerate(hosts)})

    # pass 2: narrow int64 edge form, materialized once for the loop
    def to_idx(t: pa.Table) -> pa.Table:
        pos = ray.get(pos_ref)
        s = np.array([pos[h] for h in
                      t.column("src_host").to_pylist()], np.int64)
        d = np.array([pos[h] for h in
                      t.column("dst_host").to_pylist()], np.int64)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    eds = edges.map_batches(to_idx, batch_format="pyarrow").materialize()

    # small-graph fast path: when the indexed edge table fits a worker
    # heap (narrow int64 pairs — 16 B/row), run the whole power
    # iteration in one task instead of paying per-iteration Dataset
    # execution latency. BIT-identical to the distributed fold: every
    # step is order-free int64 arithmetic, the partial-fold and the
    # single-array np.add.at sum the same integers.
    if eds.count() <= small_graph_rows:
        parts = [t for t in eds.iter_batches(batch_format="pyarrow",
                                             batch_size=None)
                 if t.num_rows]
        if parts:
            et = pa.concat_tables(parts)
            s = et.column("src").to_numpy(zero_copy_only=False)
            d = et.column("dst").to_numpy(zero_copy_only=False)
        else:
            s = d = np.zeros(0, np.int64)
        outdeg = np.zeros(n, np.int64)
        np.add.at(outdeg, s, 1)
        rank = np.full(n, int(_SCALE) // n, np.int64)
        base = (int(_SCALE) * (damping_den - damping_num)
                // damping_den) // n
        dang = outdeg == 0
        for _ in range(iters):
            acc = np.zeros(n, np.int64)
            np.add.at(acc, d, rank[s] // outdeg[s])
            extra = int(rank[dang].sum()) // n
            rank = base + (acc + extra) * damping_num // damping_den
        order = np.lexsort((np.array(hosts), -rank))
        return pa.table({
            "host": pa.array([hosts[i] for i in order], pa.string()),
            "rank": pa.array(rank[order], pa.int64()),
        })

    # pass 3: out-degrees (per-block sparse bincount partials, driver fold)
    outdeg = np.zeros(n, np.int64)

    def deg_partial(t: pa.Table) -> pa.Table:
        # sparse within the block: never allocate a node-sized vector
        # in a task (u is bounded by block size, not graph size)
        u, cnt = np.unique(t.column("src").to_numpy(),
                           return_counts=True)
        return pa.table({"i": pa.array(u, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    for t in eds.map_batches(deg_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        np.add.at(outdeg, t.column("i").to_numpy(), t.column("c").to_numpy())

    rank = np.full(n, int(_SCALE) // n, np.int64)
    base = (int(_SCALE) * (damping_den - damping_num) // damping_den) // n
    dangling_nodes = outdeg == 0

    for _ in range(iters):
        rank_ref = ray.put(rank)
        deg_ref = ray.put(outdeg)

        def contrib_partial(t: pa.Table, _r=rank_ref, _d=deg_ref
                            ) -> pa.Table:
            r, deg = ray.get(_r), ray.get(_d)
            s = t.column("src").to_numpy()
            d = t.column("dst").to_numpy()
            con = r[s] // deg[s]  # deg[s] >= 1: s has this out-edge
            u, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(u), np.int64)
            np.add.at(acc, inv, con)
            return pa.table({"i": pa.array(u, pa.int64()),
                             "c": pa.array(acc, pa.int64())})

        acc = np.zeros(n, np.int64)
        for t in eds.map_batches(contrib_partial,
                                 batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            np.add.at(acc, t.column("i").to_numpy(),
                      t.column("c").to_numpy())
        extra = int(rank[dangling_nodes].sum()) // n
        rank = base + (acc + extra) * damping_num // damping_den

    order = np.lexsort((np.array(hosts), -rank))
    return pa.table({
        "host": pa.array([hosts[i] for i in order], pa.string()),
        "rank": pa.array(rank[order], pa.int64()),
    })
