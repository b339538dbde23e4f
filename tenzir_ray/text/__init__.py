"""Large-scale training-data operations over document/embedding tables.

Not present in the reference (Tenzir is security telemetry), but the ops a
100 TB web-text pipeline needs: exact & near deduplication, text quality
analysis, and similarity search — all expressed as Dataset stages.
"""

from tenzir_ray.text.dedup import (
    chunk_lines,
    exact_dedup,
    exact_dedup_wide,
    line_dedup,
    minhash_cc_dedup,
    minhash_components,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    simhash_dedup,
    simhash_near_dedup,
)
from tenzir_ray.text.incremental import (
    HashStore,
    SignatureStore,
    compact_store,
    incremental_exact_dedup,
    incremental_minhash_dedup,
)
from tenzir_ray.text.bpe import bpe_tokenize, bpe_train
from tenzir_ray.text.c4 import c4_clean, c4_span_dedup
from tenzir_ray.text.classifier import classifier_score, classifier_train
from tenzir_ray.text.linkgraph import extract_links, pagerank
from tenzir_ray.text.html import (
    boilerplate_extract,
    boilerplate_text,
    html_extract,
    html_to_text,
)
from tenzir_ray.text.normalize import normalize_documents, normalize_text
from tenzir_ray.text.dsir import dsir_score, dsir_select, fit_gram_counts
from tenzir_ray.text.curation import url_filter
from tenzir_ray.text.packing import chunk_tokens
from tenzir_ray.text.robots import parse_robots, robots_filter
from tenzir_ray.text.quality import analyze_documents
from tenzir_ray.text.ann import ann_cosine_topk, embedding_dedup, ivf_build, ivf_search, ivf_write

__all__ = [
    "chunk_lines",
    "line_dedup",
    "exact_dedup",
    "exact_dedup_wide",
    "minhash_cc_dedup",
    "minhash_components",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "simhash_near_dedup",
    "analyze_documents",
    "bpe_train",
    "bpe_tokenize",
    "c4_clean",
    "c4_span_dedup",
    "boilerplate_extract",
    "boilerplate_text",
    "classifier_score",
    "classifier_train",
    "extract_links",
    "pagerank",
    "url_filter",
    "chunk_tokens",
    "parse_robots",
    "robots_filter",
    "html_extract",
    "html_to_text",
    "normalize_documents",
    "normalize_text",
    "dsir_score",
    "dsir_select",
    "fit_gram_counts",
    "ann_cosine_topk",
    "embedding_dedup",
    "ivf_build",
    "ivf_search",
    "ivf_write",
    "HashStore",
    "SignatureStore",
    "compact_store",
    "incremental_exact_dedup",
    "incremental_minhash_dedup",
]
