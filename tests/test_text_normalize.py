"""Text normalization: the vectorized Dataset kernel vs the scalar rule
chain, fast/slow path routing, and each repair class. All non-ASCII
characters are spelled as escapes so the fixture is byte-exact."""

import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.normalize import normalize_documents, normalize_text
from tenzir_ray.text.sequential import normalize_seq

# mojibake of "caf\u00e9 r\u00e9sum\u00e9" (UTF-8 read as Latin-1)
MOJ_L1 = "caf\u00c3\u00a9 r\u00c3\u00a9sum\u00c3\u00a9"
# mojibake of '\u201cq\u201d \u2013 d' (UTF-8 read as cp1252, incl. 0x9D)
MOJ_CP = "\u00e2\u20ac\u0153q\u00e2\u20ac\u009d \u00e2\u20ac\u201c d"
DOCS = [
    (0, "plain ascii text stays byte identical"),
    (1, MOJ_L1),
    (2, MOJ_CP),
    (3, "e\u0301tude nai\u0308ve"),        # NFD -> NFC
    (4, "a\x00b\x07c\r\nd\re"),         # controls + CRLF/CR
    (5, "a\u200bb\ufeffc\u200dd"),        # zero-width + BOM
    (6, "ordinary prose: caf\u00e9 na\u00efve"),  # real accents untouched
    (7, ""),
    (8, None),
    (9, "double " + MOJ_L1.encode("utf-8").decode("latin-1")),  # 2 rounds
]


def _ds(parts=3):
    ids, texts = zip(*DOCS)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(parts)


def test_engine_matches_sequential_byte_for_byte():
    got = normalize_documents(_ds()).sort("doc_id").take_all()
    exp = normalize_seq([d for d, _ in DOCS], [t for _, t in DOCS])
    assert [(r["doc_id"], r["text"]) for r in got] == \
        list(zip(exp.column("doc_id").to_pylist(),
                 exp.column("text").to_pylist()))


def test_repairs():
    out = {r["doc_id"]: r["text"]
           for r in normalize_documents(_ds()).take_all()}
    assert out[0] == "plain ascii text stays byte identical"
    assert out[1] == "caf\u00e9 r\u00e9sum\u00e9"
    assert out[2] == "\u201cq\u201d \u2013 d"
    assert out[3] == "\u00e9tude na\u00efve"
    assert out[4] == "abc\nd\ne"
    assert out[5] == "abcd"
    assert out[6] == "ordinary prose: caf\u00e9 na\u00efve"
    assert out[7] == "" and out[8] == ""
    assert out[9] == "double caf\u00e9 r\u00e9sum\u00e9"


def test_collapse_ws():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["  a \t b \n  c  "], pa.string())}))
    out = normalize_documents(ds, collapse_ws=True).take_all()
    assert out[0]["text"] == "a b\nc"
    assert normalize_text("  a \t b \n  c  ", collapse_ws=True) == "a b\nc"


def test_batchsize_invariance():
    a = normalize_documents(_ds(parts=1)).sort("doc_id").take_all()
    b = normalize_documents(_ds(parts=5)).sort("doc_id").take_all()
    assert [r["text"] for r in a] == [r["text"] for r in b]
