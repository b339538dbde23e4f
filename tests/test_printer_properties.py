"""Property-based round-trip obligations for the TOTAL printer
encodings (hypothesis): ndjson and csv can represent any string, so
parse(print(x)) == x must hold for arbitrary payloads including
structural characters, newlines, quotes and unicode."""

import io
import json

import pyarrow as pa
import pyarrow.csv as pacsv
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.sources.printers import print_csv_batch, print_ndjson_batch

# arbitrary printable-ish text incl. structural chars; exclude the
# surrogate range (not encodable in parquet/json) and \r (the Arrow CSV
# writer normalizes bare \r per RFC4180 — csv is newline-total via \n)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\r"),
    max_size=25)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(-2**60, 2**60), _text),
                min_size=1, max_size=10))
def test_ndjson_roundtrip_total(rows):
    t = pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                  "b": pa.array([r[1] for r in rows], pa.string())})
    lines = print_ndjson_batch(t).column("line").to_pylist()
    back = [json.loads(line) for line in lines]
    assert back == t.to_pylist()
    # one line per record, no embedded raw newlines (json escapes them)
    assert all("\n" not in line for line in lines)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(-2**60, 2**60), _text),
                min_size=1, max_size=10))
def test_csv_roundtrip_total(rows):
    t = pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                  "b": pa.array([r[1] for r in rows], pa.string())})
    lines = print_csv_batch(t).column("line").to_pylist()
    assert len(lines) == t.num_rows  # record-boundary split held
    back = pacsv.read_csv(
        io.BytesIO(("a,b\n" + "\n".join(lines) + "\n").encode()),
        convert_options=pacsv.ConvertOptions(
            column_types={"a": pa.int64(), "b": pa.string()}),
    )
    got = back.column("b").to_pylist()
    want = t.column("b").to_pylist()
    # csv cannot distinguish "" from absent — normalize both to ""
    assert [x or "" for x in got] == [x or "" for x in want]
    assert back.column("a").to_pylist() == t.column("a").to_pylist()
