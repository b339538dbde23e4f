"""Sources/sinks & format parsers (SURVEY.md §2.1-2.2).

Follows the reference's loader/parser split (plugin.hpp:416-501): loaders
produce byte streams, parsers turn bytes into events. In Ray Data the
loader is ``read_parquet``/``read_text``/``read_binary_files`` and each
parser is a vectorized ``map_batches`` stage.
"""

from tenzir_ray.sources.formats import (
    compile_grok,
    load_tcp,
    load_udp,
    open_uri,
    parse_cef_batch,
    parse_grok_batch,
    parse_kv_batch,
    parse_leef_batch,
    parse_syslog_batch,
    parse_zeek_tsv,
    read_csv,
    read_feather,
    read_json,
    read_lines,
    read_parquet,
    read_gelf,
    read_ssv,
    read_suricata,
    read_tsv,
    read_xsv,
    read_yaml,
    read_zeek_json,
    routed_json,
    write_feather,
    write_parquet,
)
from tenzir_ray.sources.introspect import (
    files,
    openapi,
    processes,
    sockets,
    version,
)
from tenzir_ray.sources.printers import (
    print_cef_batch,
    print_csv_batch,
    print_kv_batch,
    print_leef_batch,
    print_ndjson_batch,
    print_syslog_batch,
    print_zeek_tsv,
    write_lines,
)

__all__ = [
    "open_uri", "read_parquet", "read_json", "read_csv", "read_lines",
    "read_yaml", "read_feather", "write_feather", "write_parquet",
    "parse_kv_batch", "parse_syslog_batch", "parse_cef_batch",
    "parse_leef_batch", "parse_grok_batch", "compile_grok", "parse_zeek_tsv",
    "routed_json", "read_suricata", "load_tcp", "load_udp",
    "print_ndjson_batch", "print_csv_batch", "print_kv_batch",
    "print_syslog_batch", "print_cef_batch", "print_leef_batch",
    "print_zeek_tsv", "write_lines",
    "read_tsv", "read_ssv", "read_xsv", "read_zeek_json", "read_gelf",
    "files", "processes", "sockets", "version", "openapi",
]
