"""String functions (reference: libtenzir/builtins/functions/string.cpp)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

to_lower = pc.utf8_lower
to_upper = pc.utf8_upper
to_title = pc.utf8_title
capitalize = pc.utf8_capitalize
trim = pc.utf8_trim_whitespace
trim_start = pc.utf8_ltrim_whitespace
trim_end = pc.utf8_rtrim_whitespace
reverse = pc.utf8_reverse
length_chars = pc.utf8_length
length_bytes = pc.binary_length
is_alnum = pc.utf8_is_alnum
is_alpha = pc.utf8_is_alpha
is_lower = pc.utf8_is_lower
is_upper = pc.utf8_is_upper
is_numeric = pc.utf8_is_numeric
is_printable = pc.utf8_is_printable
is_title = pc.utf8_is_title


def starts_with(arr, prefix: str):
    return pc.starts_with(arr, pattern=prefix)


def ends_with(arr, suffix: str):
    return pc.ends_with(arr, pattern=suffix)


def split(arr, sep: str, max_splits: int | None = None):
    return pc.split_pattern(arr, pattern=sep, max_splits=max_splits)


def split_regex(arr, pattern: str, max_splits: int | None = None):
    return pc.split_pattern_regex(arr, pattern=pattern, max_splits=max_splits)


def join(list_arr, sep: str):
    return pc.binary_join(list_arr, sep)


def replace(arr, what: str, with_: str, max_replacements: int | None = None):
    return pc.replace_substring(
        arr, pattern=what, replacement=with_, max_replacements=max_replacements
    )


def replace_regex(arr, pattern: str, with_: str, max_replacements: int | None = None):
    return pc.replace_substring_regex(
        arr, pattern=pattern, replacement=with_, max_replacements=max_replacements
    )


def match_regex(arr, pattern: str):
    return pc.match_substring_regex(arr, pattern=pattern)


def slice(arr, start: int, stop: int | None = None, step: int = 1):
    return pc.utf8_slice_codeunits(arr, start=start, stop=stop, step=step)


def pad_start(arr, width: int, char: str = " "):
    return pc.utf8_lpad(arr, width=width, padding=char)


def pad_end(arr, width: int, char: str = " "):
    return pc.utf8_rpad(arr, width=width, padding=char)
