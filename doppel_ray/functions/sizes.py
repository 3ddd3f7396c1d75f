"""Size-string parsing and byte formatting scalar functions.

Reimplements the reference's semantics exactly:
* ``parse_size``  — reference internal/filter/filter.go:256-341
  (``ParseFileSize``) + ``normalizeUnit`` (filter.go:344-368): SI units
  (kB..EB x1000) and IEC (KiB..EiB x1024), case/whitespace-insensitive,
  float mantissa, leading ``+`` stripped, negatives -> 0, unit compared on
  its first 3 lowercased characters, overflow error.
* ``format_bytes`` — reference internal/output/formatter.go:97-110
  (``FormatBytes``): SI thousands, one decimal, ``"1.5 MB"``.
"""

from __future__ import annotations

_SI = {
    "b": 1,
    "": 1,
    "kb": 1000,
    "mb": 1000**2,
    "gb": 1000**3,
    "tb": 1000**4,
    "pb": 1000**5,
    "eb": 1000**6,
    "kib": 1024,
    "mib": 1024**2,
    "gib": 1024**3,
    "tib": 1024**4,
    "pib": 1024**5,
    "eib": 1024**6,
}

_INT64_MAX = (1 << 63) - 1


class SizeParseError(ValueError):
    pass


def parse_size(s: str) -> int:
    """Parse a human size string to bytes (see module docstring)."""
    if s == "":
        return 0
    s = s.strip()
    if s == "":
        raise SizeParseError("invalid file size format")
    if s[0] == "+" and len(s) > 1:
        s = s[1:]
    if s[0] == "-" and len(s) > 1:
        # negatives are treated as 0 (filter.go:275-280)
        return 0
    i = 0
    while i < len(s) and s[i] in "0123456789.":  # ASCII only, like the Go scan
        i += 1
    if i == 0:
        raise SizeParseError("invalid file size format")
    try:
        val = float(s[:i])
    except ValueError as e:
        raise SizeParseError(f"invalid numeric part: {s[:i]!r}") from e
    unit = s[i:].strip()[:3].lower()  # normalizeUnit: first 3 chars only
    if unit not in _SI:
        raise SizeParseError(f"invalid unit: {s[i:]!r}")
    res = val * _SI[unit]
    if res > float(_INT64_MAX):
        raise SizeParseError("size overflow")
    return int(res)


def format_bytes(n: int) -> str:
    """int64 bytes -> SI human string (formatter.go:97-110)."""
    unit = 1000
    if n < unit:
        return f"{n} B"
    div, exp = unit, 0
    m = n // unit
    while m >= unit:
        div *= unit
        exp += 1
        m //= unit
    return f"{n / div:.1f} {'KMGTPE'[exp]}B"
