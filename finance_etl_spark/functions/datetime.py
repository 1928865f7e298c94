"""Python strftime → Java DateTimeFormatter pattern translation.

The reference's ingest configs carry Python strftime formats
(reference: utils/data_manager.py:72,80,81); Spark's to_timestamp/
to_date/date_format take Java patterns. Translation happens once at
plan-build time on the driver — zero per-row cost.
"""

from __future__ import annotations

_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%p": "a",
    "%z": "xx",
    "%Z": "zzz",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a Python strftime format to a Java datetime pattern.

    Literal text that is alphabetic must be quoted in Java patterns;
    separators like ``.-/: `` pass through unchanged.
    """
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            chunk = "".join(literal)
            if any(ch.isalpha() for ch in chunk):
                out.append("'" + chunk.replace("'", "''") + "'")
            else:
                out.append(chunk)
            literal.clear()

    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            if token in _STRFTIME_TO_JAVA:
                flush_literal()
                out.append(_STRFTIME_TO_JAVA[token])
                i += 2
                continue
            raise ValueError(f"unsupported strftime directive {token!r} in {fmt!r}")
        literal.append(ch)
        i += 1
    flush_literal()
    return "".join(out)
