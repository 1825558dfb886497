"""Series-level Unicode cleaning shared by the pandas_udf wrappers
(functions/udfs.py) and by mapInPandas bodies that clean in-batch.

Deliberately Spark-free: executor Python workers unpickle UDF closures
that reference these helpers by module path, and importing a module that
runs ``@pandas_udf`` decorators at import time dies worker-side with
SESSION_OR_CONTEXT_NOT_EXISTS (the decorator parses its DDL return type
against the active session). Keeping the implementations here makes them
importable anywhere.

ASCII fast path: pure-ASCII strings are NFC- and NFD-invariant and carry
no combining marks, so both cleaners are identity on them — and most rows
of any real web corpus are pure ASCII. ``str.contains`` is one C-loop
regex scan per batch; ``str.normalize`` is a per-element
``unicodedata.normalize`` call ~10x slower, so paying it only on the
non-ASCII subset cuts the dominant cost (round-6 verdict item 4).
"""

from __future__ import annotations

import pandas as pd

_NON_ASCII_RE = r"[^\x00-\x7F]"


def nfc_normalize_series(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (UAX #15) with the ASCII fast path."""
    nonascii = s.str.contains(_NON_ASCII_RE, regex=True, na=False)
    if not nonascii.any():
        return s
    out = s.copy()
    out[nonascii] = s[nonascii].str.normalize("NFC")
    return out


def strip_accents_series(s: pd.Series) -> pd.Series:
    """Accent folding (NFD-decompose, drop combining marks U+0300–U+036F)
    with the ASCII fast path."""
    nonascii = s.str.contains(_NON_ASCII_RE, regex=True, na=False)
    if not nonascii.any():
        return s
    out = s.copy()
    out[nonascii] = (
        s[nonascii].str.normalize("NFD").str.replace(r"[̀-ͯ]", "", regex=True)
    )
    return out
