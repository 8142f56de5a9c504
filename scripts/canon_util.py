"""Shared row canonicalizer for the driver sim and the standalone
smoke — ONE compare implementation so the two harnesses can't drift.

Order-insensitive (rows sorted), column-order-insensitive (columns
sorted), dtype-tagged floats (an int64 250 never canonicalizes equal
to a float64 250.0 — the HUGEINT->float64 fetchdf drift that shipped
four broken oracles in r6). DECIMAL values (DuckDB fetchdf yields
``decimal.Decimal`` objects for DECIMAL columns) are canonicalized
through float so ``Decimal('81.0400')`` equals the JSON-round-tripped
``81.04`` a Spark row carries (ADVICE r8: the smoke's old zip+str
compare false-failed exactly there).
"""
import math
from decimal import Decimal

import pandas as pd


def canon_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return '∅'
    if isinstance(v, Decimal):
        return f"f:{float(v):.9g}"
    if isinstance(v, float):
        return f"f:{v:.9g}"
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    """Canonical sorted-row form of a pandas DataFrame."""
    df = df[sorted(df.columns)]
    return sorted(
        tuple(canon_value(v) for v in r)
        for r in df.itertuples(index=False)
    )


def canon_records(records: list[dict]) -> list[tuple]:
    """Canonical form of a list-of-dicts result (e.g. JSON rows from
    the standalone smoke's subprocess) — same shape as ``canon``."""
    if not records:
        return []
    cols = sorted(records[0].keys())
    return sorted(
        tuple(canon_value(r.get(c)) for c in cols) for r in records
    )
