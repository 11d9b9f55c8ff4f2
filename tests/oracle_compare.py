"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver: exact value equality (no epsilon) after
sorting columns by name and rows by all values — if this passes, any
reasonable hash-based compare passes too.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if out[c].dtype == object:
            # unify bytes/str and numpy scalars
            out[c] = out[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
        # decimals -> float for uniform compare
        if str(out[c].dtype).startswith("decimal") or out[c].map(
            lambda v: type(v).__name__ == "Decimal"
        ).any():
            out[c] = out[c].astype("float64")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        return [f"{name}: row count spark={len(a)} duck={len(b)}"]
    # dtype-KIND parity (r2): a DuckDB HUGEINT/TINYINT fetches as
    # float64/int8 where Spark produced int64/float64 — numerically
    # equal but rendered differently by repr-based hashers, which is
    # exactly how the round-1 driver flagged sign()/SUM() oracles.
    # Catch the divergence here, before the driver does.
    for c in a.columns:
        ka = {"u": "i"}.get(a[c].dtype.kind, a[c].dtype.kind)
        kb = {"u": "i"}.get(b[c].dtype.kind, b[c].dtype.kind)
        if ka != kb:
            problems.append(
                f"{name}: col {c} dtype-kind mismatch "
                f"spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype} "
                "(cast the oracle column; see plans/registry.py conventions)"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x_na = x is None or (not isinstance(x, (list, tuple)) and pd.isna(x))
            y_na = y is None or (not isinstance(y, (list, tuple)) and pd.isna(y))
            if x_na and y_na:
                continue
            if x_na != y_na:
                problems.append(f"{name}: col {c} row {i}: spark={x!r} duck={y!r}")
                break
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if xf != yf:
                    problems.append(
                        f"{name}: col {c} row {i}: spark={x!r} duck={y!r} "
                        f"(delta={xf - yf!r})"
                    )
                    break
            elif x != y:
                problems.append(f"{name}: col {c} row {i}: spark={x!r} duck={y!r}")
                break
    return problems
