"""Distributed exact selection (k-th smallest / quantile edges)
WITHOUT a global sort.

A total sort of 100 TB to read one middle element is the canonical
waste; the selection algorithm does histogram passes instead: bucket
the domain, count per bucket (one map-side-combined aggregation),
find the bucket containing rank k, recurse into it. With B buckets a
domain of D distinct values needs ceil(log_B D) passes — 2 passes at
B=4096 cover 16M distinct values, 3 cover 64G. Each pass ships B
counts per partition, nothing else.

``kth_smallest_multi`` resolves MANY ranks in the same passes (all
nine decile edges of a distribution in one histogram job per level):
each pass maps every row to (active-interval id, bucket) and counts,
so the per-pass cost is one aggregation regardless of how many ranks
are still open.

Works on integer (LONG) domains — cents, epoch units, ids. Bucket
assignment is pure BIGINT arithmetic (`(col - lo) div width`), so the
full int64 domain is handled exactly; no double conversion anywhere.
Exactness is trivial: a rank's final interval has one distinct value
= the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kth_smallest_multi(
    df: DataFrame,
    col: str,
    ks: list[int],
    n_buckets: int = 4096,
    max_passes: int = 8,
) -> dict[int, int]:
    """Exact k-th smallest (1-based) for EVERY rank in ``ks`` over an
    integer column, via shared iterative histogram refinement.

    One aggregation job per refinement level, independent of
    ``len(ks)``: rows are mapped to (interval-id, bucket) with a
    when-chain over the <= len(ks) disjoint active intervals. Driver
    state per pass: at most ``len(ks) * n_buckets`` counts.

    Returns {k: value}. Raises if any rank exceeds the row count.
    """
    if not ks:
        return {}
    bounds = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    if bounds.lo is None:
        raise ValueError("kth_smallest_multi on empty input")
    result: dict[int, int] = {}
    # state: disjoint interval (lo, hi) -> [(requested k, rank within
    # interval)] — ranks that still need narrowing
    state: dict[tuple[int, int], list[tuple[int, int]]] = {
        (int(bounds.lo), int(bounds.hi)): [(k, k) for k in sorted(set(ks))]
    }
    for _ in range(max_passes):
        for (lo, hi), pairs in list(state.items()):
            if lo == hi:
                for orig, _ in pairs:
                    result[orig] = lo
                del state[(lo, hi)]
        if not state:
            return result
        intervals = sorted(state)
        widths = []
        for lo, hi in intervals:
            span = hi - lo + 1
            widths.append(max(1, -(-span // n_buckets)))  # ceil div
        c = F.col(col)
        iid_expr = None
        bkt_expr = None
        for idx, (lo, hi) in enumerate(intervals):
            cond = (c >= lo) & (c <= hi)
            # pure integer division: exact over the whole long domain
            # (a double path would misbucket above 2^53, e.g. epoch
            # nanos)
            b = F.expr(f"(({col}) - ({lo})) div {widths[idx]}")
            iid_expr = (
                F.when(cond, idx) if iid_expr is None else iid_expr.when(cond, idx)
            )
            bkt_expr = F.when(cond, b) if bkt_expr is None else bkt_expr.when(cond, b)
        counted = (
            df.select(iid_expr.alias("_sel_i"), bkt_expr.alias("_sel_b"))
            .filter(F.col("_sel_i").isNotNull())
            .groupBy("_sel_i", "_sel_b")
            .agg(F.count(F.lit(1)).alias("_sel_n"))
            .collect()
        )
        by_interval: dict[int, dict[int, int]] = {}
        for r in counted:
            by_interval.setdefault(r[0], {})[r[1]] = r[2]
        new_state: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for idx, (lo, hi) in enumerate(intervals):
            w = widths[idx]
            pairs = sorted(state[(lo, hi)], key=lambda p: p[1])
            counts = by_interval.get(idx, {})
            acc = 0
            pi = 0
            for bkt in sorted(counts):
                n = counts[bkt]
                while pi < len(pairs) and acc < pairs[pi][1] <= acc + n:
                    orig, rem = pairs[pi]
                    nlo = lo + bkt * w
                    nhi = min(hi, nlo + w - 1)
                    new_state.setdefault((nlo, nhi), []).append((orig, rem - acc))
                    pi += 1
                acc += n
                if pi == len(pairs):
                    break
            if pi < len(pairs):
                raise ValueError("rank k exceeds row count in range")
        state = new_state
    for (lo, hi), pairs in state.items():
        if lo != hi:
            raise RuntimeError(f"did not converge: [{lo}, {hi}]")
        for orig, _ in pairs:
            result[orig] = lo
    return result


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    n_buckets: int = 4096,
    max_passes: int = 8,
) -> int:
    """Exact k-th smallest (1-based) of an integer column. Thin
    single-rank wrapper over :func:`kth_smallest_multi`."""
    return kth_smallest_multi(df, col, [k], n_buckets, max_passes)[k]


def exact_median_cents(df: DataFrame, money_col: Column) -> tuple[int, int, float]:
    """(n, median_cents, median) of a 2-decimal money column: lower
    median for even n (deterministic, matches quantile_disc 0.5 with
    DuckDB's lower-mid convention is NOT assumed — callers state the
    convention they oracle against)."""
    cents_df = df.select((money_col * 100).cast("long").alias("__c"))
    n = cents_df.count()
    k = (n + 1) // 2  # lower median
    c = kth_smallest(cents_df, "__c", k)
    return n, c, c / 100.0
