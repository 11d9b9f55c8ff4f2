"""First-fit-decreasing (FFD) sequence packing via ``applyInPandas``.

``pipeline_sequence_packing`` (plans/llm_text2.py) is the concat-and-
chunk packer: a window cumsum, fully parallel, the right default at
100 TB. FFD is the other packer production pipelines use — it never
splits a document across context windows and wastes less tail space —
but it is inherently sequential WITHIN a packing group (each placement
depends on every earlier one), so no composition of built-in operators
expresses it. This is the honest ``applyInPandas`` case from the
design brief: per-group imperative logic that Catalyst genuinely
cannot express.

Scale contract: parallelism comes from the GROUPING KEY, exactly like
real training pipelines that pack per shard — each group's docs must
fit one executor's memory as a pandas frame, and the loop is
O(n_items * n_bins) per group. At 100 TB you pack per (lang, shard)
where a shard is a bounded hash split, never one global group. The
Arrow transfer ships only (group, id, size) — never document text.

Determinism (required by the self-graded oracle): items sort by
(size DESC, id ASC) and bins are scanned in creation order, so the
assignment is a pure function of the group's (id, size) multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ffd_pack(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row to a bin of ``capacity`` per group via FFD.

    Returns (group_col, id_col, size_col, bin_id). Items larger than
    ``capacity`` get a dedicated singleton bin (they cannot fit any
    shared bin; callers that forbid oversize items should filter or
    split upstream).

    Guarantees (pinned by tests and the query's self-graded oracle):
      * every bin's fill is <= capacity, except a bin holding a single
        oversize item (whose fill is that item's size);
      * at most one bin per group is less than half full — true for
        any first-fit order: were there two, the later bin's items
        would all have fit in the earlier one, so first-fit would
        never have opened it.
    """
    out_schema = (
        f"{group_col} string, {id_col} long, {size_col} long, bin_id long"
    )
    cap = int(capacity)
    gcol, icol, scol = group_col, id_col, size_col

    # NOTE: self-contained closure (pandas imported inside) — executed
    # on workers that may not have the package importable when the
    # harness loads this module by file path from a foreign cwd.
    def pack(pdf):
        import pandas as pd

        items = sorted(
            zip(pdf[icol].tolist(), pdf[scol].tolist()),
            key=lambda t: (-t[1], t[0]),
        )
        fills: list[int] = []  # current fill per bin, creation order
        assign: dict[int, int] = {}
        for item_id, size in items:
            if size > cap:  # oversize: dedicated bin — its real fill
                # already exceeds cap, so no later item can fit it
                assign[item_id] = len(fills)
                fills.append(size)
                continue
            for b, fill in enumerate(fills):
                if fill + size <= cap:
                    assign[item_id] = b
                    fills[b] = fill + size
                    break
            else:
                assign[item_id] = len(fills)
                fills.append(size)
        return pd.DataFrame(
            {
                gcol: pdf[gcol].iloc[0],
                icol: pdf[icol],
                scol: pdf[scol],
                "bin_id": pdf[icol].map(assign),
            }
        )

    narrow = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(size_col).cast("long").alias(size_col),
    )
    return narrow.groupBy(group_col).applyInPandas(pack, schema=out_schema)
