"""Change-data-capture application: latest-snapshot and SCD2 history.

The reference maintains its warehouse by full DELETE+reinsert per ticker
(/root/reference/sec_dl/utils/load_filings_idx.py:51-56); at 100 TB the
warehouse consumes a CHANGE STREAM instead — (key, sequence, operation,
payload) rows — and needs exactly two materializations:

- ``apply_changes``: the current snapshot — per key, the payload of the
  highest-sequence change, dropped if that change is a delete. One
  window (or argmax) per key partition; the change log shuffles once on
  the key, history length only widens the partition, never the plan.
- ``scd2_history``: the full slowly-changing-dimension type-2 table —
  every change becomes a validity interval [valid_from, valid_to), open
  intervals (valid_to NULL) for keys whose latest change is live. One
  ``lead`` window per key, same single shuffle.

Sequence ties are the caller's contract to break (pass a composite
``seq_cols``); both functions require a total order per key and are
deterministic given one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Current snapshot from a change log: latest change per key wins;
    keys whose latest change is a delete vanish. Returns the winning rows
    minus the ordering helper — all payload columns ride along."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col(op_col) != delete_op)
        .drop("_rn")
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """SCD type-2 validity table: each non-delete change opens an interval
    at its own sequence position and closes at the NEXT change's (delete
    changes close the previous interval but contribute no row of their
    own). ``valid_from``/``valid_to`` take the FIRST seq column's value;
    open intervals carry NULL ``valid_to``."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in seq_cols])
    nxt: Column = F.lead(F.col(seq_cols[0])).over(w)
    return (
        changes.withColumn(valid_from_col, F.col(seq_cols[0]))
        .withColumn(valid_to_col, nxt)
        .where(F.col(op_col) != delete_op)
    )
