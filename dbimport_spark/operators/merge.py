"""Merge modes — the heart of the engine (SURVEY.md §2.5).

Import mode × duplicate mode dispatch in the reference:
DbImportWorker.java:426-581. All merges here are equi-joins on the key
columns (optionally through SQL functions, applied on both sides).

Scale design:
* insert_not_existing = left_anti join against the target's PRUNED key
  projection (column pruning keeps the shuffled bytes minimal); broadcast
  when the key set is small.
* update_* = single left join target←updates + per-column conditional
  projection. No row-at-a-time probes (the reference's NoSQL path does
  SELECT-per-row — we explicitly do not reproduce that).
* upsert = update join + anti-join insert, both shuffling on the SAME key
  → Catalyst/AQE reuses the exchange where possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbimport_spark.config import KeyColumn
from dbimport_spark.operators import dedup
from dbimport_spark.operators.dedup import _with_keys
from dbimport_spark.operators.order import SRC_ORDER_COL

UPD_PREFIX = "__upd_"
MATCH_FLAG = "__upd_matched"


def insert_all(target: DataFrame, source: DataFrame) -> DataFrame:
    """Append every source row (fast path / insertAllItems).

    Reference: DbImportWorker.java:426-429 (no-key fast path), :500,:542.
    """
    return target.unionByName(source.select(*target.columns))


def insert_not_existing(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[KeyColumn | str],
    broadcast_target_keys: bool = False,
) -> DataFrame:
    """Insert source rows whose key is absent from the target.

    Reference: DbUtilities.insertNotExistingItems at
    DbImportWorker.java:494,513,559,577 — an anti equi-join with key
    functions applied on both sides.
    """
    fresh = dedup.drop_duplicates_cross_table(
        source, target, keys, broadcast_target_keys=broadcast_target_keys
    )
    return insert_all(target, fresh)


def _prepare_updates(
    source: DataFrame,
    keys: Sequence[KeyColumn | str],
    value_cols: list[str],
) -> tuple[DataFrame, list[str]]:
    """Rename source value columns to __upd_* and compute key columns."""
    src_keyed, knames = _with_keys(source, keys)
    sel = [F.col(k) for k in knames]
    sel += [F.col(c).alias(UPD_PREFIX + c) for c in value_cols]
    sel.append(F.lit(1).alias(MATCH_FLAG))
    return src_keyed.select(*sel), knames


def update_all_existing(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[KeyColumn | str],
    update_with_null_values: bool = True,
    update_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Update ALL target rows whose key matches a source row.

    Reference: DbUtilities.updateAllExistingItems at
    DbImportWorker.java:535,568; golden proof that every duplicate target
    row gets the update: DbImportTest_MariaDB.java:1477-1525. Null
    overwrite behavior per the `-u` flag (DbImportTest_HSQL.java:470-550).

    The source must already be collapsed to one row per key
    (join_duplicates / drop first) — mirroring the reference, which always
    dedups the temp table before the merge (DbImportWorker.java:477-485).
    """
    tgt_cols = target.columns
    value_cols = list(update_columns) if update_columns is not None else [
        c for c in tgt_cols if c in source.columns
    ]
    updates, knames = _prepare_updates(source, keys, value_cols)
    tgt_keyed, _ = _with_keys(target, keys)
    joined = tgt_keyed.join(updates, on=knames, how="left")
    key_cols = {k.column if isinstance(k, KeyColumn) else k for k in keys}
    upd_cols = {c[len(UPD_PREFIX):] for c in updates.columns if c.startswith(UPD_PREFIX)}
    out = []
    matched = F.col(MATCH_FLAG).isNotNull()
    for c in tgt_cols:
        if c in key_cols or c not in upd_cols:
            out.append(F.col(c).alias(c))
            continue
        upd = F.col(UPD_PREFIX + c)
        new_val = upd if update_with_null_values else F.coalesce(upd, F.col(c))
        out.append(F.when(matched, new_val).otherwise(F.col(c)).alias(c))
    return joined.select(*out)


def update_first_existing(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[KeyColumn | str],
    target_order_col: str,
    update_with_null_values: bool = True,
) -> DataFrame:
    """Update only the FIRST occurrence per key in the target; leave other
    duplicate target rows untouched.

    Reference: DbUtilities.updateFirstExistingItems at
    DbImportWorker.java:526,551; golden proof (rows id 4-6 unchanged):
    DbImportTest_HSQL.java:1055-1102. "First" is defined by the target's
    surrogate order (identity PK in the reference).

    Needs a window row_number over the target keyed groups — unavoidable,
    but the sort is per-key-group (bounded by the duplicate group size),
    not global.
    """
    tgt_cols = target.columns
    updates, knames = _prepare_updates(
        source, keys, [c for c in tgt_cols if c in source.columns]
    )
    tgt_keyed, tknames = _with_keys(target, keys)
    w = Window.partitionBy(*tknames).orderBy(F.col(target_order_col))
    tgt_rn = tgt_keyed.withColumn("__tgt_rn", F.row_number().over(w))
    joined = tgt_rn.join(updates, on=knames, how="left")
    key_cols = {k.column if isinstance(k, KeyColumn) else k for k in keys}
    upd_cols = {c[len(UPD_PREFIX):] for c in updates.columns if c.startswith(UPD_PREFIX)}
    matched = F.col(MATCH_FLAG).isNotNull() & (F.col("__tgt_rn") == 1)
    out = []
    for c in tgt_cols:
        if c in key_cols or c not in upd_cols:
            out.append(F.col(c).alias(c))
            continue
        upd = F.col(UPD_PREFIX + c)
        new_val = upd if update_with_null_values else F.coalesce(upd, F.col(c))
        out.append(F.when(matched, new_val).otherwise(F.col(c)).alias(c))
    return joined.select(*out)


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[KeyColumn | str],
    update_with_null_values: bool = True,
    update_first_only: bool = False,
    target_order_col: str | None = None,
    materialize_source: bool = True,
) -> DataFrame:
    """Update existing keys, then insert not-existing keys.

    Reference: DbImportWorker.java:537-578 (order matters: update first,
    then anti-join insert). Equivalent to a MERGE WHEN MATCHED / WHEN NOT
    MATCHED statement on a Delta sink.

    The source feeds BOTH the update join and the anti-join insert;
    ``materialize_source`` persists it so the (possibly expensive) upstream
    dedup runs once — the DataFrame analogue of the reference's physical
    temp table (DbImportWorker.java:438-469). Callers that invoke upsert
    repeatedly (e.g. a foreachBatch sink) must pass
    ``materialize_source=False`` and own persist/unpersist themselves, or
    each call leaks one cached DataFrame.
    """
    if materialize_source:
        from pyspark import StorageLevel

        source = source.persist(StorageLevel.MEMORY_AND_DISK)
    if update_first_only:
        if target_order_col is None:
            raise ValueError("update_first_only requires target_order_col")
        updated = update_first_existing(
            target, source, keys, target_order_col, update_with_null_values
        )
    else:
        updated = update_all_existing(target, source, keys, update_with_null_values)
    fresh = dedup.drop_duplicates_cross_table(source, target, keys)
    return insert_all(updated, fresh.select(*[c for c in updated.columns if c in fresh.columns]))


def make_unique(
    target: DataFrame,
    keys: Sequence[KeyColumn | str],
    mode: str,  # 'drop' | 'join'
    target_order_col: str,
    update_with_null_values: bool = True,
) -> DataFrame:
    """Dedup the TARGET table itself before merging (MAKE_UNIQUE_*).

    Reference: DbImportWorker.java:432-436; golden 6 prefilled rows → 3 at
    DbImportTest_HSQL.java:1010-1053.
    """
    if mode == "drop":
        return dedup.drop_duplicates_keep_first(target, keys, order_col=target_order_col)
    if mode == "join":
        return dedup.join_duplicates(
            target, keys, order_col=target_order_col,
            update_with_null_values=update_with_null_values,
        )
    raise ValueError(f"unknown make_unique mode: {mode}")


def clear_insert(target: DataFrame, source: DataFrame) -> DataFrame:
    """CLEARINSERT: delete all target rows, then insert the source.

    Reference: DbImportWorker.java:411-415 (pre-delete) + insert path.
    In DataFrame form the result simply IS the source projected to the
    target schema; the deleted count is the old target count.
    """
    return source.select(*[c for c in target.columns if c in source.columns])


def scd2_merge(
    history: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    load_ts,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge of a snapshot into a history.

    The lake-native generalization of the reference's UPSERT
    (DbImportWorker.java:537-578): instead of overwriting matched rows,
    a matched row whose tracked columns changed is CLOSED
    (``valid_to = load_ts``, ``is_current = false``) and a new open row is
    inserted; new keys open a first row; unchanged and historical rows pass
    through untouched. Keys absent from the snapshot are left open (no
    delete detection — matching the reference, which never deletes).

    ``history`` columns must be exactly keys + tracked + the three validity
    columns. Tracked-column comparison is null-safe (``<=>``).

    Scale design: ONE full-outer hash join on the key columns between the
    CURRENT slice and the snapshot; the closed/kept/new branches are three
    projections of that single join (same exchange, reused by AQE), and the
    non-current slice passes through with a pushed-down
    ``NOT is_current`` filter — historical rows are never joined. At 100 TB
    the current slice is a small fraction of history; partition history by
    is_current (or store current separately) and this plan touches only it.
    """
    knames = list(keys)
    # Null-safe current/history split: a NULL is_current row is history
    # (closed), never silently dropped — the two slices partition the input.
    cur = history.filter(F.col(current_col).eqNullSafe(F.lit(True))).withColumn(
        "__cur_match", F.lit(1)
    )
    old = history.filter(~F.col(current_col).eqNullSafe(F.lit(True)))
    src = source.select(
        *[F.col(k).alias("__src_" + k) for k in knames],
        *[F.col(c).alias("__src_" + c) for c in tracked],
        F.lit(1).alias("__src_match"),
    )
    cond = None
    for k in knames:
        eq = cur[k] == src["__src_" + k]
        cond = eq if cond is None else (cond & eq)
    j = cur.join(src, cond, "full_outer")

    changed_pred = F.lit(False)
    for c in tracked:
        changed_pred = changed_pred | ~F.col(c).eqNullSafe(F.col("__src_" + c))
    matched = F.col("__cur_match").isNotNull() & F.col("__src_match").isNotNull()
    changed = matched & changed_pred

    cur_cols = [F.col(c) for c in history.columns]
    kept = j.filter(
        F.col("__cur_match").isNotNull() & (F.col("__src_match").isNull() | ~changed_pred)
    ).select(*cur_cols)
    closed = j.filter(changed).select(
        *[
            F.lit(load_ts).cast("timestamp").alias(valid_to_col)
            if c == valid_to_col
            else F.lit(False).alias(current_col)
            if c == current_col
            else F.col(c)
            for c in history.columns
        ]
    )
    new_rows = j.filter(
        F.col("__src_match").isNotNull() & (F.col("__cur_match").isNull() | changed_pred)
    ).select(
        *[
            F.col("__src_" + c).alias(c)
            if c in knames or c in tracked
            else F.lit(load_ts).cast("timestamp").alias(valid_from_col)
            if c == valid_from_col
            else F.lit(None).cast("timestamp").alias(valid_to_col)
            if c == valid_to_col
            else F.lit(True).alias(current_col)
            for c in history.columns
        ]
    )
    return old.unionByName(kept).unionByName(closed).unionByName(new_rows)


def incremental_append(target: DataFrame, source: DataFrame, watermark_col: str) -> DataFrame:
    """High-watermark incremental import: append only source rows strictly
    newer than the target's max watermark column — the standard shape of a
    periodic re-import job (the reference is re-run on a schedule against
    growing exports; this is that pattern made explicit for lake targets).

    The watermark is a 1-row aggregate broadcast into the filter — fully
    declarative, no driver collect. Strict `>` means rows sharing the
    boundary timestamp with already-imported data are treated as imported
    (choose a monotonically increasing column; ties at the watermark are
    the caller's dedup problem, e.g. follow with insert_not_existing).

    Bootstrap: an empty target has a NULL max-watermark; the filter treats
    that as "no watermark yet" and appends ALL of source (first run imports
    everything), rather than letting `> NULL` silently drop every row."""
    wm = target.agg(F.max(watermark_col).alias("__wm"))
    fresh = (
        source.crossJoin(F.broadcast(wm))
        .filter(F.col("__wm").isNull() | (F.col(watermark_col) > F.col("__wm")))
        .drop("__wm")
    )
    return target.unionByName(fresh)


# ------------------------------------------------ full MERGE INTO clauses

MERGE_CLAUSE_KINDS = frozenset(
    {
        "matched_update",
        "matched_delete",
        "not_matched_insert",
        "not_matched_by_source_update",
        "not_matched_by_source_delete",
    }
)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    clauses: Sequence[tuple],
) -> DataFrame:
    """Full ANSI/Delta ``MERGE INTO`` clause semantics — the general DML
    primitive the narrower import modes (upsert / update_* /
    insert_not_existing) are special cases of:

    ``clauses`` is an ORDERED list of tuples; per row, the FIRST clause
    whose branch and condition match wins (Delta's evaluation order):

    * ``("matched_update", cond, assignments)`` — key in both sides
    * ``("matched_delete", cond)``
    * ``("not_matched_insert", cond, assignments)`` — key only in source
    * ``("not_matched_by_source_update", cond, assignments)`` — key only
      in target (Delta's WHEN NOT MATCHED BY SOURCE)
    * ``("not_matched_by_source_delete", cond)``

    ``cond`` is a SQL string over aliases ``t`` (target) and ``s``
    (source), or None for unconditional. ``assignments`` is
    ``{target_col: sql_expr}`` or ``"all"`` (every column from the
    source row). Unassigned columns keep the target value on update and
    are NULL on insert. Rows matching no clause keep target rows and
    drop unmatched source rows — standard MERGE semantics.

    The source must be key-distinct: a target row matched by MULTIPLE
    source rows would otherwise be silently multiplied by the join
    (one output row per match pair). Like Delta's MERGE, that case
    RAISES at execution time — detected with a key-partitioned window
    count on the source side, which reuses the join's own shuffle
    partitioning (a sort, not an extra exchange). NULL keys never
    match (SQL equality), so they cannot trip the guard.

    Plan shape: ONE full-outer shuffle join on the keys, then a single
    CASE projection per output column — no per-clause pass, no window,
    no driver loop; Catalyst folds the whole clause lattice into one
    whole-stage-codegen'd projection. At 100 TB this is exactly a
    key-shuffle plus map work. (The transactional lake form,
    txnlog.txn_merge_into, stages this result as one commit; its pruned
    siblings — txn_merge_cow / txn_merge_dv — remain the point-update
    fast paths.)
    """
    from functools import reduce

    tcols = list(target.columns)
    ttypes = dict(target.dtypes)
    t = target.withColumn("__t_ex", F.lit(1)).alias("t")
    key_win = Window.partitionBy(*[F.col(k) for k in keys])
    s = (
        source.withColumn("__s_ex", F.lit(1))
        .withColumn("__s_cnt", F.count(F.lit(1)).over(key_win))
        # ordinal among same-key source rows: lets the insert-only arm
        # keep a multi-matched target row exactly ONCE (rn == 1) instead
        # of once per match pair; shares the window's sort, no exchange
        .withColumn("__s_rn", F.row_number().over(key_win.orderBy(F.lit(1))))
        .alias("s")
    )
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
    )
    j = t.join(s, on, "full_outer")
    t_ex = F.col("t.__t_ex").isNotNull()
    s_ex = F.col("s.__s_ex").isNotNull()
    branch = {
        "matched_update": t_ex & s_ex,
        "matched_delete": t_ex & s_ex,
        "not_matched_insert": s_ex & ~t_ex,
        "not_matched_by_source_update": t_ex & ~s_ex,
        "not_matched_by_source_delete": t_ex & ~s_ex,
    }

    def _cond(c):
        if c is None:
            return F.lit(True)
        return F.expr(c) if isinstance(c, str) else c

    action = None  # CASE chain picking the first matching clause's id
    outputs: dict[str, dict] = {}  # action id -> {col: value Column}
    for i, clause in enumerate(clauses):
        kind = clause[0]
        if kind not in MERGE_CLAUSE_KINDS:
            raise ValueError(f"merge_into: unknown clause kind {kind!r}")
        pred = branch[kind] & _cond(clause[1] if len(clause) > 1 else None)
        aid = str(i)
        if kind.endswith("_delete"):
            val = F.lit("__drop__")
        else:
            asg = clause[2] if len(clause) > 2 else "all"
            if asg == "all":
                asg = {c: f"s.{c}" for c in tcols}
            vals = {
                c: (F.expr(e) if isinstance(e, str) else e)
                for c, e in asg.items()
            }
            missing = (
                (lambda c: F.lit(None).cast(ttypes[c]))
                if kind == "not_matched_insert"
                else (lambda c: F.col(f"t.{c}"))
            )
            outputs[aid] = {c: vals.get(c, missing(c)) for c in tcols}
            val = F.lit(aid)
        action = (
            F.when(pred, val) if action is None else action.when(pred, val)
        )
    fallback = F.when(t_ex, F.lit("__keep__")).otherwise(F.lit("__drop__"))
    act = action.otherwise(fallback) if action is not None else fallback
    # Delta's multi-match error, evaluated executor-side — no extra job.
    # Delta parity: only raised when the merge carries MATCHED
    # (update/delete) clauses — an insert-only merge (WHEN NOT MATCHED
    # only) succeeds in Delta even with duplicate source matches: the
    # matched target row passes through unchanged (kept exactly ONCE via
    # the __s_rn ordinal — without it the full-outer join would silently
    # emit one copy per match pair, the pre-r9 bug).
    has_matched_clause = any(c[0].startswith("matched_") for c in clauses)
    if has_matched_clause:
        act = F.when(
            t_ex & s_ex & (F.col("s.__s_cnt") > 1),
            F.raise_error(
                F.concat(
                    F.lit(
                        "merge_into: multiple source rows matched the same "
                        "target row for keys "
                    ),
                    F.to_json(F.struct(*[F.col(f"s.{k}") for k in keys])),
                    F.lit(" — deduplicate the source on the merge keys"),
                )
            ).cast("string"),
        ).otherwise(act)
    else:
        act = F.when(
            t_ex & s_ex & (F.col("s.__s_rn") > 1), F.lit("__drop__")
        ).otherwise(act)
    j = j.withColumn("__act", act).filter(F.col("__act") != "__drop__")
    out = []
    for c in tcols:
        col = F.col(f"t.{c}")
        for aid, vals in outputs.items():
            col = F.when(F.col("__act") == aid, vals[c]).otherwise(col)
        out.append(col.cast(ttypes[c]).alias(c))
    return j.select(*out)
