"""End-to-end import pipeline: the Spark equivalent of
DbImportWorker.work() (DbImportWorker.java:330-686).

    source DataFrame (+_src_order)
      → automap/mapping + coercion (valid/invalid split)
      → [complete_commit gate]
      → MAKE_UNIQUE target pre-dedup
      → source dedup (drop-first / join-last-wins)
      → merge per import mode (clearinsert/insert/update/upsert)
      → statistics

Every stage is a pure DataFrame transform; the physical execution is a
pruned anti-join + one left join + hash aggregations — the same set-based
shape the reference pushes into the target database as SQL over a temp
table, minus the temp table.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbimport_spark.config import ImportDefinition, ImportMode
from dbimport_spark.operators import coerce, dedup, merge
from dbimport_spark.operators.order import SRC_ORDER_COL
from dbimport_spark.operators.stats import ImportStatistics
from dbimport_spark.schema.mapping import automap, check_mapping


class ImportError_(Exception):
    """Import aborted (complete_commit mode with invalid rows, or
    structural failure)."""


def run_import(
    definition: ImportDefinition,
    source: DataFrame,
    target: DataFrame,
    target_order_col: str | None = None,
) -> tuple[DataFrame, DataFrame, ImportStatistics]:
    """Returns (new_target, invalid_rows, statistics).

    `target` must carry `target_order_col` when the duplicate mode needs a
    stable target order (UPDATE_FIRST_* / MAKE_UNIQUE_*), mirroring the
    reference's reliance on the identity PK.
    """
    t0 = time.time()
    definition.validate()
    stats = ImportStatistics()
    target_types = {f.name.lower(): f.dataType.simpleString() for f in target.schema.fields}

    # --- mapping + coercion -------------------------------------------------
    mappings = definition.mappings
    if mappings is None:
        mappings = automap(
            [c for c in target.columns if c != target_order_col],
            [c for c in source.columns if c != SRC_ORDER_COL],
        )
    check_mapping(
        mappings,
        list(target.columns),
        list(source.columns),
        definition.key_columns,
    )
    valid, invalid = coerce.apply_mappings(
        source,
        mappings,
        target_types,
        import_tz=definition.import_data_time_zone,
        db_tz=definition.database_time_zone,
        trim=definition.trim_values,
        null_value_string=definition.null_value_string,
        keep_cols=[SRC_ORDER_COL],
    )
    valid = valid.cache()  # reused by dedup + both merge branches + counts
    stats.items_invalid = invalid.count()
    stats.items_valid = valid.count()
    stats.items_found = stats.items_valid + stats.items_invalid
    if definition.complete_commit and stats.items_invalid > 0:
        # `-c`: any error rolls back the whole import
        # (DbImportWorker.java:1092-1098; golden DbImportTest_HSQL.java:398-424)
        raise ImportError_(f"{stats.items_invalid} invalid rows — import rolled back")

    keys = definition.key_columns
    dmode = definition.duplicate_mode

    # --- MAKE_UNIQUE target pre-dedup (DbImportWorker.java:432-436) ---------
    work_target = target
    if keys and dmode.make_unique_target:
        if target_order_col is None:
            raise ImportError_("MAKE_UNIQUE modes need a target order column")
        work_target = merge.make_unique(
            target,
            keys,
            mode=dmode.source_dedup or "join",
            target_order_col=target_order_col,
            update_with_null_values=definition.update_with_null_values,
        )

    # --- source dedup (DbImportWorker.java:477-485) --------------------------
    deduped = valid
    if keys and dmode.source_dedup == "drop":
        deduped = dedup.drop_duplicates_keep_first(valid, keys, order_col=SRC_ORDER_COL)
    elif keys and dmode.source_dedup == "join":
        deduped = dedup.join_duplicates(
            valid, keys, order_col=SRC_ORDER_COL,
            update_with_null_values=definition.update_with_null_values,
        )
    deduped = deduped.drop(SRC_ORDER_COL)

    # --- additional insert/update values (DbImportWorker.java:939-954) -------
    def with_values(df: DataFrame, values: dict[str, str]) -> DataFrame:
        for col, expr in values.items():
            df = df.withColumn(col, F.expr(expr).cast(dict(
                (f.name, f.dataType.simpleString()) for f in target.schema.fields
            ).get(col, "string")))
        return df

    mode = definition.import_mode
    tgt_cols = [c for c in target.columns]

    # --- merge dispatch (DbImportWorker.java:426-581) -------------------------
    if mode is ImportMode.CLEARINSERT:
        stats.items_deleted = target.count()
        inserted = with_values(deduped, definition.additional_insert_values)
        result = inserted.select(*[c for c in tgt_cols if c in inserted.columns])
        stats.items_inserted = stats.items_valid if not keys else result.count()
    elif mode is ImportMode.INSERT:
        if not keys or dmode.source_only_check:
            # NO_CHECK / CKECK_SOURCE_ONLY: insertAllItems — append every
            # (source-deduped) row, no target existence check
            # (DbImportWorker.java:495-500).
            inserted = with_values(deduped, definition.additional_insert_values)
            result = merge.insert_all(work_target, inserted)
            stats.items_inserted = stats.items_valid if not keys else inserted.count()
        else:
            fresh = dedup.drop_duplicates_cross_table(deduped, work_target, keys)
            fresh = with_values(fresh, definition.additional_insert_values)
            stats.items_inserted = fresh.count()
            result = merge.insert_all(work_target, fresh)
    elif mode is ImportMode.UPDATE and dmode.source_only_check:
        # Reference: UPDATE + NO_CHECK/CKECK_SOURCE_ONLY does nothing
        # (DbImportWorker.java:515-517) — the update operators are only
        # ever reached with a per-key-collapsed source.
        result = work_target
    elif mode is ImportMode.UPSERT and dmode.source_only_check:
        # Reference: UPSERT + NO_CHECK/CKECK_SOURCE_ONLY is insertAllItems
        # only — append everything, update nothing
        # (DbImportWorker.java:537-542).
        inserted = with_values(deduped, definition.additional_insert_values)
        result = merge.insert_all(work_target, inserted)
        stats.items_inserted = inserted.count()
    elif mode in (ImportMode.UPDATE, ImportMode.UPSERT):
        upd_kwargs = dict(
            keys=keys,
            update_with_null_values=definition.update_with_null_values,
        )
        upd_source = with_values(deduped, definition.additional_update_values)
        upd_source = upd_source.select(
            *[c for c in upd_source.columns if c in set(tgt_cols) | {SRC_ORDER_COL}]
        )
        # updated count = target rows whose key matches a source key
        tgt_keyed, knames = dedup._with_keys(work_target, keys)
        src_keyed, _ = dedup._with_keys(upd_source, keys)
        stats.items_updated = tgt_keyed.join(
            src_keyed.select(*knames).dropDuplicates(knames), on=knames, how="left_semi"
        ).count()
        if dmode.update_first_only:
            if target_order_col is None:
                raise ImportError_("UPDATE_FIRST modes need a target order column")
            updated = merge.update_first_existing(
                work_target, upd_source, target_order_col=target_order_col, **upd_kwargs
            )
        else:
            updated = merge.update_all_existing(work_target, upd_source, **upd_kwargs)
        if mode is ImportMode.UPSERT:
            fresh = dedup.drop_duplicates_cross_table(deduped, work_target, keys)
            fresh = with_values(fresh, definition.additional_insert_values)
            stats.items_inserted = fresh.count()
            result = merge.insert_all(
                updated, fresh.select(*[c for c in updated.columns if c in fresh.columns])
            )
        else:
            result = updated
    else:  # pragma: no cover
        raise ImportError_(f"unsupported import mode {mode}")

    if keys:
        collapsed = deduped.count()
        stats.items_duplicate = stats.items_valid - collapsed
    stats.seconds_elapsed = time.time() - t0
    return result, invalid, stats


