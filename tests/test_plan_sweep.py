"""Plan-regression sweep: freeze the physical-plan quality of EVERY
registered query.

Asserts that no query's physical plan contains a CartesianProduct, an
un-whitelisted BroadcastNestedLoopJoin, or an un-whitelisted
single-partition Window (the one-task sort trap). The whitelist is
explicit and justified per query — a new query that introduces one of
these shapes fails here until its plan is either fixed or argued onto
the list. (Round-5 verdict "what's wrong" item 2: plan assertions
existed only where lessons had been learned; this sweep is the
prevention.)
"""

import contextlib
import io
import re

import pytest

# BroadcastNestedLoopJoin is legitimate only when the build side is
# bounded by construction. Audited 2026-08-15 (round 6):
BNLJ_OK = {
    # 1-row scalar aggregates crossed into the row stream
    "import_stats": "six 1-row count() scalars crossed into the stats row",
    "incremental_watermark_append": "1-row max(watermark) scalar vs source",
    "sparse_tfidf_neardup": "1-row corpus-size scalar prices df gates",
    "sample_temperature": "1-row n_max scalar in the quota predicate",
    "sample_dsir": "1-row normalization scalar",
    "q22_idle_rich_customers": "TPC-H Q22 scalar avg(acctbal) subquery",
    "quality_nb_classifier": "per-lang prior model frame (rows = |langs|)",
    "retrieval_hybrid_rrf": "1-row corpus stats scalar (BM25 side)",
    # bounded-by-construction non-equi joins
    "embedding_cosine_neardup": "block-tile x_blk<=y_blk pairing; rows = num blocks, not vectors",
    # deliberate brute-force baselines: broadcast query side x corpus scan
    "ann_topk_cosine": "exact brute-force baseline, query side broadcast",
    "ann_filtered_topk": "exact brute-force over the pushed-down filter",
    "ann_lsh_recall": "recall twin joins exact baseline (brute-force side)",
    "ann_ivf_recall": "recall twin joins exact baseline",
    "ann_pq_topk": "ADC re-rank joins exact candidates",
    "ann_pq_recall": "recall twin joins exact baseline",
}

# A Window over Exchange SinglePartition is the one-task trap UNLESS the
# input is bounded by construction:
ONE_TASK_WINDOW_OK = {
    "src_xml_datapath": "single-file _src_order (reference file-row-order "
    "contract; bounded by one import file)",
}


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


# tree-drawing prefix (':', '+', '-', spaces) + optional codegen badge;
# its length is the node's depth in the printed plan tree
_INDENT_RE = re.compile(r"^([ :+\-]*)(?:\*\(\d+\)\s*)?")


def _indent(line: str) -> int:
    return len(_INDENT_RE.match(line).group(1))


def _feeds_single_partition(lines: list, i: int) -> bool:
    """True if an ``Exchange SinglePartition`` appears anywhere in the
    SUBTREE under lines[i] (all following lines strictly deeper in the
    printed tree). The r6 heuristic looked only 3 lines ahead, so a deep
    operator chain between a Window and its one-partition exchange
    slipped through; subtree scoping closes that while still stopping at
    the first sibling (an exchange in an unrelated branch never
    flags)."""
    w = _indent(lines[i])
    for j in range(i + 1, len(lines)):
        lj = lines[j]
        if not lj.strip():
            break
        if _indent(lj) <= w:
            break  # sibling or ancestor: subtree ended
        if "Exchange SinglePartition" in lj:
            return True
    return False


def _violations(plan: str, name: str) -> list:
    out = []
    if "CartesianProduct" in plan:
        out.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        out.append("BroadcastNestedLoopJoin")
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.search(r"\bWindow\b", line) and name not in ONE_TASK_WINDOW_OK:
            if _feeds_single_partition(lines, i):
                out.append("single-partition Window")
                break
    return out


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    """name -> physical plan string (or Exception) for every registered
    query, built ONCE for both sweep tests."""
    from dbimport_spark.plans import QUERIES

    plans = {}
    for name, fn in QUERIES.items():
        try:
            plans[name] = _physical_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — a build error IS a failure
            plans[name] = e
    return plans


def test_no_query_plan_regressions(all_plans):
    failures = {}
    for name, plan in all_plans.items():
        if isinstance(plan, Exception):
            failures[name] = f"build error: {type(plan).__name__}: {plan}"
            continue
        bad = _violations(plan, name)
        if bad:
            failures[name] = ", ".join(bad)
    assert not failures, f"plan regressions: {failures}"


def test_window_detector_sees_deep_chains():
    """Synthetic regression the r6 3-line lookahead MISSED: four
    operators between the Window and its SinglePartition exchange. Also
    pins the negative: an exchange in a SIBLING subtree must not flag."""
    deep = "\n".join(
        [
            "== Physical Plan ==",
            "*(5) Project [user_id]",
            "+- Window [sum(v) windowspecdefinition(...)], [ts ASC]",
            "   +- *(4) Sort [ts ASC NULLS FIRST], false, 0",
            "      +- *(4) Project [user_id, v, ts]",
            "         +- *(4) Filter isnotnull(ts)",
            "            +- *(4) Project [user_id, v, ts, extra]",
            "               +- Exchange SinglePartition, ENSURE_REQUIREMENTS",
            "                  +- *(3) Scan parquet",
        ]
    )
    assert _violations(deep, "synthetic") == ["single-partition Window"]

    sibling = "\n".join(
        [
            "== Physical Plan ==",
            "*(5) SortMergeJoin [k], [k], Inner",
            ":- Window [row_number()], [k], [ts ASC]",
            ":  +- *(2) Sort [k ASC, ts ASC], false, 0",
            ":     +- Exchange hashpartitioning(k, 32)",
            ":        +- Scan parquet",
            "+- *(4) Sort [k ASC], false, 0",
            "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS",
            "      +- *(3) HashAggregate(keys=[], functions=[count(1)])",
            "         +- Scan parquet",
        ]
    )
    assert _violations(sibling, "synthetic") == []


def test_whitelists_stay_minimal(all_plans):
    """The whitelists must not rot: every whitelisted query still exists
    and still NEEDS its exemption (drop the entry when a plan improves)."""
    stale = []
    for name in BNLJ_OK:
        plan = all_plans.get(name)
        if plan is None:
            stale.append(f"{name}: not registered")
        elif not isinstance(plan, Exception) and "BroadcastNestedLoopJoin" not in plan:
            stale.append(f"{name}: no longer produces a BNLJ — drop from whitelist")
    for name in ONE_TASK_WINDOW_OK:
        if name not in all_plans:
            stale.append(f"{name}: not registered")
    assert not stale, stale
