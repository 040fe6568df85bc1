"""Registry-wide unpartitioned-window guard (r9 verdict item 8).

The r8 plan guard banned partition-less row_number/ntile in the
rewritten rank ops. This generalizes it: EVERY registered op's
physical plan is scanned for Window nodes whose windowspecdefinition
carries no partition columns (global ordered frames and fully-global
frames both funnel the windowed relation through one task), and any
such window must belong to the explicit per-op whitelist below — each
entry stating the BOUND that makes the single task safe. A future op
that silently adds a fact-table-sized global window fails this test
by name.

Two-sided: a whitelisted op that STOPS having a global window fails
too, so the list cannot accrete stale entries.

Classifier notes: `Window [funcs], [part], [order]` argument-group
counting conflates partition-without-order windows (whole-partition
aggregates — scale-safe) with truly global ones, so the classifier
parses each windowspecdefinition's argument list instead: partition
columns print bare, order columns print with ASC/DESC NULLS markers,
so a spec whose first argument is order-marked (or that begins at the
frame) has an empty partition spec.
"""

from __future__ import annotations

import contextlib
import io
import re

from insight_gp_import_spark.registry import load_all_ops

SF = "/root/testdata/sf0.01"
OPS = load_all_ops()

# op -> stated bound for its global window(s). Families:
#   rank-kernel users: the ONLY unpartitioned window runs over the
#     n_buckets-row (64) count table inside _exact_global_rank /
#     _exact_global_ntile (bucket offsets) — bounded by construction.
#   histogram/rollup CDFs: cumulative sums over a pre-aggregated
#     bounded relation (distinct money cents, score deciles, category
#     or month dimensions) — the groupBy BEFORE the window is the
#     scale reduction; the window sees the rollup only.
#   day-spine series: ts_* ops window a per-day (or per-period)
#     aggregate — bounded by the corpus's distinct calendar days
#     (~10^3-10^4 rows at ANY corpus size, 100 TB included).
WHITELIST = {
    # --- rank-kernel bucket-offset tables (64 rows) ---
    "agg_lorenz_deciles": "exact-ntile bucket offsets (64-row count table)",
    "agg_customer_migration_matrix": "exact-ntile bucket offsets ×2 (64-row tables)",
    "agg_eb_shrunk_rates": "exact-rank bucket offsets (64-row table)",
    "agg_hill_tail_index": "exact-rank bucket offsets (64-row table)",
    "win_rank_change": "exact-rank bucket offsets ×2 (64-row tables)",
    "dq_quantile_sketch_bound": "exact-rank bucket offsets (64-row table)",
    "text_vocab_coverage_bands": "exact-rank bucket offsets (64-row table)",
    "agg_monetary_unit_sampling": "exact-rank bucket offsets (64-row table)",
    "dq_sequence_gaps": "exact-rank bucket offsets (64-row table)",
    "dedup_sorted_neighborhood": (
        "exact-rank bucket offsets (64-row table) — the fuzzy-key sort "
        "itself moved onto the kernel in r9; only its bounded bucket "
        "rollup windows remain"
    ),
    # --- bounded histogram / rollup CDFs ---
    "agg_abc_classes": "revenue CDF over the part-category rollup",
    "agg_contribution_waterfall": "cumsum over the nation rollup (25 rows)",
    "agg_gini_activity": "Gini CDF over the distinct-activity-count histogram",
    "agg_mann_whitney_u": "rank CDF over the distinct-cents histogram (documented bound)",
    "agg_mrr_bridge": "month-over-month lag over the month dimension",
    "agg_pareto_cut": "revenue CDF over the distinct-cents histogram",
    "agg_runs_test": "runs scan over the daily-sign spine (distinct days)",
    "agg_survival_km": "KM product over the distinct-duration histogram",
    "corpus_budget_apportion": "largest-remainder rank over the language dim",
    "corpus_dataset_card": "size-decile CDF over the doc-length histogram",
    "corpus_interleave_sources": "round-robin rank over the source dim",
    "dq_join_key_skew": "skew-share CDF over the top-key rollup (bounded by key cap)",
    "dq_ks_drift": "two CDFs over the distinct-value histograms of both samples",
    "embed_dims_variance_ranking": "variance rank over the 64-dim dimension table",
    "graph_degree_stats": "degree CDF over the distinct-degree histogram",
    "pipeline_release_gate": "lead() over the per-stage gate rollup",
    "text_zipf_slope": "log-rank regression over the token-frequency-class rollup",
    "fn_natural_sort_key": "lexical vs natural rank over the distinct-source dim",
    "win_ratio_to_report": "share-of-total over the month rollup",
    "win_z_chart": "rolling stats over the month rollup",
    # --- day/period-spine time series ---
    "ts_anomaly_consensus": "daily spine (distinct days)",
    "ts_bollinger_breaks": "daily spine (distinct days)",
    "ts_event_study_panel": "daily spine (distinct days)",
    "ts_forecast_combination": "daily spine (distinct days)",
    "ts_historical_var": "daily P&L spine (distinct days)",
    "ts_ljung_box_residuals": "per-lag autocorr windows over the daily spine",
    "ts_local_peaks_prominence": "daily spine (distinct days)",
    "ts_max_gain_window": "daily spine (distinct days)",
    "ts_naive_interval_bands": "daily spine (distinct days)",
    "ts_periodogram_quantized": "daily spine (distinct days)",
    "ts_record_days_rate": "daily spine (distinct days)",
    "ts_rsi_zones": "daily spine (distinct days)",
    "ts_sma_crossover": "daily spine (distinct days)",
    "ts_spike_type_attribution": "daily spine (distinct days)",
    "ts_underwater_duration": "daily spine (distinct days)",
    "ts_xmr_control_chart": "daily spine (distinct days)",
    "ts_yoy_growth": "monthly spine (distinct months)",
}

_ORDER_MARK = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)")


def _specs_in(arg: str):
    """Yield each windowspecdefinition's argument string (balanced)."""
    i = 0
    while True:
        j = arg.find("windowspecdefinition(", i)
        if j < 0:
            return
        k = j + len("windowspecdefinition(")
        depth = 1
        out = []
        while depth:
            ch = arg[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth:
                out.append(ch)
            k += 1
        yield "".join(out)
        i = k


def _is_global(spec: str) -> bool:
    head = spec.split("specifiedwindowframe", 1)[0].strip().rstrip(",").strip()
    if not head:
        return True  # no partition, no order: whole relation, one task
    first = head.split(", ")[0]
    return bool(_ORDER_MARK.search(first))


def _global_window_count(spark, name: str) -> int:
    df = OPS[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if ln.strip().startswith("(") and ln.strip().endswith(" Window"):
            for j in range(i + 1, min(i + 8, len(lines))):
                if lines[j].startswith("Arguments:"):
                    n += sum(1 for s in _specs_in(lines[j]) if _is_global(s))
                    break
    return n


def test_whitelist_names_are_registered():
    unknown = sorted(set(WHITELIST) - set(OPS))
    assert not unknown, f"whitelist entries not in registry: {unknown}"


def test_no_unlisted_global_windows(spark):
    """Full-registry sweep: any op with a global (partition-less)
    Window node must be whitelisted above with its bound; any
    whitelisted op must still have one (no stale entries). Ops in the
    whitelist are checked for presence; all others for absence."""
    offenders = {}
    stale = []
    for name in sorted(OPS):
        try:
            n = _global_window_count(spark, name)
        except Exception as e:  # op needs runtime it can't get here
            raise AssertionError(f"{name}: plan build failed: {e!r}") from e
        if n and name not in WHITELIST:
            offenders[name] = n
        elif not n and name in WHITELIST:
            stale.append(name)
    assert not offenders, (
        "ops with non-whitelisted global windows (state the bound and "
        f"whitelist, or repartition the window): {offenders}"
    )
    assert not stale, f"stale whitelist entries (no global window left): {stale}"
