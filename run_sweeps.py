#!/usr/bin/env python
"""Round-close sweep runner — emits SWEEPS_r{N}.json (VERDICT r6 item 4).

The hostile-config sweep (AQE off, 5 shuffle partitions, Asia/Kolkata
session timezone; ``pytest -m hostile``) and the empty-input sweep
(zero-row copies of every table; ``pytest -m empty``) previously lived
only in commit messages.  This wrapper runs both and writes the counts
as a per-round artifact so the external record matches a fresh run.
Round 8 adds the ``slow`` lane (the full all-query rows smoke plus the
brute-force losslessness cross-checks moved out of the default loop by
VERDICT r7 item 7) so per-round coverage stays identical.

Usage:  python run_sweeps.py [round_number]     (default: $SPARK_GRAFT_ROUND or 7)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time


#: named default-lane evidence recorded alongside the sweeps (VERDICT
#: r8 item 7: the external record should carry the round's new
#: convergence/equivalence proofs, not just the opt-in lanes) — these
#: also run in every default pytest loop; the sweep entry re-runs them
#: fresh and pins the counts in SWEEPS_r{N}.json
EVIDENCE_TESTS = [
    # O(log n) CC convergence on an adversarial diameter-25 chain
    "tests/test_operator_edges.py::"
    "test_cc_chain_diameter25_baseline_fails_loud_twophase_converges",
    # k-core multi-round peel cascade + independent-peel equality
    "tests/test_operator_edges.py::"
    "test_kcore_cascade_fixture_and_independent_peel",
    # frontier BFS: exact distances on a depth-25 chain, O(ecc) rounds,
    # loud cap (r10)
    "tests/test_operator_edges.py::"
    "test_sssp_chain_depth25_converges_and_cap_raises_loud",
    # Bellman-Ford: 2-hop beats heavy direct edge, later-found route
    # overwrites, loud cap (r10)
    "tests/test_operator_edges.py::"
    "test_bellman_ford_two_hops_beat_heavy_direct_edge_and_cap_raises",
    # append-mode output matrix: finalized-window-only emission,
    # closed-window batch equivalence, late-event eviction (r10)
    "tests/test_streaming.py::"
    "test_append_mode_emits_exactly_closed_windows_vs_batch",
    # update-mode output matrix: per-batch re-emission, latest-state
    # batch equivalence, eviction (r10)
    "tests/test_streaming.py::"
    "test_update_mode_reemits_and_latest_state_matches_batch",
    # micro-batch session windows == batch form, fixed AND dynamic gap
    "tests/test_streaming.py::"
    "test_session_window_streaming_matches_batch_fixed_gap",
    "tests/test_streaming.py::"
    "test_session_window_streaming_matches_batch_dynamic_gap",
    # stream-stream LEFT OUTER: null extension held until the
    # watermark closes the match window, then batch equivalence (r11)
    "tests/test_streaming.py::"
    "test_stream_stream_left_outer_null_timing",
    # KS/MWU integer-arithmetic boundary pins (r11)
    "tests/test_operator_edges.py::test_ks_ppm_exact_at_bigint_boundary",
    "tests/test_operator_edges.py::test_mwu_cles_ppm_exact_past_bigint",
    # incremental near-dup ingest == full-corpus recompute + partition
    # prune pin (r11; r12 adds the shingle-store scan + sk-prune pins)
    "tests/test_llm_ops.py::"
    "test_incremental_ingest_near_matches_full_recompute_and_prunes",
    # MMR micro-cosine clean-margin contract (ADVICE r11)
    "tests/test_llm_ops.py::test_mmr_micro_cosine_boundary_margin",
    # incremental semantic ingest: constructed-fixture prune +
    # independent numpy recompute (r12)
    "tests/test_llm_ops.py::"
    "test_semdedup_incremental_prunes_and_matches_recompute",
    # stream-stream FULL OUTER: click-side null extension held until
    # the forward window closes, then batch equivalence (r12)
    "tests/test_streaming.py::"
    "test_stream_stream_full_outer_click_null_timing",
    # relational BPE == imperative greedy left-to-right reference on
    # an overlap-run stress corpus (merges AND final segmentations) (r13)
    "tests/test_llm_ops.py::"
    "test_bpe_train_matches_imperative_reference_on_overlap_runs",
    # substring-span dedup: 28-word floor reported with exact extents,
    # 27-word run absent, repeated run -> one span per diagonal (r13)
    "tests/test_llm_ops.py::"
    "test_substring_spans_guarantee_floor_and_exact_extents",
    # cold-start restart path: cleared memos adopt the on-disk
    # band/shingle + member-embedding stores without rebuild (r13)
    "tests/test_llm_ops.py::"
    "test_incremental_indexes_cold_start_recovery",
]


def run_sweep(marker: str) -> dict:
    t0 = time.perf_counter()
    args = (
        EVIDENCE_TESTS
        if marker == "evidence"
        else ["tests/", "-m", marker]
    )
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *args, "-q", "--no-header"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    dur = round(time.perf_counter() - t0, 1)
    tail = (proc.stdout.strip().split("\n") or [""])[-1]
    # e.g. "200 passed, 292 deselected in 131.9s" / "3 failed, 197 passed, ..."
    n_pass = sum(int(m) for m in re.findall(r"(\d+) passed", tail))
    n_fail = sum(int(m) for m in re.findall(r"(\d+) failed", tail))
    n_err = sum(int(m) for m in re.findall(r"(\d+) error", tail))
    return {
        "config": marker,
        "n_pass": n_pass,
        "n_total": n_pass + n_fail + n_err,
        "duration_sec": dur,
        "summary": tail,
        "ok": proc.returncode == 0 and n_fail == 0 and n_err == 0,
    }


def main() -> None:
    rnd = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_ROUND", "7")
    )
    results = [
        run_sweep("hostile"),
        run_sweep("empty"),
        run_sweep("slow"),
        run_sweep("evidence"),
    ]
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SWEEPS_r{int(rnd):02d}.json"
    )
    with open(out, "w") as f:
        json.dump({"round": int(rnd), "sweeps": results}, f, indent=1)
    print(json.dumps({"round": int(rnd), "sweeps": results}))
    if not all(r["ok"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
