"""Unit tests for bench.py's pure helpers (no SparkSession needed)."""


def test_sorted_gate_artifacts_numeric_order_and_stray_names():
    """ADVICE r15: a committed file matching the glob BENCH_GATE_r*.json
    but not the round regex (BENCH_GATE_r.json, BENCH_GATE_rc1.json) must
    be SKIPPED, not crash the sort with AttributeError — and ordering is
    numeric, so r100 sorts after r15."""
    import bench

    paths = [
        "/repo/BENCH_GATE_r15.json",
        "/repo/BENCH_GATE_r100.json",
        "/repo/BENCH_GATE_r.json",      # glob-matching stray: no digits
        "/repo/BENCH_GATE_rc1.json",    # glob-matching stray: rc prefix
        "/repo/BENCH_GATE_r09.json",
    ]
    out = bench._sorted_gate_artifacts(paths)
    assert out == [
        "/repo/BENCH_GATE_r09.json",
        "/repo/BENCH_GATE_r15.json",
        "/repo/BENCH_GATE_r100.json",
    ]


def test_sorted_gate_artifacts_empty():
    import bench

    assert bench._sorted_gate_artifacts([]) == []
    assert bench._sorted_gate_artifacts(["/repo/BENCH_GATE_r.json"]) == []
