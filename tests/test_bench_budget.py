"""The bench.py budget/emission machinery (VERDICT r4 item 1).

Round 4's driver-captured artifact was empty (rc=124, parsed:null) because
the matrix overran the external window mid-section and the JSON printed
only at the very end. These tests pin the three fixes without touching a
device: per-section cost persistence, budget admission, and the cumulative
emission producing a parseable line after every section.
"""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    """Import bench.py fresh with the cost file redirected into tmp."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._COSTS_PATH = str(tmp_path / "bench_costs.json")
    return mod


def test_cost_roundtrip(bench):
    assert bench._load_costs() == {}
    bench._save_cost("config1", 61.23)
    bench._save_cost("config5_single_chip", 600.0)
    bench._save_cost("config1", 55.0)  # last run wins
    costs = bench._load_costs()
    assert costs == {"config1": 55.0, "config5_single_chip": 600.0}


def test_cost_file_corruption_is_tolerated(bench):
    with open(bench._COSTS_PATH, "w") as f:
        f.write("{not json")
    assert bench._load_costs() == {}
    bench._save_cost("config1", 10.0)  # must not raise
    assert bench._load_costs() == {"config1": 10.0}


def test_estimate_prefers_history_with_margin(bench):
    costs = {"config1": 100.0}
    assert bench._estimate_cost("config1", costs) == pytest.approx(125.0)
    # never-run section: cold default, not history
    est = bench._estimate_cost("config5_single_chip", costs)
    assert est == bench._DEFAULT_COSTS["config5_single_chip"]
    # unknown section: generic default
    assert bench._estimate_cost("new_section", {}) == 300.0
    # '#full' variants are estimated separately (2x cold default) so a
    # manual --full run never pollutes the driver's default-matrix admission
    assert bench._estimate_cost("config1#full", {}) == pytest.approx(
        2 * bench._DEFAULT_COSTS["config1"])
    assert bench._estimate_cost("config1#full", {"config1#full": 40.0}) \
        == pytest.approx(50.0)


def test_emit_is_cumulative_and_parseable(bench, capsys):
    out = {"config1": {"value": 0.6, "vs_baseline": 16.7},
           "config2": {"value": 4.7}}
    bench._emit(out)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    top = json.loads(line)
    assert top["value"] == 0.6
    assert top["config2"]["value"] == 4.7
    bench._emit(out, error="watchdog: boom")
    top2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert top2["error"] == "watchdog: boom"
    assert top2["config1"]["value"] == 0.6


def test_emit_survives_missing_config1(bench, capsys):
    bench._emit({"config3": {"value": 0.3}})
    top = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert top["value"] is None
    assert top["config3"]["value"] == 0.3


def test_main_budget_skips_and_lands_lines(bench, capsys, monkeypatch):
    """A matrix whose later sections don't fit the budget still emits a
    final line containing the completed ones, with skip reasons naming the
    estimate — and one cumulative line lands after EVERY section."""
    calls = []

    def cheap(name, sec):
        def fn(full=False):
            calls.append(name)
            return {"value": sec, "vs_baseline": 1.0}
        return fn

    # section 1 (cold default 350s) fits the 500s budget and runs;
    # section 2's estimate (persisted 1000s * 1.25) exceeds it and must be
    # skipped WITHOUT being called
    bench._save_cost("s2", 1000.0)
    monkeypatch.setattr(bench, "MATRIX_DEADLINE_SECONDS", 500.0)
    sections = [("config1", cheap("config1", 0.5)), ("s2", cheap("s2", 9.9))]

    # drive the admission loop exactly as main() does
    import time as _time
    t_start = _time.perf_counter()
    out = {}
    costs = bench._load_costs()
    for name, fn in sections:
        elapsed = _time.perf_counter() - t_start
        est = bench._estimate_cost(name, costs)
        if elapsed + est > bench.MATRIX_DEADLINE_SECONDS:
            out[name] = {"skipped": f"budget: {int(elapsed)}s elapsed + "
                                    f"est {int(est)}s > "
                                    f"{int(bench.MATRIX_DEADLINE_SECONDS)}s"}
            continue
        out[name] = fn()
        bench._emit(out)
    bench._emit(out)

    assert calls == ["config1"]
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2  # one per completed section + the final line
    top = json.loads(lines[-1])
    assert top["config1"]["value"] == 0.5
    assert "est 1250s" in top["s2"]["skipped"]


@pytest.fixture()
def bench_flops(bench, tmp_path):
    bench._FLOPS_CACHE_PATH = str(tmp_path / "flops_cache.json")
    return bench


def test_flops_scalar_cache_hits_without_recompute(bench_flops):
    """Second lookup of a compiled_flops key must come from the persisted
    cache — the fits cost ~90 s per SD section on the real matrix."""
    import jax.numpy as jnp

    bench = bench_flops
    calls = []

    def f(a, b):
        calls.append(1)
        return a @ b

    x = jnp.ones((16, 16))
    v1 = bench._cached_compiled_flops("k1", f, x, x)
    n_after_first = len(calls)
    v2 = bench._cached_compiled_flops("k1", f, x, x)
    assert v1 == v2 and v1 and len(calls) == n_after_first  # no re-trace
    with open(bench._FLOPS_CACHE_PATH) as fh:
        assert "k1" in json.load(fh)


def test_flops_fit_cache_reused_across_rank_iters(bench_flops):
    """config5_proxy (r=2×3) must reuse the spec run's (r=8×5) persisted
    fits: same key, different totals recomputed from the affine fit."""
    import jax.numpy as jnp

    bench = bench_flops
    p = jnp.ones((16, 16))
    x = jnp.ones((4, 16))
    fn = lambda pp, q: (q @ pp).sum(axis=-1)
    v85 = bench._cached_pullback_flops("pbk", fn, p, x, 8, 5)
    # poison the compute path: a hit must not lower anything
    import diffusion_pullback_tpu.utils.flops as fu
    orig = fu.pullback_fits
    fu.pullback_fits = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("fit recomputed on what should be a cache hit"))
    try:
        v23 = bench._cached_pullback_flops("pbk", fn, p, x, 2, 3)
        v85b = bench._cached_pullback_flops("pbk", fn, p, x, 8, 5)
    finally:
        fu.pullback_fits = orig
    assert v85 == v85b and v85 > v23 > 0


def test_flops_cache_invalidated_by_salt(bench_flops, monkeypatch):
    import jax.numpy as jnp

    bench = bench_flops
    x = jnp.ones((8, 8))
    assert bench._cached_compiled_flops("k2", lambda a: a @ a, x)
    monkeypatch.setattr(bench, "_flops_salt", lambda: "different-salt")
    assert bench._flops_cache_get("k2") is None  # stale entry not served
