"""Schedule parsing + the exact token-count traces from SURVEY.md §2."""

import json

import numpy as np

import pytest

from rajni_tpu.utils.schedule import (
    PruneSpec,
    load_schedule,
    normalize_schedule,
    schedule_to_dict,
    token_count_trace,
)

README_SCHEDULE = {3: {"keep_ratio": 0.88}, 4: {"keep_ratio": 0.88},
                   7: {"keep_ratio": 0.8}, 8: {"keep_ratio": 0.72}}
SHIPPED_SCHEDULE = {  # reference schedule.json:1-7
    "3": {"keep_ratio": 0.95, "update": False},
    "4": {"keep_ratio": 0.95, "update": True},
    "5": {"keep_ratio": 0.85, "update": True},
    "6": {"keep_ratio": 0.85, "update": True},
    "7": {"keep_ratio": 0.95, "update": True},
}


def test_string_keys_are_fixed():
    """The reference CLI's str-vs-int key bug (SURVEY.md §2 quirk) must be
    fixed: JSON string keys prune exactly like int keys."""
    s = normalize_schedule(SHIPPED_SCHEDULE, 12)
    assert s[3] == PruneSpec(0.95, False)
    assert s[7] == PruneSpec(0.95, True)
    assert sum(e is not None for e in s) == 5


def test_update_defaults_true():
    s = normalize_schedule(README_SCHEDULE, 12)
    assert all(s[i].update for i in (3, 4, 7, 8))  # model.py:19 default


def test_identity_schedule():
    assert normalize_schedule(None, 12) == (None,) * 12
    assert normalize_schedule({}, 12) == (None,) * 12


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        normalize_schedule({12: {"keep_ratio": 0.5}}, 12)
    with pytest.raises(ValueError):
        normalize_schedule({3: {"keep_ratio": 0.0}}, 12)


def test_roundtrip(tmp_path):
    p = tmp_path / "s.json"
    p.write_text(json.dumps(SHIPPED_SCHEDULE))
    s = load_schedule(str(p), 12)
    assert schedule_to_dict(s) == {
        3: {"keep_ratio": 0.95, "update": False},
        4: {"keep_ratio": 0.95, "update": True},
        5: {"keep_ratio": 0.85, "update": True},
        6: {"keep_ratio": 0.85, "update": True},
        7: {"keep_ratio": 0.95, "update": True},
    }


def test_trace_readme_schedule_vitb224():
    """SURVEY.md §2 worked trace #1 (verified against the reference
    arithmetic, attention.py:31-32 / model.py:43)."""
    s = normalize_schedule(README_SCHEDULE, 12)
    assert token_count_trace(197, s) == [
        197, 197, 197, 197, 173, 152, 152, 152, 121, 87, 87, 87,
    ]


def test_trace_shipped_schedule_vitb224():
    s = normalize_schedule(SHIPPED_SCHEDULE, 12)
    assert token_count_trace(197, s) == [
        197, 197, 197, 197, 187, 177, 150, 127, 120, 120, 120, 120,
    ]


def test_trace_shipped_schedule_vitb384():
    s = normalize_schedule(SHIPPED_SCHEDULE, 12)
    assert token_count_trace(577, s) == [
        577, 577, 577, 577, 548, 520, 442, 375, 356, 356, 356, 356,
    ]


def test_flops_accounting():
    """Analytic FLOPs: identity trace == all-stock; pruned trace sits
    between the all-K and all-N extremes; token-work ratio matches the
    documented ~0.82x for schedule.json on ViT-B."""
    from rajni_tpu import flops_per_image, get_config, mfu, model_stats
    from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE

    cfg = get_config("vit_base_patch16_224")
    base = flops_per_image(cfg)
    assert 34e9 < base < 36e9  # ~35 GFLOP (2xMAC) for ViT-B/224
    sched = normalize_schedule(REFERENCE_SCHEDULE, cfg.depth)
    trace = model_stats(cfg, sched)["token_counts"]
    pruned = flops_per_image(cfg, trace)
    # 0.778 with the corrected per-block pairing (the token-MEAN ratio the
    # docs quote is 0.816; FLOPs weigh the quadratic SDPA term too)
    assert 0.75 < pruned / base < 0.82
    assert abs(mfu(cfg, None, 1970.0) - base * 1970 / 197e12) < 1e-9
    with pytest.raises(ValueError, match="entries for depth"):
        flops_per_image(cfg, [197] * 5)


def test_flops_per_block_pairing():
    """Regression for the entry-trace pairing bug (fixed 2026-08-18): the
    function must equal a direct per-block summation over
    (entry[i] -> entry[i+1]) — the old code billed a phantom full-N stock
    block and skipped the last, inflating pruned FLOPs ~4%."""
    from rajni_tpu import flops_per_image, get_config, model_stats
    from rajni_tpu.utils.schedule import REFERENCE_SCHEDULE

    cfg = get_config("vit_base_patch16_224")
    sched = normalize_schedule(REFERENCE_SCHEDULE, cfg.depth)
    trace = model_stats(cfg, sched)["token_counts"]

    C = cfg.embed_dim
    want = 2.0 * (cfg.num_tokens - 1) * cfg.patch_size**2 * 3 * C
    exits = trace[1:] + [trace[-1]]
    for n_in, n_out in zip(trace, exits):
        if n_in == n_out:
            want += 24.0 * n_in * C * C + 4.0 * n_in**2 * C
        else:
            want += 6.0 * n_in * C * C + 18.0 * n_out * C * C \
                + 4.0 * n_out**2 * C
    want += 2.0 * C * cfg.num_classes
    assert flops_per_image(cfg, trace) == pytest.approx(want)

    # the last block CAN prune — only expressible via final_count
    last_prune = flops_per_image(cfg, [197] * 12, final_count=120)
    stock = flops_per_image(cfg)
    assert last_prune < stock


# ---------------------------------------------------------------------------
# Schedule designer (rajni_tpu.utils.schedule_search)
# ---------------------------------------------------------------------------


def test_propose_schedule_meets_target():
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.utils.schedule_search import (
        predict_speedup, propose_schedule,
    )

    cfg = get_config("vit_base_patch16_224")
    sched, info = propose_schedule(cfg, 1.22)
    assert info["reachable"]
    assert info["achieved"] >= 1.22
    assert 0.5 <= info["keep_ratio"] < 1.0
    assert sorted(sched) == [3, 4, 5, 6, 7]  # the reference sample's span
    # gentlest: a slightly larger uniform ratio must MISS the target
    higher = {b: {"keep_ratio": info["keep_ratio"] + 0.02} for b in sched}
    assert predict_speedup(cfg, higher) < 1.22
    # the returned schedule round-trips through the normal machinery
    from rajni_tpu.utils.schedule import normalize_schedule, token_count_trace
    norm = normalize_schedule(sched, cfg.depth)
    assert token_count_trace(cfg.num_tokens, norm) == info["token_counts"]


def test_propose_schedule_unreachable_clamps():
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.utils.schedule_search import propose_schedule

    cfg = get_config("vit_base_patch16_224")
    sched, info = propose_schedule(cfg, 10.0, min_ratio=0.5)
    assert not info["reachable"]
    assert info["keep_ratio"] == 0.5
    assert all(v["keep_ratio"] == 0.5 for v in sched.values())


def test_propose_schedule_validation():
    import pytest

    from rajni_tpu.models.vit import get_config
    from rajni_tpu.utils.schedule_search import propose_schedule

    cfg = get_config("vit_base_patch16_224")
    with pytest.raises(ValueError, match=">= 1.0"):
        propose_schedule(cfg, 0.9)
    with pytest.raises(ValueError, match="out of range"):
        propose_schedule(cfg, 1.2, blocks=[11, 12])
    with pytest.raises(ValueError, match="non-empty"):
        propose_schedule(cfg, 1.2, blocks=[])


def test_schedule_search_cli_round_trip(tmp_path, capsys):
    from rajni_tpu.utils.schedule import load_schedule
    from rajni_tpu.utils.schedule_search import main

    out = tmp_path / "proposed.json"
    main(["--model", "vit_base_patch16_224", "--target", "1.3",
          "--blocks", "2-8", "--out", str(out)])
    printed = capsys.readouterr().out
    assert "analytic speedup" in printed and "UNREACHABLE" not in printed
    # the written file (string keys, like any JSON) loads through the
    # int-normalizing loader and prunes blocks 2..8
    sched = load_schedule(str(out), 12)
    pruned = [i for i, s in enumerate(sched) if s is not None]
    assert pruned == list(range(2, 9))


def test_schedule_search_cli_sweep(capsys):
    from rajni_tpu.utils.schedule_search import main

    main(["--model", "vit_base_patch16_224", "--sweep"])
    out = capsys.readouterr().out
    assert "1.00" in out and "0.50" in out and "x" in out


def test_search_schedule_empirical_bisects():
    """The empirical search bisects the keep-ratio grid and returns the
    smallest (most aggressive) ratio meeting the accuracy budget."""
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.utils.schedule_search import search_schedule_empirical

    cfg = get_config("vit_base_patch16_224")
    calls = []

    def eval_acc(sched):
        if sched is None:
            return 90.0
        r = next(iter(sched.values()))["keep_ratio"]
        calls.append(r)
        return 90.0 - 30.0 * (1.0 - r)  # monotone synthetic accuracy

    sched, info = search_schedule_empirical(
        eval_acc, cfg, max_drop=3.0, min_ratio=0.5, step=0.05
    )
    # drop(r) = 30(1-r) <= 3 iff r >= 0.9; grid 0.5..0.95 -> boundary 0.9
    assert info["keep_ratio"] == pytest.approx(0.9)
    assert info["drop"] <= 3.0 and info["reachable"]
    assert info["analytic_speedup"] > 1.0
    assert len(calls) <= 6  # log2(10-point grid) + endpoints, not a scan
    assert all(
        v["keep_ratio"] == pytest.approx(0.9) for v in sched.values()
    )
    # every measurement is reported for the user's frontier plot
    assert sorted(r for r, _ in info["evals"]) == sorted(calls)


def test_search_schedule_empirical_edges():
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.utils.schedule_search import search_schedule_empirical

    cfg = get_config("vit_base_patch16_224")

    def eval_acc(sched):
        return 90.0  # pruning costs nothing

    sched, info = search_schedule_empirical(
        eval_acc, cfg, max_drop=0.5, min_ratio=0.5, step=0.1
    )
    assert info["keep_ratio"] == pytest.approx(0.5)  # most aggressive wins

    def eval_acc_bad(sched):
        return 90.0 if sched is None else 0.0  # any pruning is fatal

    sched, info = search_schedule_empirical(
        eval_acc_bad, cfg, max_drop=0.5, min_ratio=0.5, step=0.1
    )
    assert sched is None and not info["reachable"]
    assert info["base_acc"] == pytest.approx(90.0)


def test_schedule_search_cli_empirical(tmp_path, capsys):
    """End-to-end empirical mode: checkpoint + tiny ImageFolder; a huge
    budget must select the most aggressive grid ratio."""
    import json as _json

    import jax
    from PIL import Image

    from rajni_tpu.models.vit import get_config, init_params
    from rajni_tpu.params.io import save_params
    from rajni_tpu.utils.schedule import load_schedule
    from rajni_tpu.utils.schedule_search import main

    data = tmp_path / "val"
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    cfg = get_config("vit_tiny_patch16_64")
    ck = tmp_path / "ck.msgpack"
    save_params(str(ck), init_params(jax.random.key(0), cfg))

    out = tmp_path / "found.json"
    main(["--model", "vit_tiny_patch16_64", "--eval_data", str(data),
          "--checkpoint", str(ck), "--max_drop", "200",
          "--batch_size", "2", "--step", "0.25", "--min_ratio", "0.5",
          "--blocks", "1-2", "--kernels", "xla", "--dtype", "float32",
          "--out", str(out)])
    printed = capsys.readouterr().out
    assert "measured top-1" in printed
    sched = load_schedule(str(out), cfg.depth)
    pruned = [i for i, s in enumerate(sched) if s is not None]
    assert pruned == [1, 2]
    assert sched[1].keep_ratio == pytest.approx(0.5)
