"""EAGLE speculative decoding: spec on/off greedy equivalence (verification
is exact, so outputs must match regardless of the head's acceptance rate)."""

import tempfile

import pytest

from tiny_configs import write_tiny_eagle_dir, write_tiny_model_dir


@pytest.fixture(scope="module")
def dirs():
    d = tempfile.mkdtemp(prefix="eagle_target_")
    write_tiny_model_dir(d)
    e = tempfile.mkdtemp(prefix="eagle_head_")
    write_tiny_eagle_dir(e)
    return d, e


def make_engine(dirs, spec: bool, topk: int = 1, num_draft: int = 8):
    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, e = dirs
    args = dict(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
    )
    if spec:
        args.update(
            speculative_algorithm="EAGLE",
            speculative_draft_model_path=e,
            speculative_num_steps=3,
            speculative_eagle_topk=topk,
            speculative_num_draft_tokens=num_draft,
        )
    return Engine(ServerArgs(**args))


@pytest.fixture(scope="module")
def ref_out(dirs):
    base = make_engine(dirs, spec=False)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    return base.generate(input_ids=prompts, sampling_params=sp)


def test_eagle_chain_greedy_equivalence(dirs, ref_out):
    spec = make_engine(dirs, spec=True, topk=1)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref_out, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle"
    assert sw.num_rounds > 0
    # A random head should still commit >= 1 token per round (the bonus).
    assert sw.avg_accept_length >= 1.0


def test_eagle_tree_greedy_equivalence(dirs, ref_out):
    """Top-k tree draft + tree verify (speculative/eagle_tree.py): exactness
    must hold regardless of the head, and the worker must be the tree one."""
    spec = make_engine(dirs, spec=True, topk=2, num_draft=6)
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref_out, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle_tree"
    assert sw.num_rounds > 0
    assert sw.avg_accept_length >= 1.0


def test_eagle_tree_beats_or_matches_chain_acceptance(dirs):
    """The tree explores T candidate branches; on any fixed (target, head)
    pair its acceptance length must be >= the chain's at equal depth."""
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8],
               [4, 4, 8, 2, 9], [10, 20, 30, 40, 50, 60, 70]]
    sp = {"max_new_tokens": 32, "temperature": 0.0}
    chain = make_engine(dirs, spec=True, topk=1)
    chain.generate(input_ids=prompts, sampling_params=sp)
    tree = make_engine(dirs, spec=True, topk=4, num_draft=8)
    tree.generate(input_ids=prompts, sampling_params=sp)
    a_chain = chain.scheduler.spec_worker.avg_accept_length
    a_tree = tree.scheduler.spec_worker.avg_accept_length
    assert a_tree >= a_chain - 1e-9, (a_tree, a_chain)


def test_eagle_radix_reuse_and_second_turn(dirs):
    spec = make_engine(dirs, spec=True)
    prompt = [1, 9, 8, 7, 6, 5]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    a = spec.generate(input_ids=prompt, sampling_params=sp)
    b = spec.generate(input_ids=prompt, sampling_params=sp)  # radix reuse path
    assert a["output_ids"] == b["output_ids"]


def test_eagle_tree_sampled_goes_through_spec_path(dirs):
    """Non-greedy requests on the TREE worker use ordered sibling-exclusion
    accept (spec_sampling.spec_accept_tree) instead of disabling spec."""
    spec = make_engine(dirs, spec=True, topk=2, num_draft=6)
    out = spec.generate(
        input_ids=[1, 2, 3, 4],
        sampling_params={"max_new_tokens": 16, "temperature": 1.0, "top_k": 40},
    )
    assert len(out["output_ids"]) == 16
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle_tree"
    assert sw.num_rounds > 0, "sampled request did not enter the tree spec path"
    # With top_k=2 the renormalized p(top candidate) >= 0.5 and the tree
    # carries T=2 branches per node, so acceptances must show up.
    r0 = sw.num_rounds
    out2 = spec.generate(
        input_ids=[7, 8, 9],
        sampling_params={"max_new_tokens": 24, "temperature": 1.0, "top_k": 2},
    )
    assert len(out2["output_ids"]) == 24
    assert sw.num_rounds - r0 < 24, "no tree drafts accepted under sampling"
    # A mixed greedy + sampled batch must also take the spec path.
    outs = spec.generate(
        input_ids=[[5, 6, 7], [8, 9, 10]],
        sampling_params=[
            {"max_new_tokens": 12, "temperature": 0.0},
            {"max_new_tokens": 12, "temperature": 0.9, "top_k": 8},
        ],
    )
    assert all(len(o["output_ids"]) == 12 for o in outs)


def test_eagle3_chain_greedy_equivalence(dirs, ref_out):
    """EAGLE3 (speculative/eagle3.py): aux-hidden capture + fc map + own
    draft vocab with d2t offsets. Verification is exact, so a random head
    must reproduce the baseline greedy outputs bit-for-bit."""
    import tempfile as _tf

    from tiny_configs import write_tiny_eagle3_dir

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, _ = dirs
    e3 = _tf.mkdtemp(prefix="eagle3_head_")
    write_tiny_eagle3_dir(e3)
    spec = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
        speculative_algorithm="EAGLE3",
        speculative_draft_model_path=e3,
        speculative_num_steps=3,
        speculative_eagle_topk=1,
    ))
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref_out, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle3"
    assert sw.num_rounds > 0
    assert sw.avg_accept_length >= 1.0
    # Sampled requests go through the same rejection-sampling accept.
    s = spec.generate(
        input_ids=[4, 5, 6],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 16},
    )
    assert len(s["output_ids"]) == 8


def test_nextn_chain_greedy_equivalence():
    """NEXTN (speculative/nextn.py): deepseek MTP draft — eh_proj pair into
    one full MLA+MoE layer with its own embed/norm/lm_head. Verification is
    exact, so a random head must reproduce the deepseek target's baseline
    greedy outputs bit-for-bit."""
    import tempfile as _tf

    from test_models_parity import TINY_DEEPSEEK_V2_CFG
    from tiny_configs import write_tiny_nextn_dir

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = _tf.mkdtemp(prefix="nextn_target_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)
    h = _tf.mkdtemp(prefix="nextn_head_")
    write_tiny_nextn_dir(h, TINY_DEEPSEEK_V2_CFG)

    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    base = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
    ))
    ref = base.generate(input_ids=prompts, sampling_params=sp)

    spec = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
        speculative_algorithm="NEXTN",
        speculative_draft_model_path=h,
        speculative_num_steps=3,
        speculative_eagle_topk=1,
    ))
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "nextn"
    assert sw.num_rounds > 0
    assert sw.avg_accept_length >= 1.0
    # Sampled requests ride the same rejection-sampling accept.
    s = spec.generate(
        input_ids=[4, 5, 6],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 16},
    )
    assert len(s["output_ids"]) == 8


def test_eagle3_tree_greedy_equivalence(dirs, ref_out):
    """EAGLE3 head under the top-k TREE driver (speculative/eagle_tree.py
    Eagle3TreeWorker): proposal over the reduced draft vocab + d2t map,
    verify with aux-hidden capture. Exact verification => bit-equal greedy
    outputs vs the no-spec baseline."""
    import tempfile as _tf

    from tiny_configs import write_tiny_eagle3_dir

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d, _ = dirs
    e3 = _tf.mkdtemp(prefix="eagle3_head_")
    write_tiny_eagle3_dir(e3)
    spec = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
        speculative_algorithm="EAGLE3",
        speculative_draft_model_path=e3,
        speculative_num_steps=3,
        speculative_eagle_topk=2,
        speculative_num_draft_tokens=6,
    ))
    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref_out, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle_tree" and type(sw).__name__ == "Eagle3TreeWorker"
    assert sw.num_rounds > 0
    assert sw.avg_accept_length >= 1.0
    # Sampled requests ride the sampled tree accept (sibling exclusion).
    s = spec.generate(
        input_ids=[4, 5, 6],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "top_k": 16},
    )
    assert len(s["output_ids"]) == 8


def test_nextn_tree_greedy_equivalence():
    """NEXTN (deepseek MTP) head under the top-k TREE driver: MLA latent
    draft rows + tree-masked MLA target verify (deepseek_v2._attention
    tree_mask plumb). Exact verification => bit-equal greedy outputs."""
    import tempfile as _tf

    from test_models_parity import TINY_DEEPSEEK_V2_CFG
    from tiny_configs import write_tiny_nextn_dir

    from ltp_sglang_tpu.config.server_args import ServerArgs
    from ltp_sglang_tpu.entrypoints.engine import Engine

    d = _tf.mkdtemp(prefix="nextn_target_")
    write_tiny_model_dir(d, cfg=TINY_DEEPSEEK_V2_CFG)
    h = _tf.mkdtemp(prefix="nextn_head_")
    write_tiny_nextn_dir(h, TINY_DEEPSEEK_V2_CFG)

    prompts = [[1, 5, 7, 9, 100, 200], [2, 3, 4, 5, 6, 7, 8]]
    sp = {"max_new_tokens": 24, "temperature": 0.0}
    base = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
    ))
    ref = base.generate(input_ids=prompts, sampling_params=sp)

    spec = Engine(ServerArgs(
        model_path=d, dtype="float32",
        max_total_tokens=4096, max_running_requests=8,
        speculative_algorithm="NEXTN",
        speculative_draft_model_path=h,
        speculative_num_steps=3,
        speculative_eagle_topk=2,
        speculative_num_draft_tokens=6,
    ))
    out = spec.generate(input_ids=prompts, sampling_params=sp)
    for r, o in zip(ref, out):
        assert o["output_ids"] == r["output_ids"], (o["output_ids"], r["output_ids"])
    sw = spec.scheduler.spec_worker
    assert sw.kind == "eagle_tree" and type(sw).__name__ == "NextNTreeWorker"
    assert sw.num_rounds > 0
    assert sw.avg_accept_length >= 1.0
