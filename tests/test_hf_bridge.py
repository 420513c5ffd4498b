"""HF checkpoint bridge: converted weights must reproduce transformers'
own forward logits through the flashinfer_tpu model."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    with torch.no_grad():
        m = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    return m


def test_converted_weights_match_hf_logits(hf_model):
    from flashinfer_tpu.models.hf import load_hf_llama
    from flashinfer_tpu.models.llama import _mm, prefill

    params, cfg = load_hf_llama(hf_model, dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.head_dim == 32

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, 9)
    with torch.no_grad():
        ref = hf_model(torch.tensor(toks[None])).logits[0].numpy()

    hidden = prefill(params, cfg, jnp.asarray(toks, jnp.int32),
                     np.array([0, len(toks)]))
    ours = np.asarray(_mm(hidden, params["lm_head"]), np.float32)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_state_dict_input_and_tied_embeddings(hf_model):
    from flashinfer_tpu.models.hf import config_from_hf, load_hf_llama

    cfg = config_from_hf(hf_model.config)
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k != "lm_head.weight"}  # force the tied-embedding path
    params, _ = load_hf_llama(sd, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(params["lm_head"], np.float32),
        np.asarray(params["embed"], np.float32).T, rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# DeepSeek-V3
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_deepseek():
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    hc = DeepseekV3Config(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=256,
        moe_intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=8,
        n_shared_experts=1,
        n_routed_experts=8,
        routed_scaling_factor=2.5,
        kv_lora_rank=256,
        q_lora_rank=96,
        qk_rope_head_dim=64,
        v_head_dim=64,
        qk_nope_head_dim=64,
        n_group=2,
        topk_group=1,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        norm_topk_prob=True,
        max_position_embeddings=256,
        rope_theta=10000.0,
        attention_bias=False,
        rope_scaling=None,
        use_cache=False,
    )
    model = DeepseekV3ForCausalLM(hc)
    model.eval()
    return model


def test_deepseek_converted_weights_match_hf_logits(hf_deepseek):
    from flashinfer_tpu.models import deepseek as ds
    from flashinfer_tpu.models.hf import load_hf_deepseek

    params, cfg = load_hf_deepseek(hf_deepseek, dtype=jnp.float32)
    cfg = ds.replace(cfg, dtype=jnp.float32)
    assert cfg.q_lora_rank == 96 and cfg.first_k_dense == 1

    rng = np.random.default_rng(1)
    n = 9
    toks = rng.integers(0, cfg.vocab_size, n)
    with torch.no_grad():
        ref = hf_deepseek(torch.tensor(toks[None])).logits[0].numpy()

    page_size = 8
    caches = ds.init_kv_cache(cfg, 2, page_size, dtype=jnp.float32)
    table = jnp.asarray(np.arange(2, dtype=np.int32)[None])
    hidden, _ = ds.prefill(params, cfg, caches,
                           jnp.asarray(toks, jnp.int32),
                           np.array([0, n]), table)
    ours = np.asarray(
        hidden.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32),
        np.float32)
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


# ---------------------------------------------------------------------------
# Qwen3-Next
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_qwen_next():
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(0)
    hc = Qwen3NextConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        head_dim=128, linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=64, linear_value_head_dim=64,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128, shared_expert_intermediate_size=128,
        decoder_sparse_step=1, partial_rotary_factor=0.25,
        max_position_embeddings=128, rope_theta=10000.0,
        norm_topk_prob=True, attn_implementation="eager", use_cache=False,
    )
    model = Qwen3NextForCausalLM(hc)
    model.eval()
    return model


def test_qwen_next_converted_weights_match_hf_logits(hf_qwen_next):
    from flashinfer_tpu.models import qwen_next as qn
    from flashinfer_tpu.models.hf import load_hf_qwen_next

    params, cfg = load_hf_qwen_next(hf_qwen_next, dtype=jnp.float32)
    cfg = qn.replace(cfg, dtype=jnp.float32)
    assert cfg.full_attn_every == 4 and cfg.rotary_fraction == 0.25

    rng = np.random.default_rng(2)
    n = 9
    toks = rng.integers(0, cfg.vocab_size, n)
    with torch.no_grad():
        ref = hf_qwen_next(torch.tensor(toks[None])).logits[0].numpy()

    state = qn.init_state(cfg, 1, 4, 8, kv_dtype=jnp.float32)
    table = jnp.asarray(np.arange(4, dtype=np.int32)[None])
    hidden, _ = qn.prefill(params, cfg, state,
                           jnp.asarray(toks[None], jnp.int32), table)
    ours = np.asarray(
        hidden[0].astype(jnp.float32)
        @ params["lm_head"].astype(jnp.float32), np.float32)
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)
