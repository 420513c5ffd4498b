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
