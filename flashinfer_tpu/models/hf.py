"""HuggingFace checkpoint bridge: load transformers weights into the
flashinfer_tpu model families.

The reference is a kernel library consumed by engines that ship their own
weight loaders; a user switching to this framework needs the same bridge,
so this module maps `transformers` Llama-architecture state dicts (Llama,
Mistral-style: same module names) onto :mod:`models.llama` param trees.

Conventions verified against transformers' modeling_llama:
* HF Linear stores ``[out_features, in_features]`` — transposed here to
  the ``x @ w`` layout.
* HF rotary is the half-split (rotate_half) form — identical to
  ``models.llama._rope``.
* ``silu_and_mul`` consumes ``[gate | up]`` halves = HF
  ``down(silu(gate) * up)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig


def config_from_hf(hf_config) -> LlamaConfig:
    """Map a transformers LlamaConfig onto :class:`LlamaConfig`."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_qo_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        head_dim=head_dim,
        intermediate_size=hf_config.intermediate_size,
        rope_theta=float(getattr(hf_config, "rope_theta", 10000.0)),
        rms_eps=float(getattr(hf_config, "rms_norm_eps", 1e-5)),
    )


def _t(w) -> np.ndarray:
    """HF [out, in] tensor → numpy [in, out]."""
    return np.ascontiguousarray(
        np.asarray(w.detach().cpu().float().numpy()
                   if hasattr(w, "detach") else w, np.float32).T)


def load_hf_llama(model_or_state, cfg: LlamaConfig | None = None,
                  dtype=None) -> tuple[dict, LlamaConfig]:
    """Convert a transformers Llama model (or its state_dict) into
    (params, cfg) for :mod:`models.llama`.

    Accepts a ``LlamaForCausalLM`` instance (config is derived) or a raw
    state dict plus an explicit ``cfg``.
    """
    if hasattr(model_or_state, "state_dict"):
        sd = model_or_state.state_dict()
        if cfg is None:
            cfg = config_from_hf(model_or_state.config)
    else:
        sd = dict(model_or_state)
        if cfg is None:
            raise ValueError("state-dict input needs an explicit cfg")
    dtype = dtype or cfg.dtype
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def get(name):
        return sd[pre + name]

    def stack(fmt):
        return np.stack([_t(get(fmt.format(l)))
                         for l in range(cfg.num_layers)])

    def stack_norm(fmt):
        return np.stack([
            np.asarray(get(fmt.format(l)).detach().cpu().float().numpy()
                       if hasattr(get(fmt.format(l)), "detach")
                       else get(fmt.format(l)), np.float32)
            for l in range(cfg.num_layers)])

    embed = get("embed_tokens.weight")
    embed = np.asarray(embed.detach().cpu().float().numpy()
                       if hasattr(embed, "detach") else embed, np.float32)
    lm_key = "lm_head.weight"
    if lm_key in sd:
        lm_head = _t(sd[lm_key])
    else:  # tied embeddings
        lm_head = np.ascontiguousarray(embed.T)
    final = get("norm.weight")
    final = np.asarray(final.detach().cpu().float().numpy()
                       if hasattr(final, "detach") else final, np.float32)

    params = {
        "embed": jnp.asarray(embed, dtype),
        "wq": jnp.asarray(
            stack("layers.{}.self_attn.q_proj.weight"), dtype),
        "wk": jnp.asarray(
            stack("layers.{}.self_attn.k_proj.weight"), dtype),
        "wv": jnp.asarray(
            stack("layers.{}.self_attn.v_proj.weight"), dtype),
        "wo": jnp.asarray(
            stack("layers.{}.self_attn.o_proj.weight"), dtype),
        "attn_norm": jnp.asarray(
            stack_norm("layers.{}.input_layernorm.weight"), dtype),
        "mlp_norm": jnp.asarray(
            stack_norm("layers.{}.post_attention_layernorm.weight"),
            dtype),
        "w_gate": jnp.asarray(
            stack("layers.{}.mlp.gate_proj.weight"), dtype),
        "w_up": jnp.asarray(stack("layers.{}.mlp.up_proj.weight"), dtype),
        "w2": jnp.asarray(stack("layers.{}.mlp.down_proj.weight"), dtype),
        "final_norm": jnp.asarray(final, dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    return params, cfg
