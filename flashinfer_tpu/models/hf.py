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


# ---------------------------------------------------------------------------
# DeepSeek-V3 (transformers modeling_deepseek_v3)
# ---------------------------------------------------------------------------


def _np(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().float().numpy()
                      if hasattr(w, "detach") else w, np.float32)


def _deinterleave_pe_cols(w: np.ndarray, dr: int) -> np.ndarray:
    """HF DeepSeek's apply_rotary_pos_emb permutes the rope dims
    (view(..., d//2, 2).transpose(-1, -2)) before the half-split rotation,
    i.e. the checkpoint stores them interleaved. Fold that permutation
    into the projection's last ``dr`` columns so the model's plain
    half-split rope (models.deepseek._rope) is exact."""
    perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])
    out = w.copy()
    out[..., -dr:] = w[..., -dr:][..., perm]
    return out


def config_from_hf_deepseek(hc) -> "DeepseekConfig":
    from .deepseek import DeepseekConfig

    return DeepseekConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        num_heads=hc.num_attention_heads,
        q_lora_rank=int(getattr(hc, "q_lora_rank", 0) or 0),
        kv_lora_rank=hc.kv_lora_rank,
        qk_nope_head_dim=hc.qk_nope_head_dim,
        qk_rope_head_dim=hc.qk_rope_head_dim,
        v_head_dim=hc.v_head_dim,
        num_experts=hc.n_routed_experts,
        num_shared_experts=int(getattr(hc, "n_shared_experts", 0) or 0),
        top_k=hc.num_experts_per_tok,
        n_group=getattr(hc, "n_group", 1) or 1,
        topk_group=getattr(hc, "topk_group", 1) or 1,
        routed_scaling_factor=float(
            getattr(hc, "routed_scaling_factor", 1.0)),
        moe_intermediate_size=hc.moe_intermediate_size,
        dense_intermediate_size=hc.intermediate_size,
        first_k_dense=int(getattr(hc, "first_k_dense_replace", 0)),
        rope_theta=float(getattr(hc, "rope_theta", 10000.0)),
        rms_eps=float(getattr(hc, "rms_norm_eps", 1e-6)),
    )


def load_hf_deepseek(model_or_state, cfg=None, dtype=None):
    """Convert a transformers DeepseekV3ForCausalLM (or state dict + cfg)
    into (params, cfg) for :mod:`models.deepseek`.

    Mapping notes (verified vs modeling_deepseek_v3):
    * ``kv_b_proj`` [H*(dn+dv), kvr] splits into the absorbed ``w_uk``
      [H, dn, kvr] (rows 0:dn per head) and ``w_uv`` [H, kvr, dv]
      (rows dn: per head, transposed).
    * rope dims are stored interleaved in the checkpoint (the HF forward
      permutes them before rotate_half) — folded into the pe columns of
      ``wq``/``wq_b`` and ``wkv_a`` by :func:`_deinterleave_pe_cols`.
    * MoE: ``mlp.gate.weight`` → router, ``e_score_correction_bias`` →
      router_bias, per-expert gate/up stack into ``w13`` [E, h, 2i].
    """
    from .deepseek import DeepseekConfig  # noqa: F401

    if hasattr(model_or_state, "state_dict"):
        sd = model_or_state.state_dict()
        if cfg is None:
            cfg = config_from_hf_deepseek(model_or_state.config)
    else:
        sd = dict(model_or_state)
        if cfg is None:
            raise ValueError("state-dict input needs an explicit cfg")
    dtype = dtype or cfg.dtype
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return _np(sd[pre + name])

    hh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv, kvr = cfg.v_head_dim, cfg.kv_lora_rank
    layers = []
    for l in range(cfg.num_layers):
        a = f"layers.{l}.self_attn."
        m = f"layers.{l}.mlp."
        lp = {
            "attn_norm": jnp.asarray(
                g(f"layers.{l}.input_layernorm.weight"), dtype),
            "mlp_norm": jnp.asarray(
                g(f"layers.{l}.post_attention_layernorm.weight"), dtype),
            "kv_norm": jnp.asarray(g(a + "kv_a_layernorm.weight"), dtype),
            "wo": jnp.asarray(g(a + "o_proj.weight").T, dtype),
        }
        # kv_a: [kvr + dr, h] -> [h, kvr + dr]; de-interleave the pe cols
        lp["wkv_a"] = jnp.asarray(
            _deinterleave_pe_cols(g(a + "kv_a_proj_with_mqa.weight").T, dr),
            dtype)
        kvb = g(a + "kv_b_proj.weight").reshape(hh, dn + dv, kvr)
        lp["w_uk"] = jnp.asarray(kvb[:, :dn, :], dtype)
        lp["w_uv"] = jnp.asarray(
            np.swapaxes(kvb[:, dn:, :], 1, 2), dtype)
        if cfg.q_lora_rank:
            lp["wq_a"] = jnp.asarray(g(a + "q_a_proj.weight").T, dtype)
            lp["q_norm"] = jnp.asarray(g(a + "q_a_layernorm.weight"),
                                       dtype)
            wqb = g(a + "q_b_proj.weight").T.reshape(
                cfg.q_lora_rank, hh, dn + dr)
            wqb = _deinterleave_pe_cols(wqb, dr)
            lp["wq_b"] = jnp.asarray(
                wqb.reshape(cfg.q_lora_rank, hh * (dn + dr)), dtype)
        else:
            wq = g(a + "q_proj.weight").T.reshape(
                cfg.hidden_size, hh, dn + dr)
            wq = _deinterleave_pe_cols(wq, dr)
            lp["wq"] = jnp.asarray(
                wq.reshape(cfg.hidden_size, hh * (dn + dr)), dtype)
        if l < cfg.first_k_dense:
            lp["d_gate"] = jnp.asarray(g(m + "gate_proj.weight").T, dtype)
            lp["d_up"] = jnp.asarray(g(m + "up_proj.weight").T, dtype)
            lp["d_w2"] = jnp.asarray(g(m + "down_proj.weight").T, dtype)
        else:
            lp["router"] = jnp.asarray(g(m + "gate.weight").T, dtype)
            lp["router_bias"] = jnp.asarray(
                g(m + "gate.e_score_correction_bias"), jnp.float32)
            w13 = np.stack([
                np.concatenate(
                    [g(m + f"experts.{e}.gate_proj.weight").T,
                     g(m + f"experts.{e}.up_proj.weight").T], axis=-1)
                for e in range(cfg.num_experts)])
            w2 = np.stack([g(m + f"experts.{e}.down_proj.weight").T
                           for e in range(cfg.num_experts)])
            lp["w13"] = jnp.asarray(w13, dtype)
            lp["w2"] = jnp.asarray(w2, dtype)
            if cfg.num_shared_experts:
                lp["s_gate"] = jnp.asarray(
                    g(m + "shared_experts.gate_proj.weight").T, dtype)
                lp["s_up"] = jnp.asarray(
                    g(m + "shared_experts.up_proj.weight").T, dtype)
                lp["s_w2"] = jnp.asarray(
                    g(m + "shared_experts.down_proj.weight").T, dtype)
        layers.append(lp)

    embed = g("embed_tokens.weight")
    lm_head = (_np(sd["lm_head.weight"]).T if "lm_head.weight" in sd
               else np.ascontiguousarray(embed.T))
    return {
        "embed": jnp.asarray(embed, dtype),
        "final_norm": jnp.asarray(g("norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
        "layers": layers,
    }, cfg


# ---------------------------------------------------------------------------
# Qwen3-Next (transformers modeling_qwen3_next)
# ---------------------------------------------------------------------------


def config_from_hf_qwen_next(hc) -> "QwenNextConfig":
    from .qwen_next import QwenNextConfig

    lt = list(getattr(hc, "layer_types", []))
    # our periodic rule: layer l is full iff l % every == every - 1
    full_idx = [i for i, t in enumerate(lt) if t == "full_attention"]
    every = full_idx[0] + 1 if full_idx else hc.num_hidden_layers + 1
    for i, t in enumerate(lt):
        want = "full_attention" if i % every == every - 1 else \
            "linear_attention"
        if t != want:
            raise ValueError(
                f"non-periodic layer_types not supported: {lt}")
    shared = int(getattr(hc, "shared_expert_intermediate_size", 0)
                 // hc.moe_intermediate_size) if hc.num_experts else 0
    return QwenNextConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        full_attn_every=every,
        num_qo_heads=hc.num_attention_heads,
        num_kv_heads=hc.num_key_value_heads,
        head_dim=hc.head_dim,
        rope_theta=float(hc.rope_theta),
        qk_norm=True,
        attn_gate=True,
        rotary_fraction=float(getattr(hc, "partial_rotary_factor", 1.0)),
        linear_k_heads=hc.linear_num_key_heads,
        linear_v_heads=hc.linear_num_value_heads,
        linear_dk=hc.linear_key_head_dim,
        linear_dv=hc.linear_value_head_dim,
        conv_kernel=hc.linear_conv_kernel_dim,
        num_experts=hc.num_experts,
        top_k=hc.num_experts_per_tok,
        num_shared_experts=shared,
        moe_intermediate_size=hc.moe_intermediate_size,
        rms_eps=float(hc.rms_norm_eps),
    )


def load_hf_qwen_next(model_or_state, cfg=None, dtype=None):
    """Convert a transformers Qwen3NextForCausalLM into (params, cfg) for
    :mod:`models.qwen_next`.

    Layout notes (verified vs modeling_qwen3_next):
    * full attention: ``q_proj`` doubles per head as [query | gate] —
      split into ``wq``/``wg``; per-head ``q_norm``/``k_norm``; partial
      rotary handled by the model config.
    * GDN: ``in_proj_qkvz`` is per-k-head interleaved
      [q_i | k_i | v_grp_i | z_grp_i] — de-interleaved into the model's
      [q_all | k_all | v_all] ``w_qkv`` (the conv channel order, which
      matches the HF conv input built AFTER the reordering) plus ``w_z``;
      ``in_proj_ba`` likewise splits into b|a halves of ``w_ba``.
    * conv1d depthwise weight [conv_dim, 1, K] -> ``conv_w`` [conv_dim, K].
    """
    from .qwen_next import QwenNextConfig  # noqa: F401

    if hasattr(model_or_state, "state_dict"):
        sd = model_or_state.state_dict()
        if cfg is None:
            cfg = config_from_hf_qwen_next(model_or_state.config)
    else:
        sd = dict(model_or_state)
        if cfg is None:
            raise ValueError("state-dict input needs an explicit cfg")
    dtype = dtype or cfg.dtype
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return _np(sd[pre + name])

    h = cfg.hidden_size
    hq, hkv, d = cfg.num_qo_heads, cfg.num_kv_heads, cfg.head_dim
    hk, hv = cfg.linear_k_heads, cfg.linear_v_heads
    dk, dv = cfg.linear_dk, cfg.linear_dv
    r = hv // hk  # v heads per k head
    layers = []
    for l in range(cfg.num_layers):
        a = f"layers.{l}.self_attn."
        la = f"layers.{l}.linear_attn."
        m = f"layers.{l}.mlp."
        # Qwen3NextRMSNorm is ZERO-CENTERED: y = norm(x) * (1 + w) —
        # fold the +1 into the stored weight (the GDN gated norm is the
        # plain form and keeps its weight as-is)
        lp = {
            "attn_norm": jnp.asarray(
                1.0 + g(f"layers.{l}.input_layernorm.weight"), dtype),
            "mlp_norm": jnp.asarray(
                1.0 + g(f"layers.{l}.post_attention_layernorm.weight"),
                dtype),
        }
        if cfg.is_full(l):
            qp = g(a + "q_proj.weight").T.reshape(h, hq, 2 * d)
            lp["wq"] = jnp.asarray(
                qp[:, :, :d].reshape(h, hq * d), dtype)
            lp["wg"] = jnp.asarray(
                qp[:, :, d:].reshape(h, hq * d), dtype)
            lp["wk"] = jnp.asarray(g(a + "k_proj.weight").T, dtype)
            lp["wv"] = jnp.asarray(g(a + "v_proj.weight").T, dtype)
            lp["wo"] = jnp.asarray(g(a + "o_proj.weight").T, dtype)
            lp["q_norm"] = jnp.asarray(1.0 + g(a + "q_norm.weight"),
                                       dtype)
            lp["k_norm"] = jnp.asarray(1.0 + g(a + "k_norm.weight"),
                                       dtype)
        else:
            qkvz = g(la + "in_proj_qkvz.weight").T.reshape(
                h, hk, 2 * dk + 2 * r * dv)
            q_w = qkvz[:, :, :dk].reshape(h, hk * dk)
            k_w = qkvz[:, :, dk:2 * dk].reshape(h, hk * dk)
            v_w = qkvz[:, :, 2 * dk:2 * dk + r * dv].reshape(h, hv * dv)
            z_w = qkvz[:, :, 2 * dk + r * dv:].reshape(h, hv * dv)
            lp["w_qkv"] = jnp.asarray(
                np.concatenate([q_w, k_w, v_w], axis=-1), dtype)
            lp["w_z"] = jnp.asarray(z_w, dtype)
            ba = g(la + "in_proj_ba.weight").T.reshape(h, hk, 2 * r)
            b_w = ba[:, :, :r].reshape(h, hv)
            a_w = ba[:, :, r:].reshape(h, hv)
            lp["w_ba"] = jnp.asarray(
                np.concatenate([b_w, a_w], axis=-1), dtype)
            lp["conv_w"] = jnp.asarray(
                g(la + "conv1d.weight")[:, 0, :], dtype)
            lp["a_log"] = jnp.asarray(g(la + "A_log"), jnp.float32)
            lp["dt_bias"] = jnp.asarray(g(la + "dt_bias"), jnp.float32)
            lp["gdn_norm"] = jnp.asarray(g(la + "norm.weight"), dtype)
            lp["wo"] = jnp.asarray(g(la + "out_proj.weight").T, dtype)
        if cfg.num_experts:
            lp["router"] = jnp.asarray(g(m + "gate.weight").T, dtype)
            w13 = np.stack([
                np.concatenate(
                    [g(m + f"experts.{e}.gate_proj.weight").T,
                     g(m + f"experts.{e}.up_proj.weight").T], axis=-1)
                for e in range(cfg.num_experts)])
            w2 = np.stack([g(m + f"experts.{e}.down_proj.weight").T
                           for e in range(cfg.num_experts)])
            lp["w13"] = jnp.asarray(w13, dtype)
            lp["w2"] = jnp.asarray(w2, dtype)
            if cfg.num_shared_experts:
                lp["s_gate"] = jnp.asarray(
                    g(m + "shared_expert.gate_proj.weight").T, dtype)
                lp["s_up"] = jnp.asarray(
                    g(m + "shared_expert.up_proj.weight").T, dtype)
                lp["s_w2"] = jnp.asarray(
                    g(m + "shared_expert.down_proj.weight").T, dtype)
                lp["s_gate_w"] = jnp.asarray(
                    g(m + "shared_expert_gate.weight").T, dtype)
        else:
            lp["w_gate"] = jnp.asarray(g(m + "gate_proj.weight").T, dtype)
            lp["w_up"] = jnp.asarray(g(m + "up_proj.weight").T, dtype)
            lp["w2"] = jnp.asarray(g(m + "down_proj.weight").T, dtype)
        layers.append(lp)

    embed = g("embed_tokens.weight")
    lm_head = (_np(sd["lm_head.weight"]).T if "lm_head.weight" in sd
               else np.ascontiguousarray(embed.T))
    return {
        "embed": jnp.asarray(embed, dtype),
        "final_norm": jnp.asarray(1.0 + g("norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
        "layers": layers,
    }, cfg
