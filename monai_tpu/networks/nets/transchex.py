"""TransChex: vision-language transformer for chest X-ray analysis
(reference: monai/networks/nets/transchex.py:169 BertMixedLayer, :246 MultiModal,
Transchex class).

TPU-native BERT-style layers built from scratch in flax NNX (the reference downloads
pretrained torch BERT weights from HuggingFace; this environment is zero-egress, so
``from_pretrained``-style loading is not available and weights initialize fresh).
All attention runs through jax.nn.dot_product_attention (MXU-friendly fused kernels).
"""
from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...utils.misc import ensure_tuple_rep

__all__ = ["Transchex", "BertMixedLayer", "MultiModal", "Pooler", "BertAttention",
           "BertOutput", "BertPreTrainedModel"]


class _BertConfig:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class BertAttention(nnx.Module):
    """Multi-head (cross-)attention (reference: transchex.py:112)."""

    def __init__(self, config, *, rngs: nnx.Rngs):
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // self.num_heads
        self.query = nnx.Linear(h, h, rngs=rngs)
        self.key = nnx.Linear(h, h, rngs=rngs)
        self.value = nnx.Linear(h, h, rngs=rngs)
        self.out = nnx.Linear(h, h, rngs=rngs)

    def __call__(self, hidden_states, context, attention_mask=None):
        b, nq, _ = hidden_states.shape
        nk = context.shape[1]
        q = self.query(hidden_states).reshape(b, nq, self.num_heads, self.head_dim)
        k = self.key(context).reshape(b, nk, self.num_heads, self.head_dim)
        v = self.value(context).reshape(b, nk, self.num_heads, self.head_dim)
        bias = None
        if attention_mask is not None:
            bias = attention_mask  # additive (B, 1, 1, N) broadcastable bias
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        return self.out(out.reshape(b, nq, -1))


class BertOutput(nnx.Module):
    """Residual + LayerNorm projection (reference: transchex.py:150)."""

    def __init__(self, config, *, rngs: nnx.Rngs):
        self.dense = nnx.Linear(config.hidden_size, config.hidden_size, rngs=rngs)
        self.norm = nnx.LayerNorm(config.hidden_size, rngs=rngs)
        self.dropout = nnx.Dropout(rate=config.hidden_dropout_prob, rngs=rngs)

    def __call__(self, hidden_states, input_tensor):
        return self.norm(self.dropout(self.dense(hidden_states)) + input_tensor)


class _BertLayer(nnx.Module):
    """Standard BERT encoder layer: self-attn + intermediate + output."""

    def __init__(self, config, *, rngs: nnx.Rngs):
        h = config.hidden_size
        self.attention = BertAttention(config, rngs=rngs)
        self.att_out = BertOutput(config, rngs=rngs)
        self.intermediate = nnx.Linear(h, config.intermediate_size, rngs=rngs)
        self.output_dense = nnx.Linear(config.intermediate_size, h, rngs=rngs)
        self.output_norm = nnx.LayerNorm(h, rngs=rngs)

    def __call__(self, x, attention_mask=None):
        att = self.att_out(self.attention(x, x, attention_mask), x)
        h = jax.nn.gelu(self.intermediate(att), approximate=False)
        return self.output_norm(self.output_dense(h) + att)


class BertMixedLayer(nnx.Module):
    """Bidirectional cross-attention layer (reference: transchex.py:169)."""

    def __init__(self, config, *, rngs: nnx.Rngs):
        self.att_x = BertAttention(config, rngs=rngs)
        self.output_x = BertOutput(config, rngs=rngs)
        self.att_y = BertAttention(config, rngs=rngs)
        self.output_y = BertOutput(config, rngs=rngs)

    def __call__(self, x, y):
        out_x = self.att_x(x, y)
        out_y = self.att_y(y, x)
        return self.output_x(out_x, x), self.output_y(out_y, y)


class Pooler(nnx.Module):
    """CLS-token pooler (reference: transchex.py:188)."""

    def __init__(self, hidden_size: int, *, rngs: nnx.Rngs):
        self.dense = nnx.Linear(hidden_size, hidden_size, rngs=rngs)

    def __call__(self, hidden_states):
        return jnp.tanh(self.dense(hidden_states[:, 0]))


class _BertEmbeddings(nnx.Module):
    def __init__(self, config, *, rngs: nnx.Rngs):
        h = config.hidden_size
        self.word_embeddings = nnx.Embed(config.vocab_size, h, rngs=rngs)
        self.position_embeddings = nnx.Embed(config.max_position_embeddings, h, rngs=rngs)
        self.token_type_embeddings = nnx.Embed(config.type_vocab_size, h, rngs=rngs)
        self.norm = nnx.LayerNorm(h, rngs=rngs)
        self.dropout = nnx.Dropout(rate=config.hidden_dropout_prob, rngs=rngs)

    def __call__(self, input_ids, token_type_ids=None):
        n = input_ids.shape[1]
        pos = jnp.arange(n)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        e = (self.word_embeddings(input_ids) + self.position_embeddings(pos)
             + self.token_type_embeddings(token_type_ids))
        return self.dropout(self.norm(e))


class BertPreTrainedModel(nnx.Module):
    """Base marker for BERT-derived modules (reference: transchex.py:32).

    The reference version exists to host HuggingFace ``from_pretrained`` checkpoint
    surgery; weight loading here goes through the generic torch-state-dict bridge
    (networks/utils.py copy_model_state), so this base only records the config.
    """

    def __init__(self, *args, **kwargs):
        pass

    @classmethod
    def from_pretrained(cls, *args, **kwargs):
        raise NotImplementedError(
            "from_pretrained requires HuggingFace checkpoint download (no network "
            "egress); load weights via monai_tpu.networks.utils.copy_model_state.")


class MultiModal(BertPreTrainedModel):
    """Language + vision + mixed transformer stack (reference: transchex.py:246)."""

    def __init__(self, num_language_layers: int, num_vision_layers: int,
                 num_mixed_layers: int, bert_config: dict, *, rngs: nnx.Rngs):
        config = _BertConfig(**bert_config)
        self.embeddings = _BertEmbeddings(config, rngs=rngs)
        self.language_encoder = nnx.List([_BertLayer(config, rngs=rngs)
                                          for _ in range(num_language_layers)])
        self.vision_encoder = nnx.List([_BertLayer(config, rngs=rngs)
                                        for _ in range(num_vision_layers)])
        self.mixed_encoder = nnx.List([BertMixedLayer(config, rngs=rngs)
                                       for _ in range(num_mixed_layers)])

    def __call__(self, input_ids, token_type_ids=None, vision_feats=None,
                 attention_mask=None):
        lang = self.embeddings(input_ids, token_type_ids)
        for layer in self.vision_encoder:
            vision_feats = layer(vision_feats, None)
        for layer in self.language_encoder:
            lang = layer(lang, attention_mask)
        for layer in self.mixed_encoder:
            lang, vision_feats = layer(lang, vision_feats)
        return lang, vision_feats


class Transchex(nnx.Module):
    """(reference: transchex.py Transchex). ``__call__(input_ids, token_type_ids,
    vision_feats)`` returns classification logits."""

    def __init__(self, in_channels: int, img_size: Sequence[int] | int,
                 patch_size: int | tuple[int, int], num_classes: int,
                 num_language_layers: int, num_vision_layers: int, num_mixed_layers: int,
                 hidden_size: int = 768, drop_out: float = 0.0,
                 attention_probs_dropout_prob: float = 0.1,
                 gradient_checkpointing: bool = False, hidden_act: str = "gelu",
                 hidden_dropout_prob: float = 0.1, initializer_range: float = 0.02,
                 intermediate_size: int = 3072, layer_norm_eps: float = 1e-12,
                 max_position_embeddings: int = 512, model_type: str = "bert",
                 num_attention_heads: int = 12, num_hidden_layers: int = 12,
                 pad_token_id: int = 0, position_embedding_type: str = "absolute",
                 transformers_version: str = "", type_vocab_size: int = 2,
                 use_cache: bool = True, vocab_size: int = 30522,
                 chunk_size_feed_forward: int = 0, is_decoder: bool = False,
                 add_cross_attention: bool = False, path_or_repo_id: str = "",
                 filename: str = "", *, rngs: nnx.Rngs):
        img_size = ensure_tuple_rep(img_size, 2)
        patch_size = ensure_tuple_rep(patch_size, 2)
        if any(i % p for i, p in zip(img_size, patch_size)):
            raise ValueError("img_size must be divisible by patch_size.")
        bert_config = dict(hidden_size=hidden_size, num_attention_heads=num_attention_heads,
                           intermediate_size=intermediate_size, vocab_size=vocab_size,
                           max_position_embeddings=max_position_embeddings,
                           type_vocab_size=type_vocab_size,
                           hidden_dropout_prob=hidden_dropout_prob,
                           attention_probs_dropout_prob=attention_probs_dropout_prob)
        self.multimodal = MultiModal(num_language_layers, num_vision_layers,
                                     num_mixed_layers, bert_config, rngs=rngs)
        self.patch_size = patch_size
        self.num_patches = (img_size[0] // patch_size[0]) * (img_size[1] // patch_size[1])
        self.vision_proj = nnx.Conv(in_channels, hidden_size, kernel_size=patch_size,
                                    strides=patch_size, padding="VALID", rngs=rngs)
        self.norm_vision_pos = nnx.LayerNorm(hidden_size, rngs=rngs)
        self.pos_embed_vis = nnx.Param(jnp.zeros((1, self.num_patches, hidden_size)))
        self.pooler = Pooler(hidden_size, rngs=rngs)
        self.drop = nnx.Dropout(rate=drop_out, rngs=rngs)
        self.cls_head = nnx.Linear(hidden_size, num_classes, rngs=rngs)

    def __call__(self, input_ids, token_type_ids=None, vision_feats=None):
        mask = jnp.ones_like(input_ids)[:, None, None, :]
        attention_mask = (1.0 - mask.astype(jnp.float32)) * -10000.0
        v = jnp.transpose(vision_feats, (0, 2, 3, 1))
        v = self.vision_proj(v).reshape(vision_feats.shape[0], -1, self.pos_embed_vis.value.shape[-1])
        v = self.norm_vision_pos(v) + self.pos_embed_vis.value
        lang, _vis = self.multimodal(input_ids=input_ids, token_type_ids=token_type_ids,
                                     vision_feats=v, attention_mask=attention_mask)
        return self.cls_head(self.drop(self.pooler(lang)))
