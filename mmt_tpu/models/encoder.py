"""MmtEncoder: the multimodal relative-attention encoder.

Parity surface: ``src/modeling/models/mmt_encoder.py:29-277``.  Faithful
semantics reproduced exactly (they are weight-compat load-bearing):

* Embedding composition order: LayerNorm(eps 1e-12) + dropout are applied
  to the **word embeddings only**, then segment / absolute-position /
  projected-patch embeddings are added *after* (``mmt_encoder.py:192-218``)
  -- different from BERT, which LNs the sum.
* Patch embeddings are projected ``3*p**2 -> H`` and padded into sequence
  slots ``[2, 2 + N)`` ([CLS] and [PATCH] occupy 0 and 1).
* ``segment_ids=None`` defaults to all-ones.
* Approximate GELU everywhere (``mmt_encoder.py:36-39, 53-54``).
* Relative vocab validation: >= 1D vocab (2*max_dist+1) + 3
  (``mmt_encoder.py:69-80``, ``_NUM_OTHER_RELATIVE_IDS=3``).
* The reference's pooler bug (``outputs[pooled_output]`` NameError at
  ``mmt_encoder.py:235``) is fixed here: the pooled output is actually
  returned under ``"pooled_output"`` (documented deviation; the pooler is
  off in every shipped config).

TPU-native additions:

* ``relative_att_ids``/``att_mask`` may be omitted and derived on device:
  the [S,S] id map is a static per-config constant (baked at trace time
  from ``mmt_tpu.features.relative_position``) and the mask comes from
  per-example lengths -- so nothing [S,S]-shaped ever crosses the
  host->device boundary.
* bfloat16 compute / float32 params; optional Pallas attention; optional
  per-layer remat.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mmt_tpu.configs.encoder import MmtEncoderConfig
from mmt_tpu.features.attention_mask import make_att_mask_from_length
from mmt_tpu.features.relative_position import (
    MmtRelativePositionGenerator,
    RelativePositionGenerator,
)
from mmt_tpu.models.embeddings import EmbeddingLookup
from mmt_tpu.models.relative_attention import RelativeTransformerLayers

_NUM_OTHER_RELATIVE_IDS = 3


def make_relative_att_ids_const(
    config: MmtEncoderConfig, seq_len: int, num_patch_per_row: int
) -> np.ndarray:
    """Static [S, S] relative id map for a config (host numpy, trace-time)."""
    if config.relative_pos_max_distance == 0:
        return None
    if config.relative_att_num_core_layers > 0:
        gen = MmtRelativePositionGenerator(
            num_patch_per_row,
            config.relative_att_num_core_layers,
            config.relative_pos_max_distance,
        )
    else:
        gen = RelativePositionGenerator(config.relative_pos_max_distance)
    return gen.make_relative_att_ids(seq_len, batch_size=1)[0]


class MmtEncoder(nn.Module):
    config: MmtEncoderConfig
    # Patch grid size; used only when deriving side inputs on device.
    num_patch_per_row: int = 14

    def setup(self):
        cfg = self.config
        if cfg.relative_vocab_size is None:
            if cfg.relative_pos_max_distance != 0:
                raise ValueError(
                    "`relative_pos_max_distance` must be 0 when "
                    "`relative_vocab_size` is None."
                )
        elif cfg.relative_vocab_size < (
            2 * cfg.relative_pos_max_distance + 1 + _NUM_OTHER_RELATIVE_IDS
        ):
            raise ValueError(
                f"`relative_vocab_size` ({cfg.relative_vocab_size}) too small for "
                f"`relative_pos_max_distance` ({cfg.relative_pos_max_distance})"
            )

        self._dtype = jnp.dtype(cfg.compute_dtype)
        emb_size = cfg.embedding_size or cfg.hidden_size
        self.word_embeddings = EmbeddingLookup(
            vocab_size=cfg.vocab_size,
            embedding_size=emb_size,
            projection_size=cfg.hidden_size,
            initializer_range=cfg.initializer_range,
            use_one_hot_lookup=False,
            dtype=self._dtype,
            name="word_embeddings",
        )
        self.segment_embeddings = EmbeddingLookup(
            vocab_size=cfg.segment_vocab_size,
            embedding_size=emb_size,
            projection_size=cfg.hidden_size,
            initializer_range=cfg.initializer_range,
            use_one_hot_lookup=cfg.use_one_hot_lookup,
            dtype=self._dtype,
            name="segment_embeddings",
        )
        if cfg.max_absolute_position_embeddings:
            self.position_embeddings = self.param(
                "absolute_position_embeddings",
                nn.initializers.truncated_normal(stddev=cfg.initializer_range),
                (cfg.max_absolute_position_embeddings, cfg.hidden_size),
                jnp.float32,
            )
        self.patch_embedding_projection = nn.Dense(
            cfg.hidden_size,
            kernel_init=nn.initializers.truncated_normal(stddev=cfg.initializer_range),
            dtype=self._dtype,
            name="patch_embedding_projection",
        )
        self.embedding_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, name="embeddings_layer_norm"
        )
        self.embedding_dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)
        self.transformer = RelativeTransformerLayers(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            relative_vocab_size=cfg.relative_vocab_size,
            hidden_dropout=cfg.hidden_dropout_prob,
            attention_dropout=cfg.attention_probs_dropout_prob,
            initializer_range=cfg.initializer_range,
            use_pre_activation_order=cfg.use_pre_activation_order,
            dtype=self._dtype,
            attention_impl=cfg.attention_impl,
            block_q=cfg.attention_block_q,
            block_k=cfg.attention_block_k,
            relative_pos_max_distance=cfg.relative_pos_max_distance,
            relative_att_num_core_layers=cfg.relative_att_num_core_layers,
            num_patch_per_row=self.num_patch_per_row,
            quantize=cfg.quantize,
            attention_window=cfg.attention_window,
            # Auto (-1): the whole image part ([CLS] [PATCH] p_1..p_N,
            # slots [0, 2+N)) is global -- patches see each other and
            # every text token; text beyond that attends within the
            # window.
            attention_num_global=(
                2 + self.num_patch_per_row**2
                if cfg.attention_num_global < 0 else cfg.attention_num_global
            ),
            remat=cfg.remat,
            name="transformer",
        )
        if cfg.use_pooler_layer:
            self.pooler = nn.Dense(
                cfg.hidden_size,
                kernel_init=nn.initializers.truncated_normal(
                    stddev=cfg.initializer_range
                ),
                dtype=self._dtype,
                name="pooler_transform",
            )

    def __call__(
        self,
        word_ids: jnp.ndarray,
        segment_ids: Optional[jnp.ndarray] = None,
        att_mask: Optional[jnp.ndarray] = None,
        relative_att_ids: Optional[jnp.ndarray] = None,
        patch_embeddings: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
        images: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Returns dict with ``sequence_output`` [B, S, H] (float32).

        Side inputs may be given explicitly ([B,S,S] / [S,S]) for parity
        testing, or derived: ``relative_att_ids`` from the static config
        map, ``att_mask`` from ``lengths``.

        ``images`` (<uint8|float>[B, size, size, 3], already resized and
        flipped on host) is the device-side alternative to
        ``patch_embeddings``: /255 (uint8), MEAN-normalize, and patch
        extraction run inside the XLA program, where they fuse into the
        patch-projection matmul -- 4x less host->device traffic than
        shipping [N, 3p^2] float patches.  Inference/classification
        path only: MPP masking zeroes patch embeddings on host, so the
        pretrain loader keeps shipping patch tensors.
        """
        emb, att_mask, relative_att_ids = self.transformer_inputs(
            word_ids,
            segment_ids=segment_ids,
            att_mask=att_mask,
            relative_att_ids=relative_att_ids,
            patch_embeddings=patch_embeddings,
            lengths=lengths,
            images=images,
            patch_mask=patch_mask,
            deterministic=deterministic,
        )
        x = self.transformer(emb, att_mask, relative_att_ids, deterministic, lengths)
        x = x.astype(jnp.float32)

        outputs = {"sequence_output": x}
        if self.config.use_pooler_layer:
            outputs["pooled_output"] = jnp.tanh(
                self.pooler(x[:, 0]).astype(jnp.float32)
            )
        return outputs

    def transformer_inputs(
        self,
        word_ids: jnp.ndarray,
        segment_ids: Optional[jnp.ndarray] = None,
        att_mask: Optional[jnp.ndarray] = None,
        relative_att_ids: Optional[jnp.ndarray] = None,
        patch_embeddings: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
        images: Optional[jnp.ndarray] = None,
        patch_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Everything before the layer stack: embedding assembly plus
        side-input derivation.  Returns ``(embeddings, att_mask,
        relative_att_ids)`` -- exactly what ``__call__`` feeds
        ``self.transformer``.  Exposed as a separate method (usable via
        ``apply(..., method="transformer_inputs")``) so alternative layer
        schedulers -- e.g. ``mmt_tpu.parallel.pipeline`` -- can run the
        stack themselves."""
        cfg = self.config
        batch, seq_len = word_ids.shape
        if patch_embeddings is None and images is not None:
            from mmt_tpu.features.patches import (
                extract_patches,
                normalize_image,
            )

            im = images
            if im.dtype != jnp.float32:
                im = im.astype(jnp.float32) / 255.0
            p = im.shape[1] // self.num_patch_per_row
            patch_embeddings = extract_patches(normalize_image(im), p)
            if patch_mask is not None:
                # MPP masking, device-side (pretraining ship_raw_images):
                # zero the masked patches' pre-projection features --
                # exactly the host pipeline's mutation, fused into XLA.
                patch_embeddings = patch_embeddings * (
                    1.0 - patch_mask[..., None].astype(patch_embeddings.dtype)
                )

        # The Pallas path regenerates ids and the padding mask in-kernel
        # from (geometry, lengths); only when the XLA path will run do we
        # materialize the static [S,S] id map and a dense mask.
        pallas_capable = (
            cfg.attention_impl in ("pallas", "pallas_interpret")
            and relative_att_ids is None
            and lengths is not None
            and (
                cfg.relative_att_num_core_layers == 0
                or self.num_patch_per_row**2
                <= min(cfg.attention_block_q, cfg.attention_block_k, seq_len)
            )
        )
        if (
            not pallas_capable
            and relative_att_ids is None
            and cfg.relative_pos_max_distance > 0
        ):
            relative_att_ids = jnp.asarray(
                make_relative_att_ids_const(cfg, seq_len, self.num_patch_per_row)
            )
        if att_mask is None and lengths is not None and not pallas_capable:
            att_mask = make_att_mask_from_length(seq_len, lengths)

        if segment_ids is None:
            segment_ids = jnp.ones_like(word_ids)

        embeddings = self.word_embeddings(word_ids)
        embeddings = self.embedding_norm(embeddings)
        embeddings = self.embedding_dropout(embeddings, deterministic=deterministic)
        embeddings = embeddings + self.segment_embeddings(segment_ids)

        if cfg.max_absolute_position_embeddings:
            embeddings = embeddings + self.position_embeddings[None, :seq_len].astype(
                embeddings.dtype
            )

        if patch_embeddings is not None:
            num_patches = patch_embeddings.shape[1]
            projected = self.patch_embedding_projection(
                patch_embeddings.astype(self._dtype)
            )
            # Patches occupy slots [2, 2 + N): pad with zeros around.
            projected = jnp.pad(
                projected,
                ((0, 0), (2, seq_len - 2 - num_patches), (0, 0)),
            )
            embeddings = embeddings + projected

        return embeddings.astype(self._dtype), att_mask, relative_att_ids
