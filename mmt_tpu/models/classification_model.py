"""Classification model: encoder + classification heads only.

Parity surface: ``src/modeling/models/mmt_classification_model.py`` --
returns ``sequence_output`` plus ``<head>_logits`` per head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mmt_tpu.configs.model import ClassificationModelConfig
from mmt_tpu.models.encoder import MmtEncoder
from mmt_tpu.models.heads import ClassificationHead


class MmtClassificationModel(nn.Module):
    config: ClassificationModelConfig
    num_patch_per_row: int = 14

    def setup(self):
        cfg = self.config
        encoder_cfg = cfg.encoder.get()
        names = [h.name for h in cfg.cls_heads]
        if len(set(names)) != len(names):
            raise ValueError("Classification heads should have unique names.")
        from mmt_tpu.configs.encoder import build_encoder

        self.encoder = build_encoder(
            cfg.encoder, num_patch_per_row=self.num_patch_per_row, name="encoder"
        )
        self.cls_heads = [
            ClassificationHead(
                inner_dim=h.inner_dim,
                num_classes=h.num_classes,
                activation=h.activation,
                dropout_rate=h.dropout_rate,
                cls_token_idx=h.cls_token_idx,
                initializer_range=encoder_cfg.initializer_range,
                dtype=jnp.dtype(encoder_cfg.compute_dtype),
                name=f"cls_head_{h.name}",
            )
            for h in cfg.cls_heads
        ]

    def __call__(
        self,
        word_ids,
        segment_ids=None,
        att_mask=None,
        relative_att_ids=None,
        patch_embeddings=None,
        lengths=None,
        images=None,
        patch_mask=None,
        deterministic: bool = True,
    ):
        # patch_mask only reaches encoders that take it (injected
        # encoder_cls classes keep the original call contract).
        extra = {} if patch_mask is None else {"patch_mask": patch_mask}
        outputs = self.encoder(
            word_ids=word_ids,
            segment_ids=segment_ids,
            att_mask=att_mask,
            relative_att_ids=relative_att_ids,
            patch_embeddings=patch_embeddings,
            lengths=lengths,
            images=images,
            deterministic=deterministic,
            **extra,
        )
        outputs.update(
            self.head_outputs(
                outputs["sequence_output"], deterministic=deterministic
            )
        )
        return outputs

    def encoder_inputs(self, *args, **kwargs):
        """Delegates ``MmtEncoder.transformer_inputs`` for external layer
        schedulers (``mmt_tpu.parallel.pipeline``)."""
        return self.encoder.transformer_inputs(*args, **kwargs)

    def head_outputs(self, sequence_output, deterministic: bool = True):
        """Classification heads over a ready [B, S, H] sequence output."""
        outputs = {"sequence_output": sequence_output}
        for head_cfg, head in zip(self.config.cls_heads, self.cls_heads):
            outputs[f"{head_cfg.name}_logits"] = head(
                sequence_output, deterministic=deterministic
            )
        return outputs
