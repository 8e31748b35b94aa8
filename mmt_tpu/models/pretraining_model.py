"""Pretraining model: encoder + MLM + MPP + classification heads.

Parity surface: ``src/modeling/models/mmt_pretraining_model.py`` --
returns a dict of ``sequence_output``, ``mlm_logits``, ``mpp_logits``,
and ``<head>_logits`` per classification head; the MLM output projection
uses the encoder's (tied) word embedding table by default, or an
untied table of the same shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmt_tpu.configs.model import ClsHeadConfig, PretrainModelConfig
from mmt_tpu.models.encoder import MmtEncoder
from mmt_tpu.models.heads import ClassificationHead, MaskedLMHead, MaskedPPHead


class MmtPretrainingModel(nn.Module):
    config: PretrainModelConfig
    mpp_output_num_classes: int = 512
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
        emb_size = encoder_cfg.embedding_size or encoder_cfg.hidden_size
        if not cfg.bind_word_embedding_table:
            self.mlm_embedding_table = self.param(
                "mlm_embedding_table",
                nn.initializers.truncated_normal(stddev=encoder_cfg.initializer_range),
                (encoder_cfg.vocab_size, emb_size),
                jnp.float32,
            )
        self.masked_lm = MaskedLMHead(
            embedding_size=emb_size,
            activation=cfg.mlm_activation,
            dtype=jnp.dtype(encoder_cfg.compute_dtype),
            name="masked_lm",
        )
        self.masked_pp = MaskedPPHead(
            num_classes=self.mpp_output_num_classes,
            activation=cfg.mpp_activation,
            dtype=jnp.dtype(encoder_cfg.compute_dtype),
            name="masked_pp",
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
        mlm_positions=None,
        mpp_positions=None,
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
                outputs["sequence_output"],
                mlm_positions=mlm_positions,
                mpp_positions=mpp_positions,
                deterministic=deterministic,
            )
        )
        return outputs

    def encoder_inputs(self, *args, **kwargs):
        """Delegates ``MmtEncoder.transformer_inputs`` (embeddings +
        derived side inputs) for external layer schedulers such as
        ``mmt_tpu.parallel.pipeline``."""
        return self.encoder.transformer_inputs(*args, **kwargs)

    def head_outputs(
        self,
        sequence_output,
        mlm_positions=None,
        mpp_positions=None,
        deterministic: bool = True,
    ):
        """Everything after the encoder: MLM/MPP/classification heads
        over a ready [B, S, H] fp32 sequence output."""
        outputs = {"sequence_output": sequence_output}
        if self.config.bind_word_embedding_table:
            table = self.encoder.word_embeddings.variables["params"][
                "embedding_table"
            ]
        else:
            table = self.mlm_embedding_table

        if mlm_positions is not None:
            outputs["mlm_logits"] = self.masked_lm(sequence_output, mlm_positions, table)
        if mpp_positions is not None:
            outputs["mpp_logits"] = self.masked_pp(sequence_output, mpp_positions)
        for head_cfg, head in zip(self.config.cls_heads, self.cls_heads):
            outputs[f"{head_cfg.name}_logits"] = head(
                sequence_output, deterministic=deterministic
            )
        return outputs
