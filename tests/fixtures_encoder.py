"""A minimal custom encoder for the ``encoder_cls`` injection test
(the analog of a user's gin-injected encoder class,
``src/configs/encoders.py:112-158``)."""

import flax.linen as nn
import jax.numpy as jnp

from mmt_tpu.configs.encoder import MmtEncoderConfig


class TinyCustomEncoder(nn.Module):
    """Embedding + one Dense; returns the encoder output contract."""

    config: MmtEncoderConfig
    num_patch_per_row: int = 14

    @nn.compact
    def __call__(self, word_ids, segment_ids=None, att_mask=None,
                 relative_att_ids=None, patch_embeddings=None, lengths=None,
                 images=None, deterministic: bool = True):
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed")(word_ids)
        if patch_embeddings is not None:
            proj = nn.Dense(cfg.hidden_size, name="patch_proj")(patch_embeddings)
            n = proj.shape[1]
            emb = emb.at[:, 2:2 + n].add(proj)
        seq = nn.Dense(cfg.hidden_size, name="mix")(emb)
        return {"sequence_output": seq.astype(jnp.float32)}
