"""Model-layer tests: encoder semantics, heads, attention parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.configs import (
    ClsHeadConfig,
    MmtEncoderConfig,
    PretrainModelConfig,
    ClassificationModelConfig,
)
from mmt_tpu.configs.encoder import EncoderConfig
from mmt_tpu.models import MmtEncoder, MmtPretrainingModel, MmtClassificationModel
from mmt_tpu.ops.relative_attention_ref import (
    gather_indexes,
    relative_attention_scores,
)


def tiny_encoder_config(**kw):
    defaults = dict(
        vocab_size=64,
        segment_vocab_size=4,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        relative_pos_max_distance=3,
        relative_vocab_size=12,
        relative_att_num_core_layers=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        compute_dtype="float32",
    )
    defaults.update(kw)
    return MmtEncoderConfig(**defaults)


class TestRelativeScores:
    def test_oov_ids_zero_bias(self):
        rng = np.random.default_rng(0)
        B, S, H, D, V = 1, 4, 2, 8, 5
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
        ids_oov = jnp.full((S, S), V + 3, jnp.int32)  # all OOV
        with_bias = relative_attention_scores(q, k, table, ids_oov)
        without = relative_attention_scores(q, k, None, None)
        np.testing.assert_allclose(with_bias, without, rtol=1e-6)

    def test_bias_matches_onehot_einsum(self):
        rng = np.random.default_rng(1)
        B, S, H, D, V = 2, 6, 2, 4, 7
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, V, size=(S, S)), jnp.int32)

        got = relative_attention_scores(q, k, table, ids)
        # Reference: one-hot formulation (the etcmodel semantic).
        onehot = jax.nn.one_hot(ids, V)
        rel = jnp.einsum("bqhd,vhd->bhqv", q, table)
        rel = jnp.einsum("bhqv,qkv->bhqk", rel, onehot)
        content = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        want = (content + rel) / np.sqrt(D)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_gather_indexes(self):
        seq = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
        pos = jnp.array([[0, 2], [3, 1]])
        out = gather_indexes(seq, pos)
        np.testing.assert_array_equal(out[0, 1], np.asarray(seq[0, 2]))
        np.testing.assert_array_equal(out[1, 0], np.asarray(seq[1, 3]))


class TestEncoder:
    def _inputs(self, S=8, P=2, B=2):
        num_patches = P * P
        rng = np.random.default_rng(0)
        return dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
            segment_ids=jnp.asarray(rng.integers(0, 3, (B, S)), jnp.int32),
            patch_embeddings=jnp.asarray(
                rng.normal(size=(B, num_patches, 12)), jnp.float32
            ),
            lengths=jnp.array([S, S - 2], jnp.int32),
        )

    def test_forward_shapes(self):
        cfg = tiny_encoder_config()
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        inputs = self._inputs()
        params = enc.init(jax.random.PRNGKey(0), **inputs)
        out = enc.apply(params, **inputs)
        assert out["sequence_output"].shape == (2, 8, 32)
        assert out["sequence_output"].dtype == jnp.float32

    def test_padding_does_not_leak(self):
        # Changing content in padding positions must not affect real outputs.
        cfg = tiny_encoder_config()
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        inputs = self._inputs()
        params = enc.init(jax.random.PRNGKey(0), **inputs)
        out1 = enc.apply(params, **inputs)

        words2 = np.asarray(inputs["word_ids"]).copy()
        words2[1, 7] = 33  # beyond length 6 for row 1
        inputs2 = dict(inputs, word_ids=jnp.asarray(words2))
        out2 = enc.apply(params, **inputs2)
        np.testing.assert_allclose(
            out1["sequence_output"][1, :6], out2["sequence_output"][1, :6], atol=1e-6
        )

    def test_embedding_composition_order(self):
        # LN+dropout on word embeddings only, THEN add segment embeddings:
        # with all-zero word table, output embedding before transformer is
        # LN(0) + segment_emb = segment_emb (LN of zeros is zeros with
        # zero-init scale... instead verify indirectly: changing segment id
        # changes output even when word LN saturates).  Direct check:
        # compare against manual computation with 1-layer-free encoder.
        cfg = tiny_encoder_config(num_hidden_layers=0)
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        inputs = self._inputs()
        params = enc.init(jax.random.PRNGKey(0), **inputs)

        p = params["params"]
        wt = p["word_embeddings"]["embedding_table"]
        st = p["segment_embeddings"]["embedding_table"]
        ln_scale = p["embeddings_layer_norm"]["scale"]
        ln_bias = p["embeddings_layer_norm"]["bias"]
        pw = p["patch_embedding_projection"]["kernel"]
        pb = p["patch_embedding_projection"]["bias"]

        we = np.asarray(wt)[np.asarray(inputs["word_ids"])]
        mu = we.mean(-1, keepdims=True)
        var = we.var(-1, keepdims=True)
        ln = (we - mu) / np.sqrt(var + 1e-12) * np.asarray(ln_scale) + np.asarray(ln_bias)
        seg = np.asarray(st)[np.asarray(inputs["segment_ids"])]
        patches = np.asarray(inputs["patch_embeddings"]) @ np.asarray(pw) + np.asarray(pb)
        manual = ln + seg
        manual[:, 2:6] += patches

        out = enc.apply(params, **inputs)
        np.testing.assert_allclose(out["sequence_output"], manual, atol=1e-4)

    def test_pooler_returned(self):
        cfg = tiny_encoder_config(use_pooler_layer=True)
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        inputs = self._inputs()
        params = enc.init(jax.random.PRNGKey(0), **inputs)
        out = enc.apply(params, **inputs)
        assert out["pooled_output"].shape == (2, 32)

    def test_relative_vocab_validation(self):
        cfg = tiny_encoder_config(relative_vocab_size=5)  # < 2*3+1+3
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        with pytest.raises(ValueError):
            enc.init(jax.random.PRNGKey(0), **self._inputs())


class TestModels:
    def _cfg(self):
        enc = tiny_encoder_config()
        return PretrainModelConfig(
            encoder=EncoderConfig(mmt=enc),
            cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
        )

    def test_pretraining_model_outputs(self):
        model = MmtPretrainingModel(self._cfg(), mpp_output_num_classes=512,
                                    num_patch_per_row=2)
        rng = np.random.default_rng(0)
        B, S = 2, 8
        inputs = dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
            segment_ids=jnp.ones((B, S), jnp.int32),
            patch_embeddings=jnp.asarray(rng.normal(size=(B, 4, 12)), jnp.float32),
            mlm_positions=jnp.asarray([[6, 7], [6, 0]], jnp.int32),
            mpp_positions=jnp.asarray([[2, 3], [3, 0]], jnp.int32),
            lengths=jnp.array([8, 8], jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(0), **inputs)
        out = model.apply(params, **inputs)
        assert out["mlm_logits"].shape == (2, 2, 64)
        assert out["mpp_logits"].shape == (2, 2, 512)
        assert out["itm_logits"].shape == (2, 2)

    def test_tied_embedding_table(self):
        # mlm_logits must respond to the word embedding table when tied.
        model = MmtPretrainingModel(self._cfg(), num_patch_per_row=2)
        rng = np.random.default_rng(0)
        inputs = dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (1, 8)), jnp.int32),
            mlm_positions=jnp.asarray([[6, 7]], jnp.int32),
            lengths=jnp.array([8], jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(0), **inputs)
        out1 = model.apply(params, **inputs)

        import flax

        flat = flax.traverse_util.flatten_dict(params["params"])
        key = ("encoder", "word_embeddings", "embedding_table")
        flat[key] = flat[key] * 2.0
        params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
        out2 = model.apply(params2, **inputs)
        assert not np.allclose(out1["mlm_logits"], out2["mlm_logits"])

    def test_classification_model(self):
        enc = tiny_encoder_config()
        cfg = ClassificationModelConfig(
            encoder=EncoderConfig(mmt=enc),
            cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
        )
        model = MmtClassificationModel(cfg, num_patch_per_row=2)
        rng = np.random.default_rng(0)
        inputs = dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (2, 8)), jnp.int32),
            patch_embeddings=jnp.asarray(rng.normal(size=(2, 4, 12)), jnp.float32),
            lengths=jnp.array([8, 6], jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(0), **inputs)
        out = model.apply(params, **inputs)
        assert out["itm_logits"].shape == (2, 2)


class TestPallasModelPath:
    def test_encoder_pallas_matches_xla(self):
        """Full-model consistency: fused attention (interpret) == XLA path."""
        rng = np.random.default_rng(0)
        S, P, B = 16, 2, 2
        inputs = dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
            segment_ids=jnp.asarray(rng.integers(1, 3, (B, S)), jnp.int32),
            patch_embeddings=jnp.asarray(rng.normal(size=(B, 4, 12)), jnp.float32),
            lengths=jnp.asarray([S, S - 5], jnp.int32),
        )
        cfg_xla = tiny_encoder_config(attention_block_q=8, attention_block_k=8)
        enc_xla = MmtEncoder(cfg_xla, num_patch_per_row=P)
        params = enc_xla.init(jax.random.PRNGKey(0), **inputs)
        want = enc_xla.apply(params, **inputs)["sequence_output"]

        cfg_pl = tiny_encoder_config(
            attention_impl="pallas_interpret", attention_block_q=8,
            attention_block_k=8,
        )
        enc_pl = MmtEncoder(cfg_pl, num_patch_per_row=P)
        got = enc_pl.apply(params, **inputs)["sequence_output"]
        # Pad-position outputs are unspecified on the fused path (the
        # kernel skips pad x pad tiles; no consumer reads them), so
        # compare real positions only.
        m = (np.arange(S)[None, :]
             < np.asarray(inputs["lengths"])[:, None])[..., None]
        np.testing.assert_allclose(
            np.asarray(got) * m, np.asarray(want) * m, atol=3e-5, rtol=3e-5
        )

    def test_training_gradients_pallas_model(self):
        """Grads flow through the fused kernel in a full model."""
        rng = np.random.default_rng(1)
        S, P, B = 16, 2, 2
        inputs = dict(
            word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
            patch_embeddings=jnp.asarray(rng.normal(size=(B, 4, 12)), jnp.float32),
            lengths=jnp.full((B,), S, jnp.int32),
        )
        cfg = tiny_encoder_config(
            attention_impl="pallas_interpret", attention_block_q=8,
            attention_block_k=8,
        )
        enc = MmtEncoder(cfg, num_patch_per_row=2)
        params = enc.init(jax.random.PRNGKey(0), **inputs)

        def loss(p):
            out = enc.apply(p, **inputs, deterministic=True)["sequence_output"]
            return jnp.sum(out**2)

        grads = jax.grad(loss)(params)
        import flax

        flat = flax.traverse_util.flatten_dict(grads["params"])
        rel_key = (
            "transformer", "layer_0", "attention", "relative_emb_table",
        )
        assert float(jnp.sum(jnp.abs(flat[("encoder",) + rel_key] if ("encoder",) + rel_key in flat else flat[rel_key]))) > 0


class TestEncoderClsInjection:
    def test_custom_encoder_cls(self):
        # encoder_cls bypass (reference gin injection,
        # src/configs/encoders.py:112-158) through the ordinary config.
        from mmt_tpu.configs import ClsHeadConfig, ClassificationModelConfig
        from mmt_tpu.configs.encoder import EncoderConfig
        from mmt_tpu.models import MmtClassificationModel

        cfg = ClassificationModelConfig(
            encoder=EncoderConfig(
                mmt=tiny_encoder_config(),
                encoder_cls="tests.fixtures_encoder.TinyCustomEncoder",
            ),
            num_classes=2,
            cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
        )
        model = MmtClassificationModel(cfg, num_patch_per_row=2)
        inputs = dict(
            word_ids=jnp.zeros((2, 8), jnp.int32),
            patch_embeddings=jnp.ones((2, 4, 12), jnp.float32),
            lengths=jnp.full((2,), 8, jnp.int32),
        )
        params = model.init(jax.random.PRNGKey(0), **inputs)
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert any("patch_proj" in n for n in names)  # custom class used
        assert not any("transformer" in n for n in names)
        out = model.apply(params, **inputs)
        assert out["itm_logits"].shape == (2, 2)

    def test_bad_encoder_cls_raises(self):
        from mmt_tpu.configs.encoder import EncoderConfig, build_encoder

        cfg = EncoderConfig(encoder_cls="tests.fixtures_encoder.Missing")
        with pytest.raises(AttributeError):
            build_encoder(cfg, num_patch_per_row=2)
