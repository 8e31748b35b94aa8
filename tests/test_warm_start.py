"""Warm starts: from-ViT and etcmodel-shaped TF checkpoints.

Covers the reference's ``*_from_vit`` experiments
(src/exp_yamls/pretrain/wit/mlm_itm_from_vit.yaml; restore mechanism
src/tasks/pretraining.py:341-351) and the converter rules for
etcmodel-internals object checkpoints (src/prediction_helper.py:190-195).
"""

import json
import os

import numpy as np
import pytest
import yaml

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from tests.test_data_pipeline import data_kwargs, make_vocab, write_records

HIDDEN, LAYERS, HEADS, INTER = 32, 2, 2, 64
REL_VOCAB, PATCH = 12, 16


def _tiny_model(max_abs_pos=0):
    from mmt_tpu.configs import ClsHeadConfig, MmtEncoderConfig, PretrainModelConfig
    from mmt_tpu.configs.encoder import EncoderConfig
    from mmt_tpu.models.pretraining_model import MmtPretrainingModel

    enc = MmtEncoderConfig(
        vocab_size=40, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        relative_pos_max_distance=3, relative_vocab_size=REL_VOCAB,
        relative_att_num_core_layers=1, compute_dtype="float32",
        max_absolute_position_embeddings=max_abs_pos,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = MmtPretrainingModel(
        PretrainModelConfig(
            encoder=EncoderConfig(mmt=enc),
            cls_heads=[ClsHeadConfig(inner_dim=HIDDEN, num_classes=2, name="itm")],
        ),
        num_patch_per_row=2,
    )
    B, S, N = 2, 12, 4
    inputs = dict(
        word_ids=jnp.zeros((B, S), jnp.int32),
        segment_ids=jnp.ones((B, S), jnp.int32),
        patch_embeddings=jnp.asarray(
            np.random.default_rng(0).normal(size=(B, N, 768)), jnp.float32),
        lengths=jnp.full((B,), S, jnp.int32),
        mlm_positions=jnp.zeros((B, 2), jnp.int32),
        mpp_positions=jnp.zeros((B, 2), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **inputs, deterministic=True)
    return model, params, inputs


def _var_module(**arrays):
    m = tf.Module()
    for name, arr in arrays.items():
        setattr(m, name, tf.Variable(np.asarray(arr, np.float32), name=name))
    return m


def _save_ckpt(tmp_path, root, name):
    ckpt = tf.train.Checkpoint(model=root)
    return ckpt.write(str(tmp_path / name))


class TestVitWarmStart:
    def _vit_ckpt(self, tmp_path, src_grid=4, conv=True):
        """Image-only MMT-layout ViT: 2 special rows + src_grid^2 grid."""
        rng = np.random.default_rng(1)
        root = tf.Module()
        enc = tf.Module()
        root.encoder = enc
        kernel = rng.normal(size=(PATCH, PATCH, 3, HIDDEN)) if conv else \
            rng.normal(size=(PATCH * PATCH * 3, HIDDEN))
        enc.patch_embedding_projection = _var_module(
            kernel=kernel, bias=rng.normal(size=(HIDDEN,)))
        enc.position_embedding_layer = _var_module(
            embeddings=rng.normal(size=(2 + src_grid * src_grid, HIDDEN)))
        enc.embedding_norm_layer = _var_module(
            gamma=rng.normal(size=(HIDDEN,)), beta=rng.normal(size=(HIDDEN,)))
        tr = tf.Module()
        enc.transformer = tr
        for i in range(LAYERS):
            layer = tf.Module()
            setattr(tr, f"layer_{i}", layer)
            att = tf.Module()
            layer.attention = att
            for nm in ("query", "key", "value", "output"):
                setattr(att, nm, _var_module(
                    kernel=rng.normal(size=(HIDDEN, HIDDEN)),
                    bias=rng.normal(size=(HIDDEN,))))
            layer.attention_layer_norm = _var_module(
                scale=rng.normal(size=(HIDDEN,)), bias=rng.normal(size=(HIDDEN,)))
            layer.ffn_layer_norm = _var_module(
                scale=rng.normal(size=(HIDDEN,)), bias=rng.normal(size=(HIDDEN,)))
            layer.intermediate = _var_module(
                kernel=rng.normal(size=(HIDDEN, INTER)),
                bias=rng.normal(size=(INTER,)))
            layer.ffn_output = _var_module(
                kernel=rng.normal(size=(INTER, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
        return _save_ckpt(tmp_path, root, "vit"), rng

    def test_full_image_coverage_and_interpolation(self, tmp_path):
        import flax

        from mmt_tpu.train.tf_checkpoint import load_tf_checkpoint
        from mmt_tpu.train.vit_checkpoint import (
            convert_vit_checkpoint,
            interpolate_position_embeddings,
        )

        path, _ = self._vit_ckpt(tmp_path, src_grid=8)
        _, params, _ = _tiny_model(max_abs_pos=2 + 16)  # target grid 4x4
        tf_vars = load_tf_checkpoint(path)
        out = convert_vit_checkpoint(tf_vars, params)

        flat_src = flax.traverse_util.flatten_dict(params["params"])
        flat_out = flax.traverse_util.flatten_dict(out["params"])
        for p, v in flat_out.items():
            path_str = "/".join(p)
            text_only = (
                "word_embeddings" in path_str or "segment_embeddings" in path_str
                or p[-1] == "relative_emb_table" or p[0] != "encoder"
            )
            if text_only:
                assert v is flat_src[p], f"{path_str} should stay fresh"
            else:
                assert not np.array_equal(
                    np.asarray(v), np.asarray(flat_src[p])
                ), f"{path_str} should be restored"

        # Conv kernel flattened in [py, px, c] raster order.
        want_kernel = tf_vars[
            "encoder/patch_embedding_projection/kernel"
        ].reshape(-1, HIDDEN)
        np.testing.assert_array_equal(
            flat_out[("encoder", "patch_embedding_projection", "kernel")],
            want_kernel,
        )
        # Position table: specials copied, 4x4 grid resized to 2x2.
        src_table = tf_vars["encoder/position_embedding_layer/embeddings"]
        want_pos = interpolate_position_embeddings(src_table, 2 + 16)
        got_pos = flat_out[("encoder", "absolute_position_embeddings")]
        np.testing.assert_allclose(got_pos, want_pos, rtol=1e-6)
        np.testing.assert_array_equal(got_pos[:2], src_table[:2])
        # Bilinear identity check: constant grid stays constant.
        const = np.concatenate(
            [np.arange(2 * HIDDEN).reshape(2, HIDDEN),
             np.full((16, HIDDEN), 7.0)]).astype(np.float32)
        np.testing.assert_allclose(
            interpolate_position_embeddings(const, 2 + 9)[2:], 7.0)

    def test_missing_block_raises(self, tmp_path):
        from mmt_tpu.train.tf_checkpoint import load_tf_checkpoint
        from mmt_tpu.train.vit_checkpoint import convert_vit_checkpoint

        path, _ = self._vit_ckpt(tmp_path, src_grid=4)
        _, params, _ = _tiny_model(max_abs_pos=2 + 16)
        tf_vars = load_tf_checkpoint(path)
        dropped = {k: v for k, v in tf_vars.items()
                   if "layer_1/intermediate" not in k}
        with pytest.raises(ValueError, match="unmatched"):
            convert_vit_checkpoint(dropped, params)


class TestEtcmodelShapedConversion:
    def _etc_ckpt(self, tmp_path):
        """Object checkpoint with etcmodel-internals naming: sublayer
        lists (numeric children), {query,key,value,output}_projection,
        relative_emb_table, per-layer norm lists."""
        rng = np.random.default_rng(2)
        root = tf.Module()
        enc = tf.Module()
        root.encoder = enc
        enc.word_embedding_layer = _var_module(
            embedding_table=rng.normal(size=(40, HIDDEN)))
        enc.segment_embedding_layer = _var_module(
            embedding_table=rng.normal(size=(16, HIDDEN)))
        enc.patch_embedding_projection = _var_module(
            kernel=rng.normal(size=(768, HIDDEN)), bias=rng.normal(size=(HIDDEN,)))
        enc.embedding_norm_layer = _var_module(
            gamma=rng.normal(size=(HIDDEN,)), beta=rng.normal(size=(HIDDEN,)))
        tl = tf.Module()
        enc.transformer_layers = tl
        tl.attention_layers = []
        tl.attention_norm_layers = []
        tl.feed_forward_layers = []
        tl.feed_forward_norm_layers = []
        for _ in range(LAYERS):
            att = tf.Module()
            att.query_projection = _var_module(
                kernel=rng.normal(size=(HIDDEN, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
            att.key_projection = _var_module(
                kernel=rng.normal(size=(HIDDEN, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
            att.value_projection = _var_module(
                kernel=rng.normal(size=(HIDDEN, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
            att.output_projection = _var_module(
                kernel=rng.normal(size=(HIDDEN, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
            att.relative_emb_table = tf.Variable(
                rng.normal(size=(REL_VOCAB, HEADS, HIDDEN // HEADS)).astype(
                    np.float32))
            tl.attention_layers.append(att)
            tl.attention_norm_layers.append(_var_module(
                gamma=rng.normal(size=(HIDDEN,)), beta=rng.normal(size=(HIDDEN,))))
            ffn = tf.Module()
            ffn.intermediate = _var_module(
                kernel=rng.normal(size=(HIDDEN, INTER)),
                bias=rng.normal(size=(INTER,)))
            ffn.output = _var_module(
                kernel=rng.normal(size=(INTER, HIDDEN)),
                bias=rng.normal(size=(HIDDEN,)))
            tl.feed_forward_layers.append(ffn)
            tl.feed_forward_norm_layers.append(_var_module(
                gamma=rng.normal(size=(HIDDEN,)), beta=rng.normal(size=(HIDDEN,))))
        # Heads (pretraining model surface).
        mlm = tf.Module()
        root.masked_lm = mlm
        return _save_ckpt(tmp_path, root, "etc")

    def test_strict_zero_unmatched_encoder(self, tmp_path):
        import flax

        from mmt_tpu.train.tf_checkpoint import (
            convert_tf_checkpoint,
            load_tf_checkpoint,
        )

        path = self._etc_ckpt(tmp_path)
        model, params, inputs = _tiny_model()
        tf_vars = load_tf_checkpoint(path)

        # Encoder-only strictness: convert against the encoder subtree.
        enc_params = {"params": {"encoder": params["params"]["encoder"]}}
        out = convert_tf_checkpoint(tf_vars, enc_params, strict=True)

        # Every encoder param replaced, and q/k/v kernels land with the
        # correct [H, H] -> [H, heads, head_dim] row-major reshape.
        flat = flax.traverse_util.flatten_dict(out["params"])
        q0 = tf_vars["encoder/transformer_layers/attention_layers/0/"
                     "query_projection/kernel"]
        np.testing.assert_array_equal(
            flat[("encoder", "transformer", "layer_0", "attention", "query",
                  "kernel")],
            q0.reshape(HIDDEN, HEADS, HIDDEN // HEADS),
        )
        np.testing.assert_array_equal(
            flat[("encoder", "transformer", "layer_1", "ffn_layer_norm",
                  "scale")],
            tf_vars["encoder/transformer_layers/feed_forward_norm_layers/1/"
                    "gamma"],
        )

        # Logit check: the converted encoder produces the same outputs as
        # manually assigning the ground-truth mapping (here: identical
        # trees), and differs from the fresh init.
        merged = {"params": dict(params["params"])}
        merged["params"]["encoder"] = out["params"]["encoder"]
        fresh = model.apply(params, **inputs, deterministic=True)
        conv = model.apply(merged, **inputs, deterministic=True)
        assert not np.allclose(
            np.asarray(fresh["itm_logits"]), np.asarray(conv["itm_logits"])
        )
        assert np.all(np.isfinite(np.asarray(conv["itm_logits"])))


class TestFromVitYamlTrainSmoke:
    @pytest.mark.parametrize("yaml_rel", [
        "pretrain/wit/mlm_itm_from_vit.yaml",
        "pretrain/wit/mlm_itm_2d_from_vit.yaml",
    ])
    def test_train_smoke(self, tmp_path, yaml_rel):
        """The shipped *_from_vit experiments run end-to-end from a
        synthetic TF ViT checkpoint (tiny geometry override)."""
        from mmt_tpu.cli.train import main

        vit_path, _ = TestVitWarmStart()._vit_ckpt(tmp_path, src_grid=4)
        rng = np.random.default_rng(3)
        vocab = make_vocab(tmp_path)
        records = write_records(str(tmp_path / "t.tfrecord"), 20, rng)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg_file = os.path.join(repo, "configs", "exp_yamls", yaml_rel)
        is_2d = "2d" in yaml_rel
        override = yaml.safe_dump({
            "task": {
                "init_checkpoint": vit_path,
                "model": {"encoder": {"mmt": {
                    "vocab_size": 40, "hidden_size": HIDDEN,
                    "num_hidden_layers": LAYERS,
                    "num_attention_heads": HEADS,
                    "intermediate_size": INTER,
                    "relative_pos_max_distance": 3,
                    "relative_vocab_size": 12 if is_2d else 10,
                    "compute_dtype": "float32",
                    "attention_impl": "xla",
                    "max_absolute_position_embeddings": 38,  # 2 + 6x6 grid, >= S
                    "hidden_dropout_prob": 0.0,
                    "attention_probs_dropout_prob": 0.0,
                }},
                    "cls_heads": [
                        {"inner_dim": HIDDEN, "num_classes": 2, "name": "itm"}
                    ]},
                "train_data": {
                    "vocab_filename": vocab, "input_path": records,
                    "image_size": 32, "patch_size": 16, "max_seq_len": 32,
                    "min_shift": 2, "global_batch_size": 16,
                    "shuffle_buffer_size": 16,
                    "mlm_max_selections_per_seq": 8,
                    "mpp_max_selections_per_seq": 4,
                    "min_text_wordpieces": 3, "use_rand_aug": False,
                },
            },
            "trainer": {
                "train_steps": 2, "steps_per_loop": 1, "summary_interval": 1,
                "checkpoint_interval": 2, "validation_interval": 100,
                "micro_batch_size": 4,
            },
        })
        model_dir = str(tmp_path / f"model_{is_2d}")
        main([
            "--experiment=mmt/pretraining",
            "--mode=train",
            f"--model_dir={model_dir}",
            f"--config_file={cfg_file}",
            f"--params_override={override}",
        ])
        with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        assert np.isfinite(rows[-1]["total_loss"]) and rows[-1]["total_loss"] > 0
