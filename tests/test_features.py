"""Tests for attention-mask, patch, masking, and matching feature functions."""

import numpy as np
import jax.numpy as jnp

from mmt_tpu.features import (
    make_att_mask_from_length,
    make_segment_ids,
    make_segmented_att_mask,
    extract_patches,
    normalize_image,
    make_mpp_label_ids,
)
from mmt_tpu.features.masking import MaskingSpec, mask_items
from mmt_tpu.features.matching import make_matching_features


class TestAttMask:
    def test_segmented_mask(self):
        ids = np.array([[1, 1, 2, 2, 0]])
        m = make_segmented_att_mask(ids)
        expected = np.array(
            [
                [1, 1, 0, 0, 0],
                [1, 1, 0, 0, 0],
                [0, 0, 1, 1, 0],
                [0, 0, 1, 1, 0],
                [0, 0, 0, 0, 1],
            ]
        )
        np.testing.assert_array_equal(m[0], expected)

    def test_mask_from_length_matches_breakpoint_path(self):
        # Reference: one-hot breakpoint at L-1, reverse cumsum, segmented mask.
        S, L = 8, 5
        bp = np.zeros((1, S), np.int32)
        bp[0, L - 1] = 1
        rev_cumsum = np.flip(np.cumsum(np.flip(bp, -1), -1), -1)
        ref = make_segmented_att_mask(rev_cumsum)[0]
        ours = np.asarray(make_att_mask_from_length(S, L))
        np.testing.assert_array_equal(ours, ref)
        # Padding tokens attend among themselves (faithful quirk).
        assert ours[6, 7] == 1 and ours[6, 2] == 0

    def test_batched_mask(self):
        m = np.asarray(make_att_mask_from_length(6, np.array([3, 6])))
        assert m.shape == (2, 6, 6)
        assert m[0, 0, 2] == 1 and m[0, 0, 3] == 0
        assert m[1].min() == 1

    def test_segment_ids_quirk(self):
        # img_wp=3, txt_wp=2 in S=8: first text token (pos 3) gets id 0
        # (reference uses strict position > img_wp).
        seg = np.asarray(make_segment_ids(8, 3, 2))
        np.testing.assert_array_equal(seg, [1, 1, 1, 0, 2, 0, 0, 0])

    def test_segment_ids_batched(self):
        seg = np.asarray(make_segment_ids(6, np.array([2, 3]), np.array([3, 2])))
        np.testing.assert_array_equal(seg[0], [1, 1, 0, 2, 2, 0])
        np.testing.assert_array_equal(seg[1], [1, 1, 1, 0, 2, 0])


class TestPatches:
    def test_extract_patches_raster_order(self):
        # 4x4 image, patch 2 -> 4 patches; values encode position.
        im = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
        p = extract_patches(im, 2)
        assert p.shape == (4, 12)
        # First patch = rows 0:2, cols 0:2 flattened row-major with channels.
        expected0 = im[0:2, 0:2, :].reshape(-1)
        np.testing.assert_array_equal(p[0], expected0)
        # Patch order: (0,0), (0,1), (1,0), (1,1).
        expected2 = im[2:4, 0:2, :].reshape(-1)
        np.testing.assert_array_equal(p[2], expected2)

    def test_extract_patches_batched_jnp(self):
        im = jnp.ones((2, 224, 224, 3), jnp.float32)
        p = extract_patches(im, 16)
        assert p.shape == (2, 196, 768)

    def test_normalize_by_mean_quirk(self):
        im = np.full((2, 2, 3), 0.5, np.float32)
        out = normalize_image(im)
        expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.485, 0.456, 0.406]
        )
        np.testing.assert_allclose(out[0, 0], expected, rtol=1e-6)

    def test_mpp_label_ids(self):
        # Patch with constant pixel value v in [0,1]: bucket = floor stuff via
        # boundaries <= v*255; all three channels equal -> label = b*(1+8+64).
        patch_size = 2
        v = 100.0 / 255.0  # -> 100; boundaries 32,64,96 <= 100 -> bucket 3
        patches = np.full((1, patch_size**2 * 3), v, np.float32)
        labels = make_mpp_label_ids(patches, patch_size)
        assert labels.shape == (1,)
        assert labels[0] == 3 * (1 + 8 + 64)

    def test_mpp_label_boundary_semantics(self):
        # Exactly 32 -> bucket 1 (tf Bucketize lower-inclusive boundary).
        patch_size = 1
        v = 32.0 / 255.0
        patches = np.zeros((1, 3), np.float32)
        patches[0, 0] = v  # channel 0 only
        labels = make_mpp_label_ids(patches, patch_size)
        assert labels[0] == 1  # bucket 1 * 8**0

    def test_mpp_labels_match_reference_tf(self):
        # Cross-check against the exact TF ops the reference uses.
        tf = __import__("tensorflow")
        rng = np.random.default_rng(0)
        patches = rng.random((7, 768)).astype(np.float32)

        x = tf.constant(patches) * 255.0
        x = tf.reshape(x, [7, 256, 3])
        avg = tf.reduce_mean(x, axis=1)
        bins = list(range(32, 256, 32))
        disc = tf.raw_ops.Bucketize(input=avg, boundaries=[float(b) for b in bins])
        disc = tf.cast(disc, tf.int32)
        base = tf.expand_dims(8 ** tf.range(0, 3), 0)
        ref = tf.reduce_sum(base * disc, axis=1).numpy()

        ours = make_mpp_label_ids(patches, 16)
        np.testing.assert_array_equal(ours, ref)


class TestMasking:
    def test_masking_deterministic_skeleton(self):
        rng = np.random.default_rng(42)
        spec = MaskingSpec(
            vocab_size=100, mask_token_id=3, selection_rate=0.5, max_selections=4
        )
        words = [np.array([10, 11]), np.array([12]), np.array([13, 14, 15]), np.array([16])]
        res = mask_items(words, spec, rng)
        # ceil(0.5 * 4) = 2 words selected.
        sel_words = set()
        flat = np.concatenate(words)
        for pos, lab in zip(res.positions, res.label_ids):
            assert flat[pos] == lab
        assert len(res.positions) >= 2  # at least 2 wordpieces (>=1 per word)
        assert res.token_ids.shape == flat.shape

    def test_mask_rate_one_masks_everything(self):
        rng = np.random.default_rng(0)
        spec = MaskingSpec(
            vocab_size=100, mask_token_id=3, selection_rate=1.0,
            max_selections=100, mask_prob=1.0, random_prob=0.0,
        )
        items = [np.array([i]) for i in range(10, 20)]
        res = mask_items(items, spec, rng)
        assert np.all(res.token_ids == 3)
        np.testing.assert_array_equal(np.sort(res.positions), np.arange(10))
        np.testing.assert_array_equal(res.label_weights, np.ones(10))

    def test_unselectable(self):
        rng = np.random.default_rng(0)
        spec = MaskingSpec(
            vocab_size=100, mask_token_id=3, selection_rate=1.0,
            max_selections=100, mask_prob=1.0, random_prob=0.0,
        )
        items = [np.array([7]), np.array([10]), np.array([8])]
        res = mask_items(items, spec, rng, selectable=np.array([False, True, False]))
        assert res.token_ids[0] == 7 and res.token_ids[2] == 8
        assert res.token_ids[1] == 3

    def test_label_weights_undercount_quirk(self):
        # With mask_prob=0 (all selections keep/random), weights are all 0 --
        # faithfully reproducing the reference's literal-[MASK] counting.
        rng = np.random.default_rng(0)
        spec = MaskingSpec(
            vocab_size=100, mask_token_id=3, selection_rate=1.0,
            max_selections=100, mask_prob=0.0, random_prob=0.0,
        )
        items = [np.array([11]), np.array([12])]
        res = mask_items(items, spec, rng)
        np.testing.assert_array_equal(res.label_weights, np.zeros(2))


class TestMatching:
    def _features(self, b):
        return {
            "patch_token_ids": np.arange(b * 3).reshape(b, 3),
            "patch_embeddings": np.arange(b * 4).reshape(b, 2, 2).astype(np.float32),
            "num_image_wordpieces": np.full((b,), 3),
            "text_token_ids": 100 + np.arange(b * 2).reshape(b, 2),
            "num_text_wordpieces": np.full((b,), 2),
        }

    def test_matching_shapes_and_labels(self):
        b, ratio, min_shift = 8, 1, 2
        keys = [f"img{i}" for i in range(b)]
        out = make_matching_features(self._features(b), keys, ratio, min_shift)
        assert out["patch_token_ids"].shape == (16, 3)
        np.testing.assert_array_equal(out["itm_label_ids"][:8], np.ones(8))
        np.testing.assert_array_equal(out["itm_label_ids"][8:], np.zeros(8))
        # Copy 1 text is rolled by min_shift+1=3.
        np.testing.assert_array_equal(
            out["text_token_ids"][8:], np.roll(self._features(b)["text_token_ids"], 3, axis=0)
        )
        # Images tile, texts permute -> negative pairs mismatch.
        np.testing.assert_array_equal(
            out["patch_embeddings"][8:], self._features(b)["patch_embeddings"]
        )

    def test_pos_weights(self):
        b, ratio = 12, 3
        keys = list(range(b))
        out = make_matching_features(self._features(b), keys, ratio, 5)
        np.testing.assert_array_equal(out["itm_pos_weights"][:b], np.full(b, 3.0))
        np.testing.assert_array_equal(out["itm_pos_weights"][b:], np.ones(b * ratio))

    def test_duplicate_keys_sorted_adjacent(self):
        b = 8
        keys = ["a", "b", "a", "c", "b", "d", "e", "f"]
        feats = self._features(b)
        out = make_matching_features(feats, keys, 1, 2)
        # First-occurrence ids: a=0,b=1,a=0,c=2,b=1,... stable argsort puts
        # duplicates adjacent: order [0,2,1,4,3,5,6,7].
        np.testing.assert_array_equal(
            out["text_token_ids"][:b], feats["text_token_ids"][[0, 2, 1, 4, 3, 5, 6, 7]]
        )

    def test_asserts(self):
        import pytest

        with pytest.raises(ValueError):
            make_matching_features(self._features(4), list(range(4)), 1, 5)


class TestLiveDifferentialSideInputs:
    """Execute the reference's own side-input builder and fuzz against ours.

    ``get_add_side_input_features_fn`` (/root/reference/src/data/
    data_utils.py:285-381) derives ``segment_ids``, ``att_mask`` and
    ``relative_att_ids`` from (num_image_wordpieces, num_text_wordpieces)
    — the host-side composition our framework re-derives on device.  The
    whole reference module cannot be imported (tf_text / TFM / etcmodel
    are not installable), so the two relevant defs are extracted by AST
    and exec'd under the installed TF with minimal stubs:

    * ``etc_feature_utils.make_segmented_att_mask`` — the etcmodel
      one-liner per its spec (attend iff same example id); the value of
      this differential is the composition AROUND it (the reverse-cumsum
      breakpoint encoding, the one_hot(seq_len-1), the squeeze/quirks),
      which is the reference's own executing code.
    * ``etc_feature_utils.RelativePositionGenerator`` — our 1D generator
      (golden-anchored elsewhere).
    * ``feature_utils`` — the reference's own module, exec'd the same way
      as in test_relative_position.py.
    * ``tf_utils.get_shape_list`` — static shape list.

    This pins, against running reference code: the segment-id boundary
    off-by-one quirk (position == num_image_wordpieces gets segment 0),
    the padding-attends-padding att_mask quirk, and the relative-id
    plumbing (squeeze to unbatched).
    """

    REF_ROOT = "/root/reference/src"

    def _load(self):
        import ast
        import os
        import types

        import tensorflow as tf

        if not os.path.exists(self.REF_ROOT):
            import pytest
            pytest.skip("reference tree not present")

        from mmt_tpu.features.relative_position import (
            RelativePositionGenerator as Ours1D,
        )

        class _Stub1D:
            def __init__(self, max_distance):
                self._gen = Ours1D(max_distance)

            def make_relative_att_ids(self, seq_len, batch_size):
                return tf.constant(
                    self._gen.make_relative_att_ids(int(seq_len), int(batch_size)),
                    dtype=tf.int32,
                )

        def _segmented_att_mask(example_ids):
            return tf.cast(
                example_ids[:, :, None] == example_ids[:, None, :], tf.int32
            )

        etc_stub = types.SimpleNamespace(
            RelativePositionGenerator=_Stub1D,
            make_segmented_att_mask=_segmented_att_mask,
        )
        tf_utils_stub = types.SimpleNamespace(
            get_shape_list=lambda t: [int(d) for d in t.shape]
        )

        # The reference's feature_utils module, exec'd whole.
        fu_src = open(f"{self.REF_ROOT}/feature_utils.py").read().replace(
            "from etcmodel import feature_utils as etc_feature_utils", ""
        )
        fu_ns = {"etc_feature_utils": etc_stub}
        exec(compile(fu_src, f"{self.REF_ROOT}/feature_utils.py", "exec"), fu_ns)
        feature_utils_stub = types.SimpleNamespace(
            MmtRelativePositionGenerator=fu_ns["MmtRelativePositionGenerator"]
        )

        # Extract only the two needed defs from data_utils by AST.
        du_path = f"{self.REF_ROOT}/data/data_utils.py"
        du_src = open(du_path).read()
        tree = ast.parse(du_src)
        wanted = {"RelativeTransformerSideInputs",
                  "get_add_side_input_features_fn"}
        lines = du_src.splitlines()
        segments = []
        for node in tree.body:
            if getattr(node, "name", None) not in wanted:
                continue
            # get_source_segment drops decorators (@attr.s); slice by line
            # range from the first decorator through end_lineno instead.
            start = min([d.lineno for d in node.decorator_list]
                        + [node.lineno])
            segments.append("\n".join(lines[start - 1:node.end_lineno]))
        assert len(segments) == 2, "reference layout changed"

        import attr
        from typing import List, Mapping, Optional

        ns = {
            "tf": tf,
            "attr": attr,
            "List": List,
            "Mapping": Mapping,
            "Optional": Optional,
            "etc_feature_utils": etc_stub,
            "tf_utils": tf_utils_stub,
            "feature_utils": feature_utils_stub,
            "configs": types.SimpleNamespace(MmtDataConfig=object),
        }
        exec(compile("\n\n".join(segments), du_path, "exec"), ns)
        return ns["get_add_side_input_features_fn"]

    def test_fuzz_vs_reference_source(self):
        import types

        import pytest

        tf = pytest.importorskip("tensorflow")
        get_fn = self._load()

        from mmt_tpu.features import MmtRelativePositionGenerator as OursGen

        rng = np.random.default_rng(20260820)
        for trial in range(25):
            P = int(rng.integers(2, 5))
            num_patches = P * P
            r = int(rng.integers(1, P))
            t = int(rng.integers(1, 6))
            max_seq_len = num_patches + 2 + int(rng.integers(4, 24))
            # img part = [CLS] [PATCH] + patches (how the pipeline counts)
            img_wp = num_patches + 2
            txt_wp = int(rng.integers(1, max_seq_len - img_wp + 1))

            cfg = types.SimpleNamespace(
                image_size=P * 16, patch_size=16, max_seq_len=max_seq_len
            )
            add_fn = get_fn(cfg, relative_pos_max_distance=t,
                            relative_att_num_core_layers=r)
            feats = add_fn({
                "num_image_wordpieces": tf.constant(img_wp, tf.int32),
                "num_text_wordpieces": tf.constant(txt_wp, tf.int32),
            })

            err = (f"trial={trial} P={P} r={r} t={t} "
                   f"S={max_seq_len} img={img_wp} txt={txt_wp}")
            np.testing.assert_array_equal(
                np.asarray(make_segment_ids(max_seq_len, img_wp, txt_wp)),
                feats["segment_ids"].numpy(), err_msg=err)
            np.testing.assert_array_equal(
                np.asarray(make_att_mask_from_length(
                    max_seq_len, img_wp + txt_wp)),
                feats["att_mask"].numpy(), err_msg=err)
            ours_rel = OursGen(P, r, t).make_relative_att_ids(
                max_seq_len, batch_size=1)[0]
            np.testing.assert_array_equal(
                ours_rel, feats["relative_att_ids"].numpy(), err_msg=err)


class TestLiveDifferentialMatching:
    """Execute the reference's ITM in-batch negative mining and fuzz ours.

    ``get_matching_fn`` (/root/reference/src/data/data_utils.py:642-712)
    is pure TF — AST-extracted and exec'd under the installed TF, no
    stubs.  Fuzzes the sort-by-image-key grouping, the (ratio+1)-way
    tile, the rolled text permutations, and the ITM label/weight
    construction against ``mmt_tpu.features.matching``.  Features are
    the exact key set the reference pipeline carries at this stage.
    """

    def _load(self):
        import ast
        import os

        import tensorflow as tf

        du_path = "/root/reference/src/data/data_utils.py"
        if not os.path.exists(du_path):
            import pytest
            pytest.skip("reference tree not present")
        src = open(du_path).read()
        lines = src.splitlines()
        seg = None
        for node in ast.parse(src).body:
            if getattr(node, "name", None) == "get_matching_fn":
                seg = "\n".join(lines[node.lineno - 1:node.end_lineno])
        assert seg, "reference layout changed"
        ns = {"tf": tf}
        exec(compile(seg, du_path, "exec"), ns)
        return ns["get_matching_fn"]

    def test_fuzz_vs_reference_source(self):
        import types

        import pytest

        tf = pytest.importorskip("tensorflow")
        get_fn = self._load()

        rng = np.random.default_rng(20260821)
        for trial in range(20):
            B = int(rng.integers(8, 17))
            ratio = int(rng.integers(1, 3))
            hi = B - ratio - 2  # keep the reference's batch-size assert true
            min_shift = int(rng.integers(1, max(2, hi + 1)))
            min_shift = min(min_shift, hi)
            T, Np, M = 6, 4, 3
            # duplicate keys exercise the unique/argsort grouping
            keys = [f"img{int(rng.integers(0, B))}" for _ in range(B)]
            feats = {
                "text_token_ids":
                    rng.integers(0, 100, (B, T)).astype(np.int32),
                "num_text_wordpieces":
                    rng.integers(1, T + 1, (B,)).astype(np.int32),
                "patch_token_ids":
                    rng.integers(100, 120, (B, Np)).astype(np.int32),
                "patch_embeddings":
                    rng.normal(size=(B, Np, 8)).astype(np.float32),
                "num_image_wordpieces": np.full((B,), Np, np.int32),
                "mlm_positions": rng.integers(0, T, (B, M)).astype(np.int32),
                "mlm_label_ids":
                    rng.integers(0, 100, (B, M)).astype(np.int32),
                "mlm_label_weights": np.ones((B, M), np.float32),
            }
            cfg = types.SimpleNamespace(image_key_field="image_key")
            tf_feats = {k: tf.constant(v) for k, v in feats.items()}
            tf_feats["image_key"] = tf.constant(keys)
            ref = get_fn(cfg, B, ratio, min_shift)(tf_feats)
            ours = make_matching_features(dict(feats), keys, ratio, min_shift)

            err = f"trial={trial} B={B} ratio={ratio} shift={min_shift}"
            assert set(ours) == set(ref), err
            for k in ours:
                np.testing.assert_array_equal(
                    ours[k], ref[k].numpy(), err_msg=f"{err} key={k}")
