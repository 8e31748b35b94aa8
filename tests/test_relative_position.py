"""Golden tests for relative attention IDs.

The expected matrices are transcribed from the reference's own unit test
(``/root/reference/src/feature_utils_test.py:49-110``) -- the conformance
anchor for the 2D relative-ID scheme.
"""

import numpy as np
import pytest

from mmt_tpu.features import MmtRelativePositionGenerator, RelativePositionGenerator


def test_init_derived_constants():
    gen = MmtRelativePositionGenerator(
        num_patch_per_row=2, num_core_layers=1, text_relative_pos_max_distance=3
    )
    assert gen.num_patch_per_row == 2
    assert gen.num_core_layers == 1
    assert gen.core_layer_diameter == 3
    assert gen.image_part_id == 19
    assert gen.text_part_id == 20


def test_init_invalid_arguments():
    with pytest.raises(ValueError):
        MmtRelativePositionGenerator(0, 1, 2)
    with pytest.raises(ValueError):
        MmtRelativePositionGenerator(1, 0, 2)
    with pytest.raises(ValueError):
        MmtRelativePositionGenerator(1, 1, -1)


def test_make_relative_att_ids_smaller_case():
    gen = MmtRelativePositionGenerator(
        num_patch_per_row=2, num_core_layers=1, text_relative_pos_max_distance=3
    )
    expected = [[
        [0, 1, 3, 4, 20, 20, 20],
        [8, 0, 2, 3, 20, 20, 20],
        [6, 7, 0, 1, 20, 20, 20],
        [5, 6, 8, 0, 20, 20, 20],
        [19, 19, 19, 19, 0, 1, 2],
        [19, 19, 19, 19, 4, 0, 1],
        [19, 19, 19, 19, 5, 4, 0],
    ]]
    np.testing.assert_array_equal(gen.make_relative_att_ids(7, 1), expected)


def test_make_relative_att_ids_larger_case():
    gen = MmtRelativePositionGenerator(
        num_patch_per_row=3, num_core_layers=2, text_relative_pos_max_distance=9
    )
    expected = [[
        [0, 1, 2, 5, 6, 7, 10, 11, 12, 37, 37, 37],
        [24, 0, 1, 4, 5, 6, 9, 10, 11, 37, 37, 37],
        [23, 24, 0, 3, 4, 5, 8, 9, 10, 37, 37, 37],
        [20, 21, 22, 0, 1, 2, 5, 6, 7, 37, 37, 37],
        [19, 20, 21, 24, 0, 1, 4, 5, 6, 37, 37, 37],
        [18, 19, 20, 23, 24, 0, 3, 4, 5, 37, 37, 37],
        [15, 16, 17, 20, 21, 22, 0, 1, 2, 37, 37, 37],
        [14, 15, 16, 19, 20, 21, 24, 0, 1, 37, 37, 37],
        [13, 14, 15, 18, 19, 20, 23, 24, 0, 37, 37, 37],
        [36, 36, 36, 36, 36, 36, 36, 36, 36, 0, 1, 2],
        [36, 36, 36, 36, 36, 36, 36, 36, 36, 10, 0, 1],
        [36, 36, 36, 36, 36, 36, 36, 36, 36, 11, 10, 0],
    ]]
    np.testing.assert_array_equal(gen.make_relative_att_ids(12, 1), expected)


def test_1d_generator_vocab_and_symmetry():
    gen = RelativePositionGenerator(12)
    assert gen.relative_vocab_size == 25
    ids = gen.make_relative_att_ids(40, batch_size=2)
    assert ids.shape == (2, 40, 40)
    # Diagonal is 0; distance k right -> k; distance k left -> 12 + k; clipped.
    assert ids[0, 5, 5] == 0
    assert ids[0, 5, 8] == 3
    assert ids[0, 8, 5] == 15
    assert ids[0, 0, 39] == 12
    assert ids[0, 39, 0] == 24


def test_direction_ids_production_geometry():
    # P=14, r=1 (shipped 2D config): fine window is 3x3, direction ids 9..16.
    gen = MmtRelativePositionGenerator(14, 1, 12)
    ids = gen.image_ids()
    assert ids.shape == (196, 196)

    def rc(i):
        return divmod(i, 14)

    # Patch (5,5) vs (5,6): one step right -> fine id (0*3+1) mod 9 = 1.
    assert ids[5 * 14 + 5, 5 * 14 + 6] == 1
    # One step down: (1*3+0) mod 9 = 3.
    assert ids[5 * 14 + 5, 6 * 14 + 5] == 3
    # Far right (dy=0, dx=5) -> direction 'right' = 9 + 2 = 11.
    assert ids[5 * 14 + 5, 5 * 14 + 10] == 11
    # Far top (dy=-5, dx=0) -> 'top' = 9.
    assert ids[5 * 14 + 5, 0 * 14 + 5] == 9
    # Far bottom-left (dy=5, dx=-5) -> 'bottom_left' = 9 + 5 = 14.
    assert ids[5 * 14 + 5, 10 * 14 + 0] == 14
    # image_part/text_part for the shipped config.
    assert gen.image_part_id == 196 + 8 + 25
    assert gen.text_part_id == 196 + 8 + 25 + 1


def _reference_base_tensor_algorithm(P, r, d_text):
    """Literal numpy transcription of the reference's base-tensor + crop
    algorithm (src/feature_utils.py:89-184), as an independent oracle."""
    d = 2 * r + 1
    n = P - r
    m = P + r + 1
    num_center = d * d
    center = np.roll(np.arange(num_center), d * r + r).reshape(d, d)
    base = np.pad(center, [(n, n), (n, n)])
    directions = [
        ((n, d), [(0, m), (n, n)]),   # top
        ((n, n), [(0, m), (m, 0)]),   # top_right
        ((d, n), [(n, n), (m, 0)]),   # right
        ((n, n), [(m, 0), (m, 0)]),   # right_bottom
        ((n, d), [(m, 0), (n, n)]),   # bottom
        ((n, n), [(m, 0), (0, m)]),   # bottom_left
        ((d, n), [(n, n), (0, m)]),   # left
        ((n, n), [(0, m), (0, m)]),   # top_left
    ]
    for idx, (fill, pads) in enumerate(directions, start=d * d):
        base = base + np.pad(np.full(fill, idx), pads)

    crops = []
    for x in range(P):
        for y in range(P):
            crops.append(base[P - x : 2 * P - x, P - y : 2 * P - y].reshape(-1))
    return np.stack(crops)


def test_closed_form_matches_reference_algorithm_sweep():
    """Closed-form 2D ids == the reference's own algorithm for many (P, r)."""
    for P, r in [(2, 1), (3, 1), (3, 2), (4, 1), (5, 2), (7, 3), (14, 1), (8, 4)]:
        if r >= P:
            continue
        gen = MmtRelativePositionGenerator(P, r, 5)
        got = gen.image_ids()
        want = _reference_base_tensor_algorithm(P, r, 5)
        np.testing.assert_array_equal(got, want, err_msg=f"P={P} r={r}")


# ---------------------------------------------------------------------------
# Live differential: execute the reference's own source.
# ---------------------------------------------------------------------------

_REFERENCE_SRC = "/root/reference/src/feature_utils.py"


def _load_reference_generator():
    """Exec the reference's ``MmtRelativePositionGenerator`` under the
    installed TensorFlow.

    The reference's single external dependency is
    ``etcmodel.feature_utils.RelativePositionGenerator`` (1D text ids;
    etcmodel is not installable here).  We inject OUR 1D generator --
    itself anchored by the reference repo's golden matrices above -- as
    that stub, so this differential isolates exactly the reference's 2D
    packing logic: base-tensor construction (roll/pad/8-direction fill),
    per-patch crop, text/image part-id padding, and the final concat
    (``/root/reference/src/feature_utils.py:89-184``).
    """
    import os
    import types

    import tensorflow as tf

    if not os.path.exists(_REFERENCE_SRC):
        pytest.skip("reference tree not present")
    src = open(_REFERENCE_SRC).read().replace(
        "from etcmodel import feature_utils as etc_feature_utils", ""
    )

    class _Stub1D:
        def __init__(self, max_distance):
            self._gen = RelativePositionGenerator(max_distance)

        def make_relative_att_ids(self, seq_len, batch_size):
            ids = self._gen.make_relative_att_ids(int(seq_len), int(batch_size))
            return tf.constant(ids, dtype=tf.int32)

    ns = {
        "etc_feature_utils": types.SimpleNamespace(
            RelativePositionGenerator=_Stub1D
        )
    }
    exec(compile(src, _REFERENCE_SRC, "exec"), ns)
    return ns["MmtRelativePositionGenerator"]


def test_live_differential_vs_reference_source():
    """Fuzz our generator against the reference's own executing code.

    100 random (num_patch_per_row, num_core_layers, text_max_distance,
    seq_len, batch_size) configurations -- far beyond the two transcribed
    goldens -- must match element-for-element.

    Reference quirk found by this fuzz: its image part is hard-coded to
    batch 1 (``expand_dims`` at feature_utils.py:172), so the reference
    CRASHES in tf.concat for batch_size > 1 -- upstream it is only ever
    called with batch_size=1 (src/input_utils.py).  We therefore compare
    at batch 1 and check our batch>1 output against the tiled reference.
    """
    ref_cls = _load_reference_generator()
    rng = np.random.default_rng(20260819)
    for trial in range(100):
        P = int(rng.integers(2, 8))
        r = int(rng.integers(1, P))  # r < P keeps the base-tensor pads valid
        t = int(rng.integers(0, 9))
        text_len = int(rng.integers(1, 40))
        seq_len = P * P + text_len
        batch = int(rng.integers(1, 3))

        ref = ref_cls(P, r, t).make_relative_att_ids(seq_len, 1).numpy()
        ours = MmtRelativePositionGenerator(P, r, t).make_relative_att_ids(
            seq_len, batch_size=batch
        )
        np.testing.assert_array_equal(
            ours, np.tile(ref, (batch, 1, 1)),
            err_msg=f"trial={trial} P={P} r={r} t={t} "
                    f"seq_len={seq_len} batch={batch}"
        )
