"""Native libjpeg-turbo decode vs PIL: byte-parity on RGB/gray JPEGs,
graceful fallback elsewhere (reference decode path:
src/data/data_utils.py:185-206 ran in TF's C++ runtime)."""

import io

import numpy as np
import pytest

from mmt_tpu.data import native

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not native.jpeg_available():
        pytest.skip("native jpeg decoder unavailable")


def _jpeg(arr, mode="RGB", quality=85, progressive=False):
    im = PIL.fromarray(arr, mode=mode)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=quality, progressive=progressive)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [30, 85, 100])
@pytest.mark.parametrize("size", [(32, 32), (224, 224), (61, 47)])
def test_rgb_parity(quality, size):
    rng = np.random.default_rng(hash((quality, size)) % 2**31)
    arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
    data = _jpeg(arr, quality=quality)
    got = native.decode_jpeg(data)
    want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_progressive_parity():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    data = _jpeg(arr, progressive=True)
    np.testing.assert_array_equal(
        native.decode_jpeg(data),
        np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")),
    )


def test_grayscale_parity():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    data = _jpeg(arr, mode="L")
    got = native.decode_jpeg(data)
    want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == want.shape
    # Gray->RGB expansion: libjpeg replicates the channel exactly.
    np.testing.assert_array_equal(got, want)


def test_png_returns_none():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="PNG")
    assert native.decode_jpeg(buf.getvalue()) is None


def test_truncated_returns_none():
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = _jpeg(arr)
    assert native.decode_jpeg(data[: len(data) // 2]) is None


def test_assembler_uses_native_path():
    # decode_image must produce identical floats through either path.
    from mmt_tpu.configs.data import MmtDataConfig
    from mmt_tpu.data.assembly import ExampleAssembler
    from mmt_tpu.text.wordpiece import BertTokenizer

    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[ATT]", "[REF]",
         "[PATCH]"] + [f"[unused{j}]" for j in range(99, 110)] + ["a"]
    )}
    asm = ExampleAssembler(
        MmtDataConfig(image_size=32, patch_size=16, max_seq_len=32),
        BertTokenizer(vocab),
    )
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = _jpeg(arr)
    got = asm.decode_image(data)
    want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"),
                      dtype=np.float32) / 255.0
    np.testing.assert_array_equal(got, want)
