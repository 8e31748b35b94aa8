"""Gin-style bindings (utils/bindings.py): the analog of the
reference's --gin_file/--gin_params surface (src/train.py:39-48).  The
reference's only in-tree gin use binds build_encoder.encoder_cls
(src/configs/encoders.py:112-158); these tests pin that idiom plus the
generic literal / @reference / module-attribute forms.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.utils import bindings
from mmt_tpu.utils.bindings import (
    apply_bindings,
    clear_bindings,
    configurable,
    parse_bindings,
    resolve_reference,
)

from tests import fixtures_bindings


@pytest.fixture(autouse=True)
def _reset():
    yield
    clear_bindings()
    fixtures_bindings.TUNABLE = 1.0


class TestParsing:
    def test_literals(self):
        got = dict(parse_bindings([
            "a.x = 3e-4",
            "a.y = True   # trailing comment",
            "a.z = 'text'",
            "a.w = [1, 2, 3]",
            "a.n = None",
            "",
            "# full-line comment",
        ]))
        assert got == {"a.x": 3e-4, "a.y": True, "a.z": "text",
                       "a.w": [1, 2, 3], "a.n": None}

    def test_reference(self):
        (key, value), = parse_bindings(
            ["enc.cls = @tests.fixtures_encoder.TinyCustomEncoder"])
        from tests.fixtures_encoder import TinyCustomEncoder

        assert value is TinyCustomEncoder

    def test_reference_colon_style(self):
        assert resolve_reference(
            "tests.fixtures_encoder:TinyCustomEncoder").__name__ == (
                "TinyCustomEncoder")

    def test_bad_value(self):
        with pytest.raises(ValueError, match="unparseable"):
            parse_bindings(["a.x = not a literal"])

    def test_missing_equals(self):
        with pytest.raises(ValueError, match="without '='"):
            parse_bindings(["a.x"])

    def test_hash_inside_string_literal(self):
        # gin accepts '#' inside quoted strings; only a # outside
        # quotes starts a comment.
        got = dict(parse_bindings([
            'a.run = "run#1"  # this part IS a comment',
            "a.tag = 'x#y#z'",
        ]))
        assert got == {"a.run": "run#1", "a.tag": "x#y#z"}


class TestBinding:
    def test_module_attribute(self):
        apply_bindings(params=["tests.fixtures_bindings.TUNABLE = 2.5"])
        assert fixtures_bindings.TUNABLE == 2.5

    def test_unknown_module_attribute(self):
        with pytest.raises(AttributeError, match="no attribute"):
            apply_bindings(params=["tests.fixtures_bindings.NOPE = 1"])

    def test_unknown_target(self):
        with pytest.raises(ValueError, match="unknown binding target"):
            apply_bindings(params=["no_such_configurable.param = 1"])

    def test_configurable_param(self):
        @configurable(name="my_fn")
        def my_fn(a, b=10):
            return a + b

        assert my_fn(1) == 11
        apply_bindings(params=["my_fn.b = 100"])
        assert my_fn(1) == 101
        assert my_fn(1, b=5) == 6  # explicit arg beats the binding

    def test_configurable_unknown_param(self):
        @configurable(name="my_fn2")
        def my_fn2(a):
            return a

        with pytest.raises(ValueError, match="no parameter"):
            apply_bindings(params=["my_fn2.zzz = 1"])

    def test_file_then_params_order(self, tmp_path):
        p = tmp_path / "b.gin"
        p.write_text("tests.fixtures_bindings.TUNABLE = 3.0\n")
        apply_bindings(files=[str(p)],
                       params=["tests.fixtures_bindings.TUNABLE = 4.0"])
        assert fixtures_bindings.TUNABLE == 4.0  # later bindings win

    def test_clear_bindings_restores_module_attribute(self):
        apply_bindings(params=["tests.fixtures_bindings.TUNABLE = 9.0"])
        assert fixtures_bindings.TUNABLE == 9.0
        clear_bindings()
        assert fixtures_bindings.TUNABLE == 1.0

    def test_snapshot_replays_in_fresh_state(self):
        apply_bindings(params=["tests.fixtures_bindings.TUNABLE = 7.0"])
        snap = bindings.snapshot_bindings()
        clear_bindings()
        assert fixtures_bindings.TUNABLE == 1.0
        apply_bindings(params=snap)  # what a spawn worker does
        assert fixtures_bindings.TUNABLE == 7.0

    def test_transitive_import_error_propagates(self, tmp_path,
                                                monkeypatch):
        # A module that EXISTS but whose own import fails must surface
        # its real error, not a misleading shorter-prefix fallback.
        (tmp_path / "broken_mod.py").write_text(
            "import no_such_dependency_xyz\nX = 1\n")
        monkeypatch.syspath_prepend(str(tmp_path))
        with pytest.raises(ModuleNotFoundError,
                           match="no_such_dependency_xyz"):
            apply_bindings(params=["broken_mod.X = 2"])
        with pytest.raises(ModuleNotFoundError,
                           match="no_such_dependency_xyz"):
            resolve_reference("@broken_mod.X")


class TestBuildEncoderInjection:
    def test_gin_binding_injects_encoder_cls(self):
        """The reference's exact gin idiom:
        build_encoder.encoder_cls = @pkg.Encoder."""
        import jax

        from mmt_tpu.configs.encoder import (
            EncoderConfig, MmtEncoderConfig, build_encoder)

        apply_bindings(params=[
            "build_encoder.encoder_cls = "
            "@tests.fixtures_encoder.TinyCustomEncoder",
        ])
        cfg = EncoderConfig(mmt=MmtEncoderConfig(
            vocab_size=40, hidden_size=8, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=16,
            compute_dtype="float32",
        ))
        enc = build_encoder(cfg, num_patch_per_row=2)
        assert type(enc).__name__ == "TinyCustomEncoder"

    def test_fully_qualified_configurable_binding(self):
        """Gin's normal fully-qualified form —
        pkg.mod.build_encoder.encoder_cls — must bind the configurable
        parameter, not try to setattr on the wrapper function."""
        from mmt_tpu.configs.encoder import (
            EncoderConfig, MmtEncoderConfig, build_encoder)

        apply_bindings(params=[
            "mmt_tpu.configs.encoder.build_encoder.encoder_cls = "
            "@tests.fixtures_encoder.TinyCustomEncoder",
        ])
        cfg = EncoderConfig(mmt=MmtEncoderConfig(
            vocab_size=40, hidden_size=8, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=16,
            compute_dtype="float32",
        ))
        enc = build_encoder(cfg, num_patch_per_row=2)
        assert type(enc).__name__ == "TinyCustomEncoder"

    def test_unbound_build_encoder_unchanged(self):
        from mmt_tpu.configs.encoder import (
            EncoderConfig, MmtEncoderConfig, build_encoder)

        cfg = EncoderConfig(mmt=MmtEncoderConfig(
            vocab_size=40, hidden_size=8, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=16,
            compute_dtype="float32",
        ))
        enc = build_encoder(cfg, num_patch_per_row=2)
        assert type(enc).__name__ == "MmtEncoder"
