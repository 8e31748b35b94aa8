"""Config system tests: registry, strict overrides, shipped yaml ports."""

import glob
import os

import pytest

from mmt_tpu.configs import (
    get_experiment_config,
    MmtEncoderConfig,
)
from mmt_tpu.configs.base import from_yaml_file, override, parse_params_override

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestRegistry:
    def test_known_experiments(self):
        for name in ("mmt/pretraining", "mmt/classification", "mmt/retrieval"):
            cfg = get_experiment_config(name)
            assert cfg.trainer.optimizer_config.adamw.weight_decay_rate == 0.01

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_experiment_config("mmt/nope")

    def test_learning_rates_match_reference(self):
        # pretrain 1e-4, classification/retrieval 3e-5
        # (src/configs/pretraining_experiments.py:40, finetuning:47).
        assert get_experiment_config(
            "mmt/pretraining"
        ).trainer.optimizer_config.polynomial.initial_learning_rate == 1e-4
        assert get_experiment_config(
            "mmt/classification"
        ).trainer.optimizer_config.polynomial.initial_learning_rate == 3e-5


class TestOverrides:
    def test_strict_unknown_key(self):
        cfg = MmtEncoderConfig()
        with pytest.raises(KeyError):
            override(cfg, {"hidden_sizes": 12})

    def test_nested_and_string_override(self):
        cfg = get_experiment_config("mmt/pretraining")
        cfg = parse_params_override(
            cfg, "task.model.encoder.mmt.hidden_size=128,trainer.train_steps=7"
        )
        assert cfg.task.model.encoder.mmt.hidden_size == 128
        assert cfg.trainer.train_steps == 7

    def test_cls_heads_list_override(self):
        cfg = get_experiment_config("mmt/pretraining")
        cfg = override(
            cfg,
            {"task": {"model": {"cls_heads": [
                {"inner_dim": 768, "num_classes": 2, "name": "itm"}
            ]}}},
        )
        assert cfg.task.model.cls_heads[0].name == "itm"
        assert type(cfg.task.model.cls_heads[0]).__name__ == "ClsHeadConfig"


class TestShippedYamls:
    def test_all_ported_yamls_load_strict(self):
        yamls = glob.glob(os.path.join(REPO, "configs/exp_yamls/**/*.yaml"),
                          recursive=True)
        # 9 reference ports + the TPU-native long4k window config.
        assert len(yamls) == 10
        for path in yamls:
            exp = (
                "mmt/pretraining" if "/pretrain/" in path else "mmt/classification"
            )
            cfg = from_yaml_file(get_experiment_config(exp), path, strict=True)
            enc = cfg.task.model.encoder.mmt
            if "_2d" in os.path.basename(path):
                assert enc.relative_att_num_core_layers == 1
                assert enc.relative_vocab_size == 49
            else:
                assert enc.relative_vocab_size == 32
            assert cfg.task.model.cls_heads[0].name == "itm"
