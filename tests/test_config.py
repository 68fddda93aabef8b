import pytest

from indic_cl_asr_tpu.utils.config import (
    ConfigDict,
    load_config,
    override_config_with_args,
)


@pytest.fixture
def cfg_file(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        """
batch_size: 16
lr: 1.0e-4
mixed_precision: true
model:
  freeze_encoder_till: 12
cl_config:
  e_lambda: 10
  mas_ctx: 0.3
languages: [hindi, bengali]
"""
    )
    return str(p)


def test_load_and_attr_access(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.batch_size == 16
    assert cfg.model.freeze_encoder_till == 12
    assert cfg.cl_config.mas_ctx == 0.3
    assert cfg.languages == ["hindi", "bengali"]


def test_cli_overrides_with_type_coercion(cfg_file):
    cfg = load_config(cfg_file)
    cfg, ns = override_config_with_args(
        cfg,
        argv=[
            "--cl_config.e_lambda", "5",
            "--lr", "0.001",
            "--mixed_precision", "false",
            "--notes", "test run",
        ],
        extra_args={"notes": {"type": str, "default": ""}},
    )
    assert cfg.cl_config.e_lambda == 5 and isinstance(cfg.cl_config.e_lambda, int)
    assert cfg.lr == 0.001
    assert cfg.mixed_precision is False
    assert ns.notes == "test run"
    # untouched leaves keep YAML values
    assert cfg.batch_size == 16


def test_set_get_path_and_merge():
    cfg = ConfigDict({"a": {"b": 1}})
    cfg.set_path("a.c.d", 7)
    assert cfg.get_path("a.c.d") == 7
    assert cfg.get_path("a.missing", default=None) is None
    cfg.merge({"a": {"b": 2}, "e": 3})
    assert cfg.a.b == 2 and cfg.e == 3
    assert dict(cfg.to_dict()["a"])["c"] == {"d": 7}


def test_leaves_enumeration():
    cfg = ConfigDict({"a": {"b": 1, "c": {"d": 2}}, "e": "x"})
    assert dict(cfg.leaves()) == {"a.b": 1, "a.c.d": 2, "e": "x"}
