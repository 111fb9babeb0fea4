"""Config system tests: defaults, YAML merge, overrides, freeze, RUN_ID."""

import pytest

from clip_lite_tpu.config import Config, ConfigNode

# Always-run smoke gate: pure math, single device, no mesh (pytest -m smoke).
pytestmark = pytest.mark.smoke



def test_defaults():
    c = Config()
    assert c.OPTIM.BATCH_SIZE == 256
    assert c.MODEL.VISUAL.NETWORK_NAME == "resnet50"
    assert c.DATA.MAX_CAPTION_LENGTH == 30
    assert c.OPTIM.LOOKAHEAD.USE is True


def test_override_list():
    c = Config(override_list=["OPTIM.BATCH_SIZE", 1024, "OPTIM.LR", 0.01])
    assert c.OPTIM.BATCH_SIZE == 1024
    assert c.OPTIM.LR == 0.01


def test_override_string_values_parsed():
    c = Config(override_list=["OPTIM.BATCH_SIZE", "512", "AMP", "false"])
    assert c.OPTIM.BATCH_SIZE == 512
    assert c.AMP is False


def test_yaml_merge(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        "OPTIM:\n  BATCH_SIZE: 512\n  LR: 0.01\nMODEL:\n  VISUAL:\n"
        "    NETWORK_NAME: resnet18\n    FEATURE_SIZE: 512\n"
    )
    c = Config(str(p), ["OPTIM.BATCH_SIZE", 1024])
    assert c.OPTIM.BATCH_SIZE == 1024  # override wins over file
    assert c.OPTIM.LR == 0.01
    assert c.MODEL.VISUAL.NETWORK_NAME == "resnet18"


def test_reference_yaml_loads():
    """Every experiment YAML shipped with the reference must load unchanged."""
    import glob

    files = sorted(glob.glob("/root/reference/configs/done/*.yaml"))
    assert files, "reference configs missing"
    for f in files:
        c = Config(f)
        assert c.OPTIM.BATCH_SIZE > 0


def _repo_configs():
    import glob
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return sorted(glob.glob(os.path.join(here, "configs", "*.yaml")))


@pytest.mark.parametrize("path", _repo_configs(),
                         ids=lambda p: p.rsplit("/", 1)[-1])
def test_repo_yaml_loads(path):
    """Every YAML shipped with THIS repo (including the TPU-tuned
    flagship) must load and produce a coherent config."""
    c = Config(path)
    assert c.OPTIM.BATCH_SIZE > 0
    assert c.MODEL.VISUAL.FEATURE_SIZE > 0


def test_repo_configs_present():
    assert len(_repo_configs()) >= 18


def test_frozen():
    c = Config()
    with pytest.raises(AttributeError):
        c.OPTIM.BATCH_SIZE = 1
    with pytest.raises(AttributeError):
        c._C.RANDOM_SEED = 5


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config(override_list=["OPTIM.NOT_A_KEY", 1])


def test_run_id_derivation():
    c = Config()
    assert c.RUN_ID.startswith("/V?resnet50_T?train_sbert_Ty?dot")
    assert "_B?256_" in c.RUN_ID


def test_dump_roundtrip(tmp_path):
    c = Config(override_list=["OPTIM.BATCH_SIZE", 64])
    p = tmp_path / "dump.yaml"
    c.dump(str(p))
    c2 = Config(str(p))
    assert c2.OPTIM.BATCH_SIZE == 64


def test_confignode_pickle():
    import pickle

    n = ConfigNode({"a": 1, "b": {"c": [1, 2]}})
    n2 = pickle.loads(pickle.dumps(n))
    assert n2.b.c == [1, 2]


def test_type_coercion():
    c = Config(override_list=["OPTIM.WEIGHT_DECAY", 0])
    assert c.OPTIM.WEIGHT_DECAY == 0.0
    assert isinstance(c.OPTIM.WEIGHT_DECAY, float)
    with pytest.raises(TypeError):
        Config(override_list=["OPTIM.BATCH_SIZE", "notanint"])
