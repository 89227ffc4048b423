import json
import os

import pytest

from volta_tpu.config import VoltaConfig
from volta_tpu import zoo

REF_CONFIG_DIR = "/root/reference/config"

# Keys whose semantics the encoder consumes; compared against the reference
# JSONs when the reference checkout is available.
SEMANTIC_KEYS = [
    "hidden_size", "num_attention_heads", "intermediate_size", "pooler_size",
    "type_vocab_size", "vocab_size", "num_locs", "add_global_imgfeat",
    "image_embeddings", "v_feature_size", "v_hidden_size",
    "v_num_attention_heads", "v_intermediate_size", "fusion_method",
    "clf_hidden_size", "tt_attn_sublayers", "tv_attn_sublayers",
    "vt_attn_sublayers", "vv_attn_sublayers", "t_ff_sublayers",
    "v_ff_sublayers", "shared_sublayers", "single_ln_sublayers",
    "bert_layer2attn_sublayer", "bert_layer2ff_sublayer",
    "visual_target_weights",
]


def test_zoo_builds_and_plans():
    for name in zoo.ZOO_NAMES:
        cfg = zoo.build(name)
        plan = cfg.sublayer_plan()
        assert len(plan) == cfg.depth
        # every sublayer must do something
        for spec in plan:
            assert spec.has_text or spec.has_vision, (name, spec.index)


@pytest.mark.parametrize("name", zoo.ZOO_NAMES)
def test_zoo_matches_reference_config(name):
    ref_path = os.path.join(REF_CONFIG_DIR, f"{name}.json")
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    with open(ref_path) as f:
        ref = json.load(f)
    cfg = zoo.build(name).to_dict()
    for key in SEMANTIC_KEYS:
        if key not in ref:
            continue
        got, want = cfg[key], ref[key]
        if isinstance(want, dict):
            got = {str(k): v for k, v in got.items()}
            want = {str(k): v for k, v in want.items()}
        assert got == want, f"{name}.{key}: {got} != {want}"
    # overrides maps
    for key in ("sublayer2attn_hidden_size", "sublayer2num_attention_heads"):
        assert {str(k): v for k, v in cfg[key].items()} == \
            {str(k): v for k, v in ref.get(key, {}).items()}, (name, key)


def test_roundtrip_json(tmp_path):
    cfg = zoo.build("ctrl_uniter_base")
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json_string())
    cfg2 = VoltaConfig.from_json_file(str(p))
    assert cfg2.tt_attn_sublayers == cfg.tt_attn_sublayers
    assert cfg2.bert_layer2attn_sublayer == cfg.bert_layer2attn_sublayer


def test_plan_invariants():
    cfg = zoo.build("ctrl_uniter_base")
    cfg.tt_attn_sublayers = cfg.tt_attn_sublayers + [99]
    with pytest.raises(ValueError):
        cfg.sublayer_plan()


def test_emitted_configs_load(tmp_path):
    zoo.emit(str(tmp_path))
    for name in zoo.ZOO_NAMES:
        cfg = VoltaConfig.from_json_file(str(tmp_path / f"{name}.json"))
        cfg.sublayer_plan()


def test_task_configs_match_generator():
    """config_tasks/*.yml regenerate byte-identically from the programmatic
    tables (the reference task-config surface; parse-equality vs the
    reference files verified at generation time)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_task_configs", os.path.join(root, "tools",
                                         "gen_task_configs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for fname, text in mod.build().items():
        path = os.path.join(root, "config_tasks", fname)
        assert open(path).read() == text, f"stale {fname}"


def test_task_yaml_fusion_overrides_present():
    """The vl-bert task files must carry the per-task pooling overrides the
    CLIs apply (reference: config_tasks/vl-bert_trainval_tasks.yml:21-22)."""
    import os

    import yaml

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tv = yaml.safe_load(open(os.path.join(
        root, "config_tasks", "vl-bert_trainval_tasks.yml")))
    assert tv["TASK1"]["fusion_method"] == "vl-bert_vqa"
    assert tv["TASK1"]["embed_clf"] is True
    assert tv["TASK10"]["num_clf_layers"] == 2
    te = yaml.safe_load(open(os.path.join(
        root, "config_tasks", "vl-bert_test_tasks.yml")))
    assert te["TASK1"]["fusion_method"] == "vl-bert_vqa"
    assert te["TASK10"]["max_region_num"] == 101
