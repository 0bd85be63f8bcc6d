import json

from p2igan_tpu.config import (
    build_dataset_args,
    drop_sample_length,
    extract_shared_params,
    flatten_dict,
    load_config,
    merge_overrides,
)


def test_flatten_dict():
    flat = flatten_dict({"a": {"b": 1, "c": [1, 2]}, "d": None, "e": "x"})
    assert flat == {"a.b": 1, "a.c": "[1, 2]", "e": "x"}


def test_dataset_args_inheritance():
    train = {"data_root": "/t", "w": 128, "h": 128, "sample_length": 16,
             "mask": {"type": "stis", "file": "m.txt", "keep": 4}}
    args = build_dataset_args(train)
    shared = extract_shared_params(args)
    # valid inherits everything, overrides mask type only
    valid = build_dataset_args({"data_root": "/v", "mask": {"type": "sti"}}, defaults=shared)
    assert valid["w"] == 128 and valid["sample_length"] == 16
    assert valid["mask"]["type"] == "sti" and valid["mask"]["file"] == "m.txt"
    # explicit null deletes sample_length
    test = build_dataset_args({"data_root": "/x", "sample_length": None},
                              defaults=drop_sample_length(shared))
    assert "sample_length" not in test


def test_merge_overrides_and_load(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"train": {"batch_size": 12}}))
    cfg = load_config(p)
    merge_overrides(cfg, {"train.batch_size": 2, "model.name": "simple"})
    assert cfg["train"]["batch_size"] == 2
    assert cfg["model"]["name"] == "simple"


def test_split_mask_null_deletes_inherited_mask():
    """An explicit 'mask': null in a split config deletes the inherited
    train mask (same null-deletes semantics as w/h/sample_length)."""
    args = build_dataset_args(
        {"data_root": "x", "mask": None},
        {"w": 32, "h": 32, "mask": {"type": "stis", "file": "f.txt"}})
    assert "mask" not in args


def test_merge_overrides_through_non_dict_node():
    """A dotted override whose path crosses a non-dict node (e.g. JSON
    'train': null) replaces the node instead of raising TypeError."""
    cfg = {"train": None}
    merge_overrides(cfg, {"train.batch_size": 2})
    assert cfg["train"] == {"batch_size": 2}
