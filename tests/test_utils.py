import json
import time

import numpy as np
import pytest

from p2igan_tpu.training.checkpoint import (load_checkpoint, resolve_checkpoint,
                                            save_checkpoint)
from p2igan_tpu.utils.tracking import FileTracker


def test_file_tracker_roundtrip(tmp_path):
    tr = FileTracker(tmp_path / "runs")
    tr.set_experiment("exp1")
    with tr.start_run(run_name="r1"):
        tr.log_params({"a": 1, "nested.b": [1, 2]})
        tr.log_metric("loss", 0.5, step=1)
        tr.log_metric("loss", 0.25, step=2)
        art = tmp_path / "artifact.txt"
        art.write_text("hello")
        tr.log_artifact(str(art))
    run_dir = tmp_path / "runs" / "exp1" / "r1"
    params = json.loads((run_dir / "params.json").read_text())
    assert params["a"] == 1
    lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert [l["value"] for l in lines] == [0.5, 0.25]
    assert (run_dir / "artifacts" / "artifact.txt").read_text() == "hello"


def test_tracker_nonfinite_metrics_stay_single_typed(tmp_path):
    """NaN/inf metrics must keep ``value`` single-typed (null, token in
    ``raw``) so numeric consumers never hit a string value mid-file, and the
    file stays strict JSON (ADVICE r2)."""
    tr = FileTracker(tmp_path / "runs")
    tr.set_experiment("exp1")
    with tr.start_run(run_name="r1"):
        tr.log_metric("loss", 1.0, step=0)
        tr.log_metric("loss", float("nan"), step=1)
        tr.log_metric("loss", float("inf"), step=2)
    run_dir = tmp_path / "runs" / "exp1" / "r1"
    lines = [json.loads(l) for l in
             (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert [l["value"] for l in lines] == [1.0, None, None]
    assert [l.get("raw") for l in lines] == [None, "nan", "inf"]


def test_tracker_uri_and_default_run(tmp_path):
    tr = FileTracker(tmp_path)
    tr.set_tracking_uri(f"file:{tmp_path}/other")
    with tr.start_run():
        tr.log_metric("x", 1.0)
    assert any((tmp_path / "other" / "default").iterdir())


def test_checkpoint_roundtrip_and_resolution(tmp_path):
    payload = {"epoch": 3, "global_step": 77,
               "generator": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = tmp_path / "latest.ckpt"
    save_checkpoint(p, payload)
    template = {"epoch": 0, "global_step": 0,
                "generator": {"w": np.zeros((2, 3), np.float32)}}
    restored = load_checkpoint(p, template)
    assert restored["epoch"] == 3
    np.testing.assert_array_equal(restored["generator"]["w"],
                                  payload["generator"]["w"])

    assert resolve_checkpoint(tmp_path) == p
    # fallback: newest *.ckpt when latest.ckpt is absent
    p.unlink()
    a = tmp_path / "a.ckpt"
    b = tmp_path / "b.ckpt"
    save_checkpoint(a, payload)
    time.sleep(0.01)
    save_checkpoint(b, payload)
    assert resolve_checkpoint(tmp_path) == b
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(tmp_path / "missing")
    # explicit path wins
    assert resolve_checkpoint(tmp_path, explicit=a) == a


def test_keystream_distinct():
    from p2igan_tpu.utils.rng import KeyStream

    ks = KeyStream(0)
    import jax

    k1, k2 = ks(), ks()
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))


def test_file_tracker_repeated_run_name_gets_fresh_dir(tmp_path):
    """Two runs under one run_name must not interleave metrics (mlflow
    creates a new run per start_run; the file tracker suffixes the dir)."""
    from p2igan_tpu.utils.tracking import FileTracker

    tr = FileTracker(tmp_path)
    with tr.start_run("fixed") as run1:
        first_dir = tr.run_dir
        tr.log_metric("loss", 1.0, step=0)
        assert run1.info.run_id  # ActiveRun-shaped handle
    with tr.start_run("fixed") as run2:
        second_dir = tr.run_dir
        tr.log_metric("loss", 2.0, step=0)
        assert run2.info.run_id != run1.info.run_id
    assert first_dir != second_dir
    lines1 = (first_dir / "metrics.jsonl").read_text().strip().splitlines()
    lines2 = (second_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines1) == 1 and len(lines2) == 1
