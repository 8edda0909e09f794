"""Observability tests: JSONL metrics, step timer, NaN guard, and the
train-loop integration."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import observability as obs


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    with obs.MetricsLogger(path) as m:
        m.log("start", config="x")
        m.log("epoch", step=0, loss=jnp.asarray(1.5), acc=0.25)
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    assert recs[0]["event"] == "start" and recs[0]["config"] == "x"
    assert recs[1]["step"] == 0 and abs(recs[1]["loss"] - 1.5) < 1e-6
    assert all("ts" in r for r in recs)


def test_metrics_logger_disabled():
    m = obs.MetricsLogger(None)
    m.log("anything", x=1)  # no-op, no crash
    m.close()


def test_step_timer():
    t = obs.StepTimer()
    assert t.tick() is None  # first tick has no interval
    assert t.tick() is not None
    assert t.seconds_per_step > 0
    assert t.images_per_second(32) > 0


def test_assert_finite():
    obs.assert_finite({"a": jnp.ones((3,)), "b": {"c": jnp.zeros(2)}})
    with pytest.raises(FloatingPointError, match="b/c"):
        obs.assert_finite({"a": jnp.ones(2),
                           "b": {"c": jnp.asarray([1.0, np.nan])}})


def test_profile_trace_noop(tmp_path):
    with obs.profile_trace(None):
        pass
    with obs.profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones((4,)) + 1


def test_train_loop_writes_metrics(tmp_path):
    import jax

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import registry
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.train import loop
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    root = str(tmp_path)
    synthetic.make_synthetic_dataset(root + "/d", n_per_class=3, image_size=32)
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    entry = registry.get_model("vit_test")
    params = entry.init(jax.random.key(0), entry.config(len(vocab)))
    mk = lambda s: Loader(MetadataIndex(f"{root}/d/{s}/metadata.csv", vocab),
                          batch_size=8, image_size=32, resize=32)
    loop.train_base_model(entry, params, mk("train"), mk("val"), None, vocab,
                          out_dir=root + "/out", epochs=1, log=lambda s: None)
    metrics_path = os.path.join(root, "out", "metrics.jsonl")
    assert os.path.exists(metrics_path)
    with open(metrics_path) as f:
        events = [json.loads(line)["event"] for line in f]
    assert "train_start" in events and "epoch" in events
