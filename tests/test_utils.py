"""Checkpoint + logging utility tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
from probing_rag_tpu.utils.checkpoint import load_pytree, save_pytree
from probing_rag_tpu.utils.logging import JsonlWriter


def test_pytree_roundtrip_with_template(tmp_path):
    tc = ProberTrainConfig(layers=(1, 2), positions=("resid_post",))
    stack = init_prober_stack(tc, 32, jax.random.PRNGKey(0))
    save_pytree(tmp_path / "ck", stack, meta={"sites": [list(s) for s in tc.sites]})
    loaded, meta = load_pytree(tmp_path / "ck", like=stack)
    assert meta["sites"] == [[1, "resid_post"], [2, "resid_post"]]
    for a, b in zip(jax.tree.leaves(stack), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_roundtrip_without_template(tmp_path):
    tree = {"a": {"b": jnp.ones((3,)), "c": jnp.zeros((2, 2))}}
    save_pytree(tmp_path / "ck", tree)
    loaded, _ = load_pytree(tmp_path / "ck")
    np.testing.assert_array_equal(loaded["a"]["b"], np.ones(3))


def test_pytree_template_mismatch_raises(tmp_path):
    tree = {"a": jnp.ones((3,))}
    save_pytree(tmp_path / "ck", tree)
    with pytest.raises(ValueError):
        load_pytree(tmp_path / "ck", like={"different": jnp.ones((3,))})


def test_jsonl_writer(tmp_path):
    w = JsonlWriter(tmp_path / "log.jsonl")
    w.write({"step": 1, "loss": np.float32(0.5), "arr": np.asarray([1, 2])})
    rec = json.loads((tmp_path / "log.jsonl").read_text())
    assert rec["step"] == 1 and rec["loss"] == 0.5 and rec["arr"] == [1, 2]
    assert "ts" in rec
    # disabled writer is a no-op
    JsonlWriter(None).write({"x": 1})
