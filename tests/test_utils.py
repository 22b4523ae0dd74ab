"""Checkpoint + logging utility tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probing_rag_tpu.prober.train import ProberTrainConfig, init_prober_stack
from probing_rag_tpu.utils.checkpoint import load_pytree, save_pytree
from probing_rag_tpu.utils.logging import JsonlWriter


@pytest.mark.slow
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


def test_pytree_roundtrip_exotic_dtypes(tmp_path):
    """bfloat16 and int4 leaves (ml_dtypes — numpy kind 'V') must round-trip
    byte-exact: npz alone stores them as raw void fields that load as
    garbage, so save_pytree views them unsigned and tags the real dtype in
    the manifest. This is the serve-a-quantized-checkpoint path (bf16 LM
    weights; grouped-int4 {"q","gs"} leaves from quantize_lm_params)."""
    import ml_dtypes

    tree = {
        "bf": jnp.arange(6, dtype=jnp.float32).reshape(2, 3).astype(jnp.bfloat16),
        "q4": jnp.asarray([[-7, 0, 3], [7, -1, 2]], jnp.int4),
        "f": jnp.ones((2,)),
    }
    save_pytree(tmp_path / "ck", tree)
    manifest = json.loads((tmp_path / "ck.json").read_text())
    assert manifest["exotic_dtypes"] == {"bf": "bfloat16", "q4": "int4"}
    loaded, _ = load_pytree(tmp_path / "ck")
    assert loaded["bf"].dtype == ml_dtypes.bfloat16
    assert loaded["q4"].dtype == ml_dtypes.int4
    np.testing.assert_array_equal(
        loaded["bf"].astype(np.float32), np.asarray(tree["bf"]).astype(np.float32)
    )
    np.testing.assert_array_equal(
        loaded["q4"].astype(np.int8), np.asarray(tree["q4"]).astype(np.int8)
    )
    # template path re-views too
    loaded_t, _ = load_pytree(tmp_path / "ck", like=tree)
    assert np.asarray(loaded_t["q4"]).dtype == ml_dtypes.int4


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
