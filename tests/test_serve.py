"""AOT export/serving roundtrip (scae_tpu/serve.py).

The serving artifact must (a) reproduce the live model exactly, (b) be
self-contained — deserializable and callable through jax.export alone,
with params baked in — and (c) refuse nothing a trained checkpoint
workflow needs (tools/export_model.py drives the checkpoint side; here
the model comes from a fresh init, which exercises the identical path).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sample_hparams import small_model_params

from scae_tpu import serve
from scae_tpu.factory import make_scae

BATCH = 4


def _tiny_model():
    mk = small_model_params(
        pcae_decoder_params=dict(fused_impl="xla"))
    model = make_scae(mk)
    img = jnp.zeros((BATCH, *mk["image_shape"]), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, image=img,
                        deterministic=True)["params"]
    return model, params, mk


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    model, params, mk = _tiny_model()
    out = tmp_path_factory.mktemp("artifact")
    serve.export_serving(model, params, image_shape=mk["image_shape"],
                         batch_size=BATCH,
                         out_dir=str(out), with_reconstruction=True,
                         platforms=("cpu",), model_config=mk)
    return str(out), model, params


def test_roundtrip_matches_live_model(exported_dir):
    out, model, params = exported_dir
    served = serve.load_serving(out)
    rng = np.random.RandomState(1)
    batch = jnp.asarray(rng.rand(BATCH, 1, 28, 28), jnp.float32)

    got = served(batch)
    # jit-to-jit comparison: eager execution can drift visibly on
    # trained weights (tools/export_model.py note)
    want = jax.jit(serve.make_infer_fn(model, with_reconstruction=True))(
        params, batch)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                    rtol=1e-4, atol=1e-5, err_msg=k)
    assert got["prediction"].shape == (BATCH,)
    assert got["reconstruction"].shape == (BATCH, 1, 28, 28)


def test_artifact_is_self_contained(exported_dir):
    """Deserialize + call with NO scae_tpu model object in sight."""
    out, _, _ = exported_dir
    from jax import export as jax_export

    with open(os.path.join(out, serve.ARTIFACT_NAME), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    batch = jnp.zeros((BATCH, 1, 28, 28), jnp.float32)
    res = jax.jit(exported.call)(batch)
    assert "posterior_cls_prob" in res
    probs = np.asarray(res["posterior_cls_prob"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_manifest_records_contract(exported_dir):
    out, _, _ = exported_dir
    served = serve.load_serving(out)
    m = served.manifest
    assert m["input"]["shape"] == [BATCH, 1, 28, 28]
    assert m["input"]["layout"] == "NCHW"
    assert "prediction" in m["outputs"]
    assert m["model_config"]["n_part_caps"] == 16
    assert served.input_shape == (BATCH, 1, 28, 28)


def test_batch_size_mismatch_rejected(exported_dir):
    out, _, _ = exported_dir
    served = serve.load_serving(out)
    bad = jnp.zeros((BATCH + 1, 1, 28, 28), jnp.float32)
    with pytest.raises(Exception):
        served(bad)


def test_infer_fn_without_classes():
    """n_classes=None models export the unsupervised surface only."""
    mk = small_model_params(n_classes=None,
                            pcae_decoder_params=dict(fused_impl="xla"))
    model = make_scae(mk)
    img = jnp.zeros((2, *mk["image_shape"]), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, image=img,
                        deterministic=True)["params"]
    out = serve.make_infer_fn(model)(params, img)
    assert "prediction" not in out
    assert out["caps_presence"].shape[0] == 2


def test_polymorphic_batch_serves_any_size():
    """symbolic-batch export: ONE artifact serves batch 1, 3, and 8,
    each agreeing with the live model, and prefix-consistency holds
    (batch-parallelism: running rows [0:b] equals slicing a larger run)."""
    model, params, mk = _tiny_model()
    import tempfile
    with tempfile.TemporaryDirectory() as out:
        serve.export_serving(model, params, image_shape=mk["image_shape"],
                             batch_size=BATCH, out_dir=out,
                             platforms=("cpu",), model_config=mk,
                             polymorphic_batch=True)
        served = serve.load_serving(out)
        assert served.manifest["polymorphic_batch"] is True
        assert served.input_shape == (None, 1, 28, 28)

        rng = np.random.RandomState(5)
        full = jnp.asarray(rng.rand(8, 1, 28, 28), jnp.float32)
        want = jax.jit(serve.make_infer_fn(model))(params, full)
        got8 = served(full)
        np.testing.assert_allclose(
            np.asarray(got8["posterior_cls_prob"]),
            np.asarray(want["posterior_cls_prob"]), rtol=1e-4, atol=1e-5)
        for b in (1, 3):
            got = served(full[:b])
            assert got["prediction"].shape == (b,)
            np.testing.assert_allclose(
                np.asarray(got["posterior_cls_prob"]),
                np.asarray(want["posterior_cls_prob"])[:b],
                rtol=1e-4, atol=1e-5)


def test_polymorphic_batch_rejects_mesh():
    model, params, mk = _tiny_model()
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()), ("data",))
    import tempfile
    with tempfile.TemporaryDirectory() as out:
        with pytest.raises(ValueError, match="mutually exclusive"):
            serve.export_serving(model, params,
                                 image_shape=mk["image_shape"],
                                 batch_size=16, out_dir=out,
                                 platforms=("cpu",), mesh=mesh,
                                 model_config=mk, polymorphic_batch=True)


def test_data_sharded_export_over_mesh():
    """Mesh export: artifact records the batch sharding + device count
    and serves batch-parallel (8-device virtual mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    model, params, mk = _tiny_model()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    import tempfile
    with tempfile.TemporaryDirectory() as out:
        serve.export_serving(model, params, image_shape=mk["image_shape"],
                             batch_size=16, out_dir=out,
                             platforms=("cpu",), mesh=mesh,
                             model_config=mk)
        served = serve.load_serving(out)
        assert served.manifest["nr_devices"] == 8
        assert served.manifest["batch_axis"] == "data"

        sh = NamedSharding(mesh, PartitionSpec("data"))
        rng = np.random.RandomState(3)
        batch = jax.device_put(
            jnp.asarray(rng.rand(16, 1, 28, 28), jnp.float32), sh)
        got = served(batch)
        want = jax.jit(serve.make_infer_fn(model))(params, batch)
        np.testing.assert_allclose(
            np.asarray(got["posterior_cls_prob"]),
            np.asarray(want["posterior_cls_prob"]), rtol=1e-4, atol=1e-5)


def test_verify_serving_readout_tool(exported_dir, capsys):
    """tools/verify_serving_readout.py: the deployment artifact's
    `prediction` output is evaluated on the run's own test split and
    gated against an expected accuracy (the serving<->quality loop)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import verify_serving_readout

    out = exported_dir[0]
    overrides = ["model.image_shape=[1,28,28]",
                 "data_loader.synthetic_test=64",
                 "data_loader.synthetic_train=128",
                 "data_loader.val_size=32"]
    res = verify_serving_readout.main([out, "--"] + overrides)
    assert res["n_test"] == 64
    assert 0.0 <= res["test_accuracy"] <= 1.0

    # gate: an absurd expectation must fail loudly
    with pytest.raises(SystemExit):
        verify_serving_readout.main(
            [out, "--expect", "0.999", "--tol", "0.001", "--"]
            + overrides)
