"""Torch-checkpoint importer: flax -> torch -> flax round trip and
DataParallel-prefixed .pth loading (reference loader semantics:
generate_predictions_aug.py:191-198, train_sed_net.py:97-113)."""
import jax
import jax.numpy as jnp
import numpy as np

from sednet_tpu.models import SEDNet
from sednet_tpu.utils.torch_import import (flax_params_to_torch_state_dict,
                                           load_torch_checkpoint,
                                           torch_state_dict_to_flax)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree)


def _init(rng):
    model = SEDNet(emb_size=16, num_primitives=6, mode=5, k=8)
    x = jnp.asarray(rng.randn(1, 64, 6).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_round_trip_identity(rng):
    model, params, x = _init(rng)
    sd = flax_params_to_torch_state_dict(params)
    # tolerant mode: the optional normal head is absent from this model,
    # mirroring the reference's tolerant loader (train_sed_net.py:97-113)
    back = torch_state_dict_to_flax(sd)
    flat_a = dict(_flatten(params))
    flat_b = dict(_flatten(back))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=str(k))


def test_pth_file_with_module_prefix(rng, tmp_path):
    import torch

    model, params, x = _init(rng)
    out_before = model.apply({"params": params}, x)
    sd = {"module." + k: torch.from_numpy(np.ascontiguousarray(v).copy())
          for k, v in flax_params_to_torch_state_dict(params).items()}
    # extra reference-only entries the importer must skip
    sd["module.encoder.bn4.weight"] = torch.zeros(256)
    sd["module.encoder.bn4.bias"] = torch.zeros(256)
    path = tmp_path / "ckpt.pth"
    torch.save(sd, str(path))

    imported = load_torch_checkpoint(str(path))
    out_after = model.apply({"params": imported}, x)
    np.testing.assert_allclose(np.asarray(out_after.embedding),
                               np.asarray(out_before.embedding), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_after.type_log_prob),
                               np.asarray(out_before.type_log_prob),
                               atol=1e-6)


def test_reference_key_names_covered(rng):
    """Every parameter the flax SEDNet owns maps to a reference state_dict
    key (no silent drops) — the torch key set matches the reference module
    attribute names (src/SEDNet.py:19-48,216-290)."""
    model, params, x = _init(rng)
    sd = flax_params_to_torch_state_dict(params)
    n_leaves = len(dict(_flatten(params)))
    assert len(sd) == n_leaves
    for key in ("encoder.conv1.0.weight", "encoder.bnmlp1.weight",
                "mlp_seg_prob2.weight", "edge_module.0.bias",
                "asis.0.weight", "prim_encoding.0.weight", "bn_prim_prob1.bias"):
        assert key in sd, key
