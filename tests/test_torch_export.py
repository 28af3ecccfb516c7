"""Torch-export interop (flax_to_torch / save_variables_pth): fdt weights
must load back into the REFERENCE repo's torch models.

Two guarantees:
  * round-trip bit-exactness — torch .pt → torch_to_flax → flax_to_torch
    reproduces every array bit-for-bit (f32), including the import-side
    linear-flatten fixups inverted on export;
  * completeness — a strict torch load_state_dict of an exported dict into
    the reference module succeeds (no missing/unexpected keys, incl.
    BatchNorm num_batches_tracked).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdt.models.torch_convert import (flax_to_torch, load_torch_state_dict,
                                      torch_to_flax)
from tests.conftest import import_reference

FACEBOX_PT = "/root/reference/FACEBOX/faceboxes.pt"
MTCNN_BASE = "/root/reference/MTCNN/original_model"


def _roundtrip_keys(sd0, sd1):
    missing = set(sd0) - set(sd1)
    assert not missing, f"export dropped keys: {sorted(missing)[:5]}"
    for k, v in sd0.items():
        np.testing.assert_array_equal(
            sd1[k], np.asarray(v, np.float32), err_msg=k)


def test_facebox_roundtrip_bit_exact():
    if not os.path.exists(FACEBOX_PT):
        pytest.skip("faceboxes.pt not available")
    from fdt.models.facebox import FaceBox
    from fdt.models.loader import init_template

    sd0 = load_torch_state_dict(FACEBOX_PT)
    variables = torch_to_flax(sd0, init_template(FaceBox(), 128), strict=True)
    sd1 = flax_to_torch(variables)
    _roundtrip_keys(sd0, sd1)


@pytest.mark.parametrize("net,size", [("pnet", 12), ("rnet", 24),
                                      ("onet", 48)])
def test_mtcnn_roundtrip_and_strict_load(net, size):
    path = f"{MTCNN_BASE}/{net}_epoch.pt"
    if not os.path.exists(path):
        pytest.skip(f"{net}_epoch.pt not available")
    torch = pytest.importorskip("torch")
    from fdt.models.loader import init_template
    from fdt.models.mtcnn import (ONet, PNet, RNet, mtcnn_export_extras,
                                  mtcnn_linear_transforms)

    model = {"pnet": PNet, "rnet": RNet, "onet": ONet}[net]()
    sd0 = load_torch_state_dict(path)
    extras = mtcnn_export_extras(net)
    variables = torch_to_flax(sd0, init_template(model, size), strict=True,
                              transforms=mtcnn_linear_transforms(net))
    sd1 = flax_to_torch(
        variables,
        inverse_transforms=mtcnn_linear_transforms(net, inverse=True),
        extra=extras)
    # live keys bit-exact; the only non-round-tripped keys are the reference's
    # DEAD landmark heads, zero-filled by mtcnn_export_extras
    _roundtrip_keys({k: v for k, v in sd0.items() if k not in extras}, sd1)

    # strict load into the reference module (create_mtcnn_net's load contract,
    # MTCNN/mtcnn/core/detect.py:14-63 uses default strict=True)
    models_mod = import_reference("MTCNN.mtcnn.core.models")
    ref_net = {"pnet": models_mod.PNet, "rnet": models_mod.RNet,
               "onet": models_mod.ONet}[net](use_cuda=False)
    ref_net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in sd1.items()}, strict=True)


@pytest.mark.slow
def test_pyramidbox_export_strict_loads_into_reference():
    """An exported PyramidBox state dict must satisfy a STRICT torch
    load_state_dict on the reference build_sfd module — key-for-key
    completeness incl. num_batches_tracked — and convert back bit-exactly."""
    torch = pytest.importorskip("torch")
    mod = import_reference("pyramid")

    from fdt.models.loader import init_template
    from fdt.models.pyramidbox import PyramidBox

    model = PyramidBox()
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3))))
    sd = flax_to_torch(variables)

    net = mod.build_sfd("train", 640, 2)
    net.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                        strict=True)

    # and back: the torch module's state dict reproduces our variables
    sd_back = {k: v.detach().numpy() for k, v in net.state_dict().items()
               if not k.endswith("num_batches_tracked")}
    variables_back = torch_to_flax(sd_back, init_template(model, 64),
                                   strict=True)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(variables_back)):
        assert jax.tree_util.keystr(p0) == jax.tree_util.keystr(p1)
        np.testing.assert_array_equal(np.asarray(a), b,
                                      err_msg=jax.tree_util.keystr(p0))


def test_save_variables_pth_loader_roundtrip(tmp_path):
    """save_variables_pth artifacts reload through the loader front door."""
    if not os.path.exists(FACEBOX_PT):
        pytest.skip("faceboxes.pt not available")
    from fdt.models.facebox import FaceBox
    from fdt.models.loader import (init_template, load_variables,
                                   save_variables_pth)

    model = FaceBox()
    variables = torch_to_flax(load_torch_state_dict(FACEBOX_PT),
                              init_template(model, 128), strict=True)
    out = str(tmp_path / "export.pth")
    save_variables_pth(variables, out)
    reloaded = load_variables(model, out, 128, strict=True)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(reloaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
