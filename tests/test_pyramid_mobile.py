"""Mobile PyramidBox variants: architecture parity vs the torch reference.

For every variant, the torch state dict must convert strictly into our flax
template (every parameter name AND shape matches).  For try1/try3 we also check
forward-value parity with random converted weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.models.pyramidbox_mobile import build_pyramidbox
from fdt.models.torch_convert import torch_to_flax
from tests.conftest import import_reference

_REF_MODULES = {
    "try1": "pyramid_mobile_try1",
    "try2": "pyramid_mobile_try2",
    "try3": "pyramid_mb2_try3",
    "try4": "pyramid_mb2_try4",
    "try5": "pyramid_mb2_try5",
}


def torch_net(variant):
    torch = pytest.importorskip("torch")
    mod = import_reference(_REF_MODULES[variant])
    torch.manual_seed(0)
    net = mod.build_sfd_mobile("train", 640, 2)
    net.eval()
    return net


def flax_template(model, size=160):
    tmpl = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)


def convert(net, model, size=160):
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    # the reference allocates 6 face heads but uses 5 for the 5-map variants;
    # strict=False mirrors its filtered partial load (load_weights)
    return torch_to_flax(sd, flax_template(model, size), strict=False)


@pytest.mark.parametrize("variant", ["try1", "try2", "try3", "try4", "try5"])
def test_variant_template_converts(variant):
    net = torch_net(variant)
    model = build_pyramidbox(variant)
    variables = convert(net, model)
    # every leaf was filled: strict conversion finds no missing keys
    missing = []
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    try:
        torch_to_flax(sd, flax_template(model), strict=True)
    except KeyError as e:
        missing.append(str(e))
    assert not missing, missing
    assert variables is not None


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["try1", "try3"])
def test_variant_forward_matches_torch(variant, rng):
    import torch
    net = torch_net(variant)
    model = build_pyramidbox(variant)
    variables = convert(net, model)
    img = (rng.rand(1, 160, 160, 3) * 255).astype(np.float32)
    with torch.no_grad():
        loc_t, conf_t, priors_t, hloc_t, hconf_t, phead_t = net(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out["face_loc"]), loc_t.numpy(),
                               rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["face_conf"]), conf_t.numpy(),
                               rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["head_conf"]), hconf_t.numpy(),
                               rtol=1e-2, atol=2e-2)

    # prior parity for the variant's stride/box config
    from fdt.anchors import pyramid_face_priors
    from fdt.config import PYRAMID_CONFIGS
    face_p = pyramid_face_priors(PYRAMID_CONFIGS[variant], out["source_shapes"],
                                 640, 640)
    np.testing.assert_allclose(face_p, priors_t.numpy(), rtol=1e-5, atol=1e-6)
