"""Inception-ResNet-v2 parity vs the reference torch module.

The reference ships this classifier as dead code
(MTCNN/mtcnn/core/resnet_inception_v2.py — no driver imports it); we provide
it for component parity and pin numerics against the torch module here.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.models.inception_resnet_v2 import InceptionResnetV2
from fdt.models.torch_convert import torch_to_flax
from tests.conftest import import_reference


def _randomize_bn_stats(torch, net, seed=0):
    """Random running stats/affine params so BN actually transforms values."""
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            v.copy_(torch.randn(v.shape, generator=g) * 0.3)
        elif k.endswith("running_var"):
            v.copy_(torch.rand(v.shape, generator=g) * 2.0 + 0.2)
        elif k.endswith(".bn.weight"):
            v.copy_(torch.rand(v.shape, generator=g) + 0.5)
        elif k.endswith(".bn.bias"):
            v.copy_(torch.randn(v.shape, generator=g) * 0.1)


def test_full_model_shape_and_param_names():
    """Full 10/20/9 towers: abstract init only (no compile) — the flax param
    tree must map 1:1 onto the torch state dict's tensor names."""
    torch = pytest.importorskip("torch")
    ref = import_reference("MTCNN.mtcnn.core.resnet_inception_v2")
    model = InceptionResnetV2()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 299, 299, 3), jnp.float32)))
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((2, 299, 299, 3), jnp.float32)),
        shapes)
    assert out.shape == (2, 1001)

    with torch.no_grad():
        net = ref.InceptionResnetV2()
    torch_names = {k for k in net.state_dict()
                   if not k.endswith("num_batches_tracked")}

    from fdt.models.torch_convert import _torch_key
    flax_names = set()
    jax.tree_util.tree_map_with_path(
        lambda p, _: flax_names.add(_torch_key(p)), shapes)
    assert flax_names == torch_names


def test_reduced_towers_numeric_parity():
    """Exact numerics vs torch on reduced (2,3,2) towers — covers every block
    type (stem, Mixed_5b/6a/7a, Block35/17/8, final block8/conv/pool/classif)
    at the minimum legal input size (299² — the 8×8 final pool constraint)."""
    torch = pytest.importorskip("torch")
    ref = import_reference("MTCNN.mtcnn.core.resnet_inception_v2")
    torch.manual_seed(0)
    net = ref.InceptionResnetV2()
    # truncate the residual towers (keys stay repeat.{i} / repeat_1.{i} / ...)
    net.repeat = torch.nn.Sequential(*list(net.repeat)[:2])
    net.repeat_1 = torch.nn.Sequential(*list(net.repeat_1)[:3])
    net.repeat_2 = torch.nn.Sequential(*list(net.repeat_2)[:2])
    _randomize_bn_stats(torch, net)
    net.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    model = InceptionResnetV2(repeats=(2, 3, 2))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = torch_to_flax(sd, template, strict=True)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply(variables, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
